"""Inverse rendering + visibility for pseudo-ground-truth generation.

Parity targets in ``code/run_reconstruction.py``:

* ``InverseRenderer`` (:506-529): render the mesh flattened into UV space
  (vertex positions = mesh UVs in NDC, z = 0) with the predicted vertices'
  screen xy as per-vertex UV attributes and the target photo as the texture —
  projecting the photo onto the UV chart.
* Visibility mask (:567-571): the gradient of the rendered image w.r.t. the
  texture marks which texels are visible.  The reference needs
  ``torch.autograd.grad``; in JAX this is a one-line ``jax.grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from im23d_tpu.render.renderer import render_mesh


def inverse_render(
    template,
    predicted_vertices: jnp.ndarray,
    target_image: jnp.ndarray,
    resolution: int,
):
    """Project target photos onto the UV chart of the deformed mesh.

    Args:
      template: MeshTemplate.
      predicted_vertices: (B, V, 3) screen-space (NDC) vertices.
      target_image: (B, H, W, 3) the photo to project (acts as texture).
      resolution: output UV-space resolution.

    Returns:
      (inverse_tex (B, R, R, 3), inverse_alpha (B, R, R, 1)).
    """
    B = predicted_vertices.shape[0]
    # The "geometry" is the UV chart itself: uv in [0,1] -> NDC, z = 0
    uv_ndc = template.uvs_j * 2.0 - 1.0
    verts = jnp.concatenate([uv_ndc, jnp.zeros_like(uv_ndc[:, :1])], axis=-1)
    verts = jnp.broadcast_to(verts[None], (B, *verts.shape))
    # per-vertex UVs = predicted screen xy mapped to [0, 1]; these index the
    # photo (texture).  NOTE the role swap: faces come from face_uvs (the UV
    # chart topology) and the attribute table from mesh vertex indexing.
    uvs_attr = (predicted_vertices[..., :2] + 1.0) / 2.0  # (B, V, 2)
    image, alpha, _ = render_mesh(
        verts,
        template.face_uvs_j,   # triangles in UV space
        uvs_attr,
        template.faces_j,      # attribute (photo uv) indices per corner
        target_image,
        resolution,
        resolution,
        return_hardmask=True,
        # the flattened chart's winding is arbitrary — don't cull
        cull_backfaces=False,
    )
    return image, alpha


def visibility_mask(template, renderer_fn, vtx, texture):
    """Texel visibility via grad of the render w.r.t. the texture.

    ``renderer_fn(vtx, texture) -> image``; returns a mask shaped like
    ``texture`` that is positive where the texel influenced any pixel.
    """

    def total(tex):
        return jnp.sum(renderer_fn(vtx, tex))

    return jax.grad(total)(texture)
