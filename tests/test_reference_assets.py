"""Ingestion of the REAL reference mesh-template assets.

The reference ships four usable UV-sphere OBJs in-tree
(``/root/reference/code/mesh_templates/uvsphere_{16,17,31,32}rings.obj``;
selected by ``suggest_mesh_template`` — ``cub_200_2011_dataset.py:73-74``,
``pascal3d_plus_dataset.py:47-48``).  These tests load each through
``load_obj``/``MeshTemplate`` (read-only access) and pin the topology
inference, symmetry partition, tangent frames, and vertex sampling that the
reference's Kaolin-based ``mesh_template.py:18-50`` computes on the same
files.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.geometry.objio import load_obj

REF_TEMPLATES = "/root/reference/code/mesh_templates"

# filename rings -> (num vertices, num faces, inferred rings): the 16/17 and
# 31/32 pairs share topology (482 = 15*32 + 2 and 962 = 30*32 + 2 vertices,
# 32 segments) — the odd-named variants are the half-step-rotated templates
# the reference picks for asymmetric (circular) runs
# (``suggest_mesh_template``, ``cub_200_2011_dataset.py:73-74``)
CASES = {
    16: (482, 960, 16),
    17: (482, 960, 16),
    31: (962, 1920, 31),
    32: (962, 1920, 31),
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEMPLATES), reason="reference checkout not mounted"
)


@pytest.mark.parametrize("rings", sorted(CASES))
def test_load_reference_template(rings):
    path = f"{REF_TEMPLATES}/uvsphere_{rings}rings.obj"
    mesh = load_obj(path)
    n_v, n_f, inf_rings = CASES[rings]
    assert mesh.vertices.shape == (n_v, 3)
    assert mesh.faces.shape == (n_f, 3)
    assert mesh.face_uvs.shape == (n_f, 3)
    # all UVs referenced by faces exist and lie in [0, 1]
    assert mesh.face_uvs.max() < len(mesh.uvs)
    assert mesh.uvs.min() >= -1e-6 and mesh.uvs.max() <= 1.0 + 1e-6
    # unit-ish sphere centered at the origin
    radii = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(radii, radii.mean(), rtol=2e-2)

    tpl = MeshTemplate(path)
    # ring/segment inference from the UV chart (not the filename)
    assert tpl.rings == inf_rings
    assert tpl.segments == 32
    assert tpl.num_vertices == n_v

    # symmetry partition covers every vertex exactly once and mirrors x
    assert len(tpl.pos_indices) == len(tpl.neg_indices)
    assert (len(tpl.pos_indices) + len(tpl.neg_indices)
            + len(tpl.zero_indices)) == n_v
    v = mesh.vertices
    np.testing.assert_allclose(
        v[tpl.pos_indices][:, 0], -v[tpl.neg_indices][:, 0], atol=1e-4
    )
    np.testing.assert_allclose(
        v[tpl.pos_indices][:, 1:], v[tpl.neg_indices][:, 1:], atol=1e-4
    )

    # tangent frames: finite everywhere, orthonormal off the poles,
    # zeroed tangent/bitangent at the two poles
    tgm = tpl.tangent_map
    assert np.isfinite(tgm).all()
    body = np.setdiff1d(np.arange(n_v), np.asarray(tpl.poles))
    norms = np.linalg.norm(tgm[body], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    dots = np.einsum("vij,vkj->vik", tgm[body], tgm[body])
    np.testing.assert_allclose(
        dots, np.broadcast_to(np.eye(3), dots.shape), atol=1e-4
    )
    assert (tgm[tpl.poles, 1:] == 0).all()

    # face adjacency: every interior triangle has 3 distinct neighbors
    ff = tpl.ff
    assert ff.shape[0] == n_f
    assert (ff >= 0).all() and (ff < n_f).all()


@pytest.mark.parametrize("rings", (16, 31))
def test_reference_template_vertex_positions(rings):
    """A zero displacement map must reproduce the template sphere exactly
    (zero-init mesh head => identity geometry, reference ``gan.py:361-368``)."""
    tpl = MeshTemplate(f"{REF_TEMPLATES}/uvsphere_{rings}rings.obj")
    disp = jnp.zeros((2, 32, 32, 3), jnp.float32)
    vtx = np.asarray(tpl.get_vertex_positions(disp))
    assert vtx.shape == (2, tpl.num_vertices, 3)
    np.testing.assert_allclose(vtx[0], tpl.mesh.vertices, atol=1e-5)
    # and a small constant normal displacement inflates the sphere
    disp = disp.at[..., 0].set(0.1)
    vtx2 = np.asarray(tpl.get_vertex_positions(disp))[0]
    r0 = np.linalg.norm(tpl.mesh.vertices, axis=1)
    r2 = np.linalg.norm(vtx2, axis=1)
    assert (r2 > r0 + 0.05).all()
