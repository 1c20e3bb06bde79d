"""Golden-output harness for the pretrained-weight parity path.

BASELINE's north star is "mesh/texture outputs matching the PyTorch
reference on pretrained CUB/P3D weights".  Until real weights are supplied,
this pins the whole conversion path numerically: deterministic
reference-shaped state dicts (seeded, no fixture files needed) ->
``convert_{reconstruction,generator}`` -> model forward -> MeshTemplate
vertex sampling -> differentiable render, compared against committed golden
arrays (FULL output tensors, not probe grids — localized drift anywhere in
the outputs fails the test).  Any drift in the converter mappings, UV topo/tangent math
(``code/rendering/mesh_template.py:125-170``), grid-sample semantics
(``code/rendering/utils.py:6-12``), or rasterizer output changes these
numbers and fails here.

Regenerate (after an INTENTIONAL numerics change, on the CPU backend):
    python tests/test_golden_outputs.py --regen
"""

import os
import sys

import pytest
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "parity_golden.npz")
# CPU float32: identical op set run-to-run; tolerance covers XLA version /
# fusion-order drift, not semantic changes
ATOL = 2e-4


def _compute() -> dict:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(__file__))
    from test_torch_convert import make_generator_state_dict, make_recon_state_dict

    from im23d_tpu.core.torch_convert import (
        convert_generator,
        convert_reconstruction,
    )
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig, Generator
    from im23d_tpu.models.reconstruction import ReconstructionNetwork
    from im23d_tpu.render.renderer import render_mesh

    out = {}
    rng = np.random.RandomState(1234)

    # -- reconstruction network on a fixed input --------------------------
    recon_sd = make_recon_state_dict(np.random.RandomState(0))
    recon_vars = convert_reconstruction(recon_sd)
    model = ReconstructionNetwork(symmetric=True, texture_res=64)
    x = jnp.asarray(rng.rand(1, 256, 256, 4), jnp.float32)
    tex, mesh_map = jax.jit(
        lambda v, x_: model.apply(v, x_, train=False)
    )(recon_vars, x)
    # Full arrays, not probe grids: localized drift between subsampled
    # probes passed silently before; the whole outputs are small enough
    # (~600 KB compressed) to commit.
    out["recon_tex"] = np.asarray(tex, np.float32)
    out["recon_mesh_map"] = np.asarray(mesh_map, np.float32)

    # -- template vertex sampling (topo map + tangent frames + symmetry) --
    template = MeshTemplate(segments=32, rings=16)
    probe_map = jnp.asarray(rng.randn(1, 32, 32, 3) * 0.05, jnp.float32)
    vtx = template.get_vertex_positions(probe_map)
    out["sampled_vtx"] = np.asarray(vtx, np.float32)[0]

    # -- generator + full render ------------------------------------------
    gen_sd = make_generator_state_dict(np.random.RandomState(2))
    gen_vars = convert_generator(gen_sd)
    gcfg = GANConfig(texture_resolution=128, conditional_class=True,
                     n_classes=(5,))
    gen = Generator(gcfg, mesh_head=True)
    z = jnp.asarray(rng.randn(2, 64) * 0.5, jnp.float32)
    c = jnp.asarray([[1], [3]], jnp.int32)
    (gtex, gmesh), _ = jax.jit(
        lambda v, z_, c_: gen.apply(v, z_, c_, train=False,
                                    mutable=["batch_stats"])
    )(gen_vars, z, c)
    out["gen_tex"] = np.asarray(gtex, np.float32)
    out["gen_mesh"] = np.asarray(gmesh, np.float32)

    # pose under a fixed rotation and render at 64^2 (exercises
    # adjust_uv_and_texture seam handling + the rasterizer + UV sampling)
    gvtx = template.get_vertex_positions(gmesh + probe_map)
    rot = jnp.asarray([[0.8, 0.2, 0.55, 0.1]], jnp.float32)
    rot = jnp.tile(rot / jnp.linalg.norm(rot), (2, 1))
    from im23d_tpu.ops.quaternion import qrot

    pvtx = qrot(rot, 0.85 * gvtx) * jnp.asarray([1.0, -1.0, -1.0])
    uvs, tex_adj = template.adjust_uv_and_texture(gtex / 2.0 + 0.5)
    image, alpha, _ = jax.jit(
        lambda v, t: render_mesh(v, template.faces_j, uvs,
                                 template.face_uvs_j, t, 64, 64)
    )(pvtx, tex_adj)
    out["render_image"] = np.asarray(image, np.float32)
    out["render_alpha"] = np.asarray(alpha, np.float32)
    return out


@pytest.mark.slow
def test_golden_parity_outputs():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run: python tests/test_golden_outputs.py --regen"
    )
    golden = np.load(GOLDEN_PATH)
    computed = _compute()
    assert set(golden.files) == set(computed)
    for key in golden.files:
        np.testing.assert_allclose(
            computed[key], golden[key], atol=ATOL,
            err_msg=f"golden drift in {key!r} — converter/sampler/renderer "
            "numerics changed; if intentional, regenerate the goldens",
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **_compute())
        print(f"wrote {GOLDEN_PATH}")
    else:
        print(__doc__)
