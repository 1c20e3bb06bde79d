"""Tiled Pallas rasterizer vs the XLA reference implementation.

Runs in interpret mode on the CPU test mesh; the same kernel compiles for
TPU (exercised by the driver bench / hardware runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# interpret-mode Pallas kernels are slow on CPU; the fast
# default subset covers them via tests/test_kernels_smoke.py
pytestmark = pytest.mark.slow

from im23d_tpu.geometry.objio import uv_sphere
from im23d_tpu.render.rasterizer import rasterize
from im23d_tpu.render.rasterizer_pallas import rasterize_tiled


def _random_scene(key, B=2, V=40, F=60, A=3):
    k1, k2, k3 = jax.random.split(key, 3)
    verts = jax.random.uniform(k1, (B, V, 3), minval=-0.9, maxval=0.9)
    # distinct indices per face: degenerate slivers flip the front-face
    # test on fp noise and are legitimately implementation-defined
    rng = np.random.RandomState(0)
    faces = jnp.asarray(
        np.stack([rng.choice(V, 3, replace=False) for _ in range(F)])
    )
    attrs = jax.random.uniform(k3, (B, F, 3, A))
    return verts, faces, attrs


@pytest.mark.parametrize("cull", [True, False])
def test_forward_parity(cull):
    verts, faces, attrs = _random_scene(jax.random.PRNGKey(0))
    f0, s0 = rasterize(verts, faces, attrs, 64, 64, sigma=1e-3,
                       cull_backfaces=cull)
    f1, s1 = rasterize_tiled(verts, faces, attrs, 64, 64, sigma=1e-3,
                             cull_backfaces=cull)
    assert float(jnp.quantile(jnp.abs(f0 - f1), 0.999)) < 1e-5
    assert float(jnp.abs(s0 - s1).max()) < 1e-5


def test_forward_parity_odd_resolution():
    # 70 is not a multiple of the 8x128 tile: exercises padding + crop
    verts, faces, attrs = _random_scene(jax.random.PRNGKey(1))
    f0, s0 = rasterize(verts, faces, attrs, 70, 70, sigma=1e-4)
    f1, s1 = rasterize_tiled(verts, faces, attrs, 70, 70, sigma=1e-4)
    assert float(jnp.quantile(jnp.abs(f0 - f1), 0.999)) < 1e-5
    assert float(jnp.abs(s0 - s1).max()) < 1e-4


def test_gradient_parity_sphere():
    key = jax.random.PRNGKey(3)
    tpl = uv_sphere(8, 4)
    faces = jnp.asarray(tpl.faces)
    V, F = tpl.vertices.shape[0], faces.shape[0]
    B = 2
    verts = (
        jnp.asarray(tpl.vertices)[None].repeat(B, 0) * 1.5
        + 0.05 * jax.random.normal(key, (B, V, 3))
    )
    attrs = jax.random.uniform(key, (B, F, 3, 3))
    wf = jax.random.normal(key, (B, 48, 48, 3))
    ws = jax.random.normal(key, (B, 48, 48, 1))

    def loss(impl, v, a):
        f, s = impl(v, faces, a, 48, 48, sigma=1e-3)
        return jnp.sum(f * wf) + jnp.sum(s * ws)

    g0v, g0a = jax.grad(lambda v, a: loss(rasterize, v, a), (0, 1))(verts, attrs)
    g1v, g1a = jax.grad(lambda v, a: loss(rasterize_tiled, v, a), (0, 1))(
        verts, attrs
    )
    scale = float(jnp.abs(g0v).max())
    assert float(jnp.abs(g0v - g1v).max()) < 1e-3 * max(scale, 1.0)
    assert float(jnp.abs(g0a - g1a).max()) < 1e-4 * max(
        float(jnp.abs(g0a).max()), 1.0
    )


def test_empty_scene():
    # all faces off-screen: feat and soft must be exactly zero
    verts = jnp.asarray([[[2.5, 2.5, 0.0], [3.0, 2.5, 0.0], [2.5, 3.0, 0.0]]])
    faces = jnp.asarray([[0, 1, 2]])
    attrs = jnp.ones((1, 1, 3, 2))
    feat, soft = rasterize_tiled(verts, faces, attrs, 32, 32)
    assert float(jnp.abs(feat).max()) == 0.0
    assert float(jnp.abs(soft).max()) == 0.0


def test_tile_layout_roundtrip():
    """Image <-> native-block tile layout conversions are exact inverses."""
    import numpy as np

    from im23d_tpu.render import rasterizer_pallas as rp

    rng = np.random.default_rng(0)
    for H, W in ((64, 96), (32, 32), (96, 160)):
        x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
        tiles = rp._image_to_tiles(jnp.asarray(x))
        assert tiles.shape == (2, 3, (H // rp._TH) * (W // rp._TW) * rp._SL,
                               rp._LN)
        back = rp._tiles_to_image(tiles, H, W)
        np.testing.assert_array_equal(np.asarray(back), x)
