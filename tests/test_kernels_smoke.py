"""Fast Pallas-kernel smokes for the default test subset.

The exhaustive parity/gradient matrices live in
``tests/test_{splat,sampling,rasterizer}_pallas.py`` (marked slow —
interpret mode on CPU is expensive); these minimal forward-parity cases
keep every kernel covered on each default run.
"""

import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops.sampling import grid_sample_bilinear
from im23d_tpu.ops.sampling_pallas import grid_sample_bilinear_pallas
from im23d_tpu.ops.splat_pallas import trilinear_splat_pallas
from im23d_tpu.ops.voxel import trilinear_splat
from im23d_tpu.render.rasterizer import rasterize
from im23d_tpu.render.rasterizer_pallas import rasterize_tiled


def test_splat_smoke():
    rng = np.random.RandomState(0)
    pts = jnp.asarray((rng.rand(1, 64, 3) - 0.5) * 0.8, jnp.float32)
    ref = trilinear_splat(pts, 8)
    out = trilinear_splat_pallas(pts, 8, dot_bf16=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sampler_smoke():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    img = jax.random.uniform(k1, (1, 16, 16, 3))
    grid = jax.random.uniform(k2, (1, 8, 8, 2), minval=-1.0, maxval=1.0)
    ref = grid_sample_bilinear(img, grid)
    out = grid_sample_bilinear_pallas(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rasterizer_smoke():
    key = jax.random.PRNGKey(0)
    k1, k3 = jax.random.split(key)
    verts = jax.random.uniform(k1, (1, 12, 3), minval=-0.9, maxval=0.9)
    rng = np.random.RandomState(0)
    faces = jnp.asarray(
        np.stack([rng.choice(12, 3, replace=False) for _ in range(16)])
    )
    attrs = jax.random.uniform(k3, (1, 16, 3, 3))
    f0, s0 = rasterize(verts, faces, attrs, 32, 32, sigma=1e-3)
    f1, s1 = rasterize_tiled(verts, faces, attrs, 32, 32, sigma=1e-3)
    assert float(jnp.quantile(jnp.abs(f0 - f1), 0.999)) < 1e-5
    assert float(jnp.abs(s0 - s1).max()) < 1e-4
