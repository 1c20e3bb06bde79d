"""Pallas splat kernel vs the XLA reference implementation (interpret mode on CPU)."""

import pytest

# interpret-mode Pallas kernels are slow on CPU; the fast
# default subset covers them via tests/test_kernels_smoke.py
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops.splat_pallas import trilinear_splat_pallas
from im23d_tpu.ops.voxel import trilinear_splat


def _rand_points(rng, B, N, spread=0.8):
    return (rng.rand(B, N, 3).astype(np.float32) - 0.5) * spread


def test_forward_matches_xla_reference():
    rng = np.random.RandomState(0)
    pts = _rand_points(rng, 3, 200)
    S = 16
    ref = np.asarray(trilinear_splat(jnp.array(pts), S))
    ours = np.asarray(trilinear_splat_pallas(jnp.array(pts), S, dot_bf16=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_forward_with_weights_and_oob():
    rng = np.random.RandomState(1)
    pts = _rand_points(rng, 2, 100, spread=1.4)  # many out of bounds
    w = (rng.rand(2, 100) > 0.5).astype(np.float32)
    S = 8
    ref = np.asarray(trilinear_splat(jnp.array(pts), S, weights=jnp.array(w)))
    ours = np.asarray(
        trilinear_splat_pallas(jnp.array(pts), S, weights=jnp.array(w), dot_bf16=False)
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_forward_nonpadded_vs_padded_n():
    # N not a multiple of 128 exercises the padding path
    rng = np.random.RandomState(2)
    pts = _rand_points(rng, 2, 133)
    S = 8
    ref = np.asarray(trilinear_splat(jnp.array(pts), S))
    ours = np.asarray(trilinear_splat_pallas(jnp.array(pts), S, dot_bf16=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gradients_match_xla_reference():
    rng = np.random.RandomState(3)
    pts = _rand_points(rng, 2, 64)
    w = rng.rand(2, 64).astype(np.float32)
    S = 8
    tgt = jnp.asarray(rng.rand(2, S, S, S).astype(np.float32))

    def loss_ref(p, w):
        return jnp.sum((trilinear_splat(p, S, weights=w) - tgt) ** 2)

    def loss_ours(p, w):
        return jnp.sum(
            (trilinear_splat_pallas(p, S, weights=w, dot_bf16=False) - tgt) ** 2
        )

    gp_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.array(pts), jnp.array(w))
    gp_ours, gw_ours = jax.grad(loss_ours, argnums=(0, 1))(jnp.array(pts), jnp.array(w))
    np.testing.assert_allclose(np.asarray(gp_ours), np.asarray(gp_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_ours), np.asarray(gw_ref), atol=2e-4)


def test_gradient_finite_difference():
    rng = np.random.RandomState(4)
    pts = _rand_points(rng, 1, 8)
    S = 8
    tgt = jnp.asarray(rng.rand(1, S, S, S).astype(np.float32))

    def loss(p):
        return jnp.sum((trilinear_splat_pallas(p, S, dot_bf16=False) - tgt) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.array(pts)))
    eps = 1e-3
    for n in range(3):
        for d in range(3):
            pp = pts.copy()
            pp[0, n, d] += eps
            pm = pts.copy()
            pm[0, n, d] -= eps
            fd = (float(loss(jnp.array(pp))) - float(loss(jnp.array(pm)))) / (2 * eps)
            np.testing.assert_allclose(g[0, n, d], fd, atol=2e-2, rtol=5e-2)


def test_bf16_mode_close_to_f32():
    rng = np.random.RandomState(5)
    pts = _rand_points(rng, 2, 256)
    S = 16
    f32 = np.asarray(trilinear_splat_pallas(jnp.array(pts), S, dot_bf16=False))
    bf16 = np.asarray(trilinear_splat_pallas(jnp.array(pts), S, dot_bf16=True))
    assert np.abs(f32 - bf16).max() < 2e-2


def test_fused_splat_blur_matches_unfused():
    """splat_blur_pallas == clip(blur(clip(splat)) * scale), values + grads."""
    import numpy as np
    from im23d_tpu.ops.splat_pallas import splat_blur_pallas
    from im23d_tpu.ops.voxel import gaussian_blur_3d, trilinear_splat

    rng = np.random.RandomState(3)
    B, N, S = 2, 160, 16
    pts = jnp.asarray((rng.rand(B, N, 3) - 0.5) * 1.1, jnp.float32)
    w = jnp.asarray((rng.rand(B, N) > 0.3), jnp.float32)
    scale = jnp.asarray(rng.rand(B) * 2.0, jnp.float32)
    sigma = jnp.float32(0.8)

    ref = gaussian_blur_3d(
        trilinear_splat(pts, S, weights=w), sigma, kernel_size=9, scale=scale
    )
    fused = splat_blur_pallas(pts, S, sigma, scale, weights=w, kernel_size=9,
                              dot_bf16=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), atol=1e-6)

    def loss_ref(p, s):
        v = gaussian_blur_3d(trilinear_splat(p, S, weights=w), sigma,
                             kernel_size=9, scale=s)
        return jnp.sum(jnp.sin(v * 3.0))

    def loss_fused(p, s):
        v = splat_blur_pallas(p, S, sigma, s, weights=w, kernel_size=9,
                              dot_bf16=False)
        return jnp.sum(jnp.sin(v * 3.0))

    gp_r, gs_r = jax.grad(loss_ref, argnums=(0, 1))(pts, scale)
    gp_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(pts, scale)
    np.testing.assert_allclose(np.asarray(gp_r), np.asarray(gp_f),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs_r), np.asarray(gs_f),
                               atol=1e-3, rtol=1e-4)




@pytest.mark.parametrize("sorted_blocks", [False, True])
def test_fused_projection_matches_unfused(sorted_blocks):
    """projection_silhouette_pallas == silhouette(termination(blur(splat)))."""
    import numpy as np
    from im23d_tpu.ops.splat_pallas import projection_silhouette_pallas
    from im23d_tpu.ops.voxel import (
        gaussian_blur_3d,
        project_silhouette,
        termination_probs,
        trilinear_splat,
    )

    rng = np.random.RandomState(7)
    B, N, S = 2, 160, 16
    pts = jnp.asarray((rng.rand(B, N, 3) - 0.5) * 1.1, jnp.float32)
    w = jnp.asarray((rng.rand(B, N) > 0.3), jnp.float32)
    scale = jnp.asarray(0.5 + rng.rand(B) * 1.5, jnp.float32)
    sigma = jnp.float32(0.8)

    def ref(p, s):
        v = gaussian_blur_3d(trilinear_splat(p, S, weights=w), sigma,
                             kernel_size=9, scale=s)
        return project_silhouette(termination_probs(v))

    fused = projection_silhouette_pallas(pts, S, sigma, scale, weights=w,
                                         kernel_size=9, dot_bf16=False,
                                         sorted_blocks=sorted_blocks)
    np.testing.assert_allclose(
        np.asarray(ref(pts, scale)), np.asarray(fused), atol=1e-5
    )

    tgt = jnp.asarray(rng.rand(B, S, S).astype(np.float32))

    def loss_ref(p, s):
        return jnp.sum((ref(p, s) - tgt) ** 2)

    def loss_fused(p, s):
        v = projection_silhouette_pallas(p, S, sigma, s, weights=w,
                                         kernel_size=9, dot_bf16=False,
                                         sorted_blocks=sorted_blocks)
        return jnp.sum((v - tgt) ** 2)

    gp_r, gs_r = jax.grad(loss_ref, argnums=(0, 1))(pts, scale)
    gp_f, gs_f = jax.grad(loss_fused, argnums=(0, 1))(pts, scale)
    np.testing.assert_allclose(np.asarray(gp_r), np.asarray(gp_f),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gs_r), np.asarray(gs_f),
                               atol=1e-3, rtol=1e-3)


def test_winner_reuse_matches_fresh_projection():
    """projection_silhouette_reuse == a fresh differentiable projection.

    The winner-reuse path (losses/effective.py) gathers rows of a
    projection_silhouette_products sweep and re-attaches gradients via
    projection_silhouette_reuse; values and cotangents must match running
    projection_silhouette_pallas on the same rows exactly (identical
    kernels on identical sorted inputs).
    """
    from im23d_tpu.ops.splat_pallas import (
        projection_silhouette_pallas,
        projection_silhouette_products,
        projection_silhouette_reuse,
    )

    rng = np.random.RandomState(7)
    B, N, S = 4, 192, 16
    pts = jnp.array(_rand_points(rng, B, N, spread=1.1))  # some OOB points
    w = jnp.array((rng.rand(B, N) > 0.3).astype(np.float32))
    scale = jnp.array(rng.rand(B).astype(np.float32) * 0.5 + 0.5)
    sigma = jnp.float32(0.6)
    rows = jnp.array([2, 0, 3])

    sil, prods = projection_silhouette_products(
        pts, S, sigma, scale, weights=w, kernel_size=9
    )
    pts_r, w_r, scale_r = pts[rows], w[rows], scale[rows]

    # forward parity: the sweep rows equal a fresh projection of those rows
    fresh = projection_silhouette_pallas(
        pts_r, S, sigma, scale_r, weights=w_r, kernel_size=9,
        need_weight_grad=False,
    )
    np.testing.assert_allclose(np.asarray(sil[rows]), np.asarray(fresh),
                               atol=1e-6)

    cot = jnp.array(rng.rand(len(rows), S, S).astype(np.float32))

    def f_reuse(p, s):
        out = projection_silhouette_reuse(
            p, S, sigma, s, jax.lax.stop_gradient(sil[rows]),
            tuple(jax.lax.stop_gradient(a[rows]) for a in prods),
            weights=w_r, kernel_size=9,
        )
        return jnp.sum(out * cot)

    def f_fresh(p, s):
        out = projection_silhouette_pallas(
            p, S, sigma, s, weights=w_r, kernel_size=9,
            need_weight_grad=False,
        )
        return jnp.sum(out * cot)

    (vr, (gr_p, gr_s)) = jax.value_and_grad(f_reuse, argnums=(0, 1))(
        pts_r, scale_r
    )
    (vf, (gf_p, gf_s)) = jax.value_and_grad(f_fresh, argnums=(0, 1))(
        pts_r, scale_r
    )
    np.testing.assert_allclose(float(vr), float(vf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gf_p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr_s), np.asarray(gf_s), atol=1e-6)


def test_unsupervised_loss_pallas_path_matches_xla():
    """The full ensemble-min loss on the forced-Pallas (winner reuse) path
    agrees with the XLA reference path in values and gradients."""
    import im23d_tpu.losses.effective as eff

    rng = np.random.RandomState(3)
    B, V, K, N, S = 2, 2, 2, 96, 16
    q = rng.randn(B * V, K, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    sq = rng.randn(B * V, 4).astype(np.float32)
    sq /= np.linalg.norm(sq, axis=-1, keepdims=True)
    outputs = dict(
        point_cloud=jnp.array(_rand_points(rng, B, N, spread=0.6)),
        scale=jnp.array(rng.rand(B, 1).astype(np.float32) * 0.5 + 0.5),
        ensemble_q=jnp.array(q),
        student_q=jnp.array(sq),
    )
    masks = jnp.array((rng.rand(B * V, S, S) > 0.6).astype(np.float32))
    kw = jnp.array((rng.rand(B, N) > 0.2).astype(np.float32))

    def total(outputs):
        losses, _ = eff.unsupervised_loss(
            outputs, masks, jnp.float32(0.8), kw, V, voxel_size=S,
            training=True,
        )
        return losses["total_loss"]

    assert not eff._FORCE_PALLAS_PROJECTION
    l_ref, g_ref = jax.value_and_grad(total)(outputs)
    eff._FORCE_PALLAS_PROJECTION = True
    try:
        l_pal, g_pal = jax.value_and_grad(total)(outputs)
    finally:
        eff._FORCE_PALLAS_PROJECTION = False

    # bf16 MXU dots on the Pallas path -> loose tolerances
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-2)
    for key in ("point_cloud", "scale", "ensemble_q"):
        np.testing.assert_allclose(
            np.asarray(g_pal[key]), np.asarray(g_ref[key]),
            atol=2e-2 * max(1.0, float(jnp.abs(g_ref[key]).max())),
        )


def test_candidate_sweep_in_jit_matches_eager():
    """jit(candidate_cam + sorted projection sweep) == the same eagerly.

    Regression for an XLA:TPU fusion miscompilation found in round 3: with
    the candidate broadcast (cloud[:, None] -> (B, C, N, 3) -> reshape) and
    the projection's strided component slice fused into one executable, the
    gz plane was read with a collapsed row stride — rows 1/2 read
    cam[0, i, 1|2] and rows >= 3 read values present NOWHERE in the real
    buffer, silently corrupting every candidate silhouette (the chairs_2k_v3
    run trained on garbage, projection loss flat at ~70).  The fix routes
    planar (z, y, x) components from world_to_camera_zyx into
    _prep_projection with no stack+re-slice.  On CPU/interpret this is a
    cheap jit-vs-eager consistency check; on a real TPU it is the actual
    hardware regression test (run there when kernels change).
    """
    from im23d_tpu.losses import effective as eff
    from im23d_tpu.ops.splat_pallas import projection_silhouette_products

    S, N, B, C = 16, 640, 6, 20
    rng = np.random.RandomState(0)
    cloud = jnp.array((rng.rand(B, N, 3) - 0.5) * 0.02, jnp.float32)
    q = jnp.array(rng.randn(B, C, 4).astype(np.float32))
    scale = jnp.array(rng.rand(B, 1) * 0.1 + 0.45, jnp.float32)
    kw = np.zeros((B, N), np.float32)
    kw[:, : N // 4] = 1.0
    kw = jnp.array(kw)

    def sweep(cloud, q, scale, kw):
        cam, w, sc = eff._candidate_cam(cloud, q, scale, kw)
        sil, _ = projection_silhouette_products(
            cam, S, jnp.float32(1.3), sc, weights=w
        )
        return sil

    eager = sweep(cloud, q, scale, kw)
    jitted = jax.jit(sweep)(cloud, q, scale, kw)
    np.testing.assert_allclose(
        np.asarray(jitted), np.asarray(eager), atol=1e-5
    )
