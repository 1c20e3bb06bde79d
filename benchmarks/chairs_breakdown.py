"""Component breakdown of the ShapeNet chairs train step (real TPU).

Times three jitted variants at the chairs config to show where the step
budget goes: full step, model-only (encoder/decoder/pose fwd+bwd with a
surrogate loss), and projection-only (the effective-loss kernels on fixed
clouds).  Guides kernel-optimization priorities.

Usage: python benchmarks/chairs_breakdown.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=8):
    out = fn(*args)
    jfloat = float(np.asarray(out).ravel()[0])  # sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), jfloat


def main():
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from im23d_tpu.losses.effective import unsupervised_loss
    from im23d_tpu.models.pointcloud_nets import UnsupervisedPart
    from im23d_tpu.ops.pointcloud import keep_mask

    B, V, K = 24, 5, 4
    H, S, N = 128, 64, 8000
    model = UnsupervisedPart(num_points=N, num_candidates=K, num_views=V)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (B, H, H, 3))
    pose_input = jax.random.uniform(rng, (B * V, H, H, 3))
    masks = (jax.random.uniform(rng, (B * V, H, H)) > 0.7).astype(jnp.float32)
    params = jax.jit(model.init)(rng, images, pose_input)
    kw = keep_mask(jax.random.PRNGKey(1), B, N, jnp.float32(0.5))

    def full_loss(p):
        out = model.apply(p, images, pose_input)
        losses, _ = unsupervised_loss(out, masks, jnp.float32(1.0), kw, V,
                                      voxel_size=S, training=True)
        return losses["total_loss"]

    def model_only(p):
        out = model.apply(p, images, pose_input)
        return (jnp.mean(out["point_cloud"] ** 2)
                + jnp.mean(out["ensemble_q"] ** 2)
                + jnp.mean(out["student_q"] ** 2)
                + jnp.mean(out["scale"] ** 2))

    out0 = jax.jit(lambda p: model.apply(p, images, pose_input))(params)
    cloud = jax.block_until_ready(out0["point_cloud"])
    equat = out0["ensemble_q"]
    squat = out0["student_q"]
    scale = out0["scale"]

    def proj_only(cloud, equat, squat, scale):
        out = dict(point_cloud=cloud, ensemble_q=equat, student_q=squat,
                   scale=scale)
        losses, _ = unsupervised_loss(out, masks, jnp.float32(1.0), kw, V,
                                      voxel_size=S, training=True)
        return losses["total_loss"]

    g_full = jax.jit(jax.grad(full_loss))
    g_model = jax.jit(jax.grad(model_only))
    g_proj = jax.jit(jax.grad(proj_only, argnums=(0, 1, 2, 3)))

    t_full, _ = timed(lambda p: jax.tree_util.tree_leaves(g_full(p))[0], params)
    t_model, _ = timed(lambda p: jax.tree_util.tree_leaves(g_model(p))[0], params)
    t_proj, _ = timed(
        lambda *a: g_proj(*a)[0], cloud, equat, squat, scale
    )

    print(json.dumps(dict(
        full_ms=round(t_full * 1e3, 2),
        model_only_ms=round(t_model * 1e3, 2),
        projection_only_ms=round(t_proj * 1e3, 2),
        imgs_per_sec_full=round(B / t_full, 1),
    )))


if __name__ == "__main__":
    main()
