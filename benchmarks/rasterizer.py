"""Standalone differentiable-rasterizer benchmark (real TPU).

Times ``rasterize_tiled`` forward and forward+backward at the two
render configurations the framework uses most: the recon training render
(256 squared, 16-ring template) and the GAN eval render (512 squared,
31-ring template).  Replaces the reference's Kaolin DIB-R CUDA rasterizer
(``code/rendering/renderer.py:60-67``).

Usage: python benchmarks/rasterizer.py [B res segments rings]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(B: int, res: int, segments: int, rings: int) -> None:
    import jax
    import jax.numpy as jnp

    from im23d_tpu.geometry.objio import uv_sphere
    from im23d_tpu.render.rasterizer_pallas import rasterize_tiled

    mesh = uv_sphere(segments, rings)
    F = mesh.faces.shape[0]
    rng = jax.random.PRNGKey(0)
    v = jnp.tile(jnp.asarray(mesh.vertices * 0.8, jnp.float32)[None],
                 (B, 1, 1))
    v = v + jax.random.normal(rng, v.shape) * 0.01
    faces = jnp.asarray(mesh.faces, jnp.int32)
    attrs = jax.random.uniform(rng, (B, F, 3, 3))

    fwd = jax.jit(
        lambda v_, a_: jnp.sum(rasterize_tiled(v_, faces, a_, res, res)[0])
    )
    grd = jax.jit(lambda v_, a_: sum(jnp.sum(x) for x in jax.grad(
        lambda vv, aa: sum(
            jnp.sum(o ** 2) for o in rasterize_tiled(vv, faces, aa, res, res)
        ),
        argnums=(0, 1))(v_, a_)))

    def t(fn):
        float(fn(v, attrs))  # compile + sync (scalar fetch fences the step)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(fn(v, attrs))
            ts.append(time.perf_counter() - t0)
        return round(min(ts) * 1e3, 1)

    print(json.dumps({
        "bench": "rasterizer", "B": B, "res": res, "faces": int(F),
        "fwd_ms": t(fwd), "fwd_bwd_ms": t(grd),
    }))


def main() -> None:
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    if len(sys.argv) > 1:
        bench(*[int(a) for a in sys.argv[1:]])
    else:
        bench(50, 256, 32, 16)
        bench(16, 512, 64, 31)


if __name__ == "__main__":
    main()
