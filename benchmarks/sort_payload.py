"""Microbench: payload-carrying sort vs key+index sort + row gathers.

The candidate-sweep projection sorts (key, gy, gx, c) rows of shape
(B*V*K, N) by z (``ops/splat_pallas.py:_sort_and_windows``).  Every extra
payload rides through every bitonic stage; gathering the payloads once by
the sorted index may be cheaper.  This harness measures both at chairs
scale so the kernel keeps whichever the hardware prefers.

Usage: python benchmarks/sort_payload.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    B, N = 480, 8000  # chairs sweep: B*V*K rows
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.uniform(0, 64, (B, N)).astype(np.float32))
    gy = jnp.asarray(rng.uniform(0, 64, (B, N)).astype(np.float32))
    gx = jnp.asarray(rng.uniform(0, 64, (B, N)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))

    @jax.jit
    def sort4(key, gy, gx, c):
        return jax.lax.sort((key, gy, gx, c), dimension=-1, num_keys=1)

    @jax.jit
    def sort5(key, gy, gx, c):
        perm0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        return jax.lax.sort((key, gy, gx, c, perm0), dimension=-1, num_keys=1)

    @jax.jit
    def sort2_gather(key, gy, gx, c):
        perm0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        key_s, perm = jax.lax.sort((key, perm0), dimension=-1, num_keys=1)
        gy_s = jnp.take_along_axis(gy, perm, axis=-1)
        gx_s = jnp.take_along_axis(gx, perm, axis=-1)
        c_s = jnp.take_along_axis(c, perm, axis=-1)
        return key_s, gy_s, gx_s, c_s

    r4 = sort4(key, gy, gx, c)
    r2 = sort2_gather(key, gy, gx, c)
    for a, b in zip(r4, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    print(json.dumps(dict(
        sort4_ms=round(timed(sort4, key, gy, gx, c) * 1e3, 2),
        sort5_ms=round(timed(sort5, key, gy, gx, c) * 1e3, 2),
        sort2_gather_ms=round(timed(sort2_gather, key, gy, gx, c) * 1e3, 2),
    )))
