"""Measure z-sort strategies for the sorted-splat projection kernel.

The chairs-step xplane shows the candidate 5-op ``lax.sort`` at ~4 ms of a
~23 ms step (docs/runs/README.md).  The sort only needs to GROUP points into
z-chunks (order within a chunk is irrelevant), so cheaper formulations may
exist.  Candidates measured here, at the chairs candidate-sweep shape
(B*K*V=480 rows x N=8000 points, 64-voxel grid):

  a) sort4: current primal path — lax.sort (key, gy, gx, c), 1 sort key
  b) sort5: sort4 plus an index payload riding through every bitonic stage
     (what the backward pass needs for its unsort permutation)
  c) sort2+gather: lax.sort (key, idx), then take_along_axis the 3 payloads
  d) sort2+onehot-matmul: apply the permutation as a bf16 one-hot matmul
     (P[i,j] = idx_s[i]==j) against the stacked payload — MXU instead of
     gather
  e) sort1_u32: pack the payload index into the mantissa-free low bits of
     the quantized key (key*8 fits 9 bits << 13 | idx 13 bits for N=8000),
     single u32 sort, unpack + gather

Usage:  python benchmarks/sort_variants.py [--rows 480] [--n 8000]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    """min-of-iters ms with an explicit scalar fetch per iteration.

    block_until_ready alone does not reliably synchronize through the axon
    tunnel (see bench.py / gan_step.py) — fetching one scalar fences each
    call, so this measures execution, not dispatch.
    """

    def fence(out):
        # slice the scalar ON DEVICE before fetching: np.asarray(leaf) would
        # pull the whole (rows, n) array through the tunnel per iteration
        # (~15 MB), adding a bulk-transfer constant to every variant's time
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.numpy.ravel(leaf)[0])

    fence(fn(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=480)
    ap.add_argument("--n", type=int, default=8000)
    args = ap.parse_args()
    B, N = args.rows, args.n

    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.rand(B, N).astype(np.float32) * 64.0)
    gy = jnp.asarray(rng.rand(B, N).astype(np.float32) * 64.0)
    gx = jnp.asarray(rng.rand(B, N).astype(np.float32) * 64.0)
    c = jnp.asarray(rng.rand(B, N).astype(np.float32))

    @jax.jit
    def sort4(key, gy, gx, c):
        return jax.lax.sort((key, gy, gx, c), dimension=-1, num_keys=1)

    @jax.jit
    def sort5(key, gy, gx, c):
        idx0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        return jax.lax.sort((key, gy, gx, c, idx0), dimension=-1, num_keys=1)

    @jax.jit
    def sort2_gather(key, gy, gx, c):
        idx0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        key_s, idx = jax.lax.sort((key, idx0), dimension=-1, num_keys=1)
        stacked = jnp.stack([gy, gx, c], axis=-1)  # (B, N, 3)
        payload = jnp.take_along_axis(stacked, idx[..., None], axis=1)
        return key_s, payload

    @jax.jit
    def sort2_onehot(key, gy, gx, c):
        idx0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        key_s, idx = jax.lax.sort((key, idx0), dimension=-1, num_keys=1)
        onehot = (
            idx[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None]
        ).astype(jnp.bfloat16)  # (B, N, N) permutation matrix
        stacked = jnp.stack([gy, gx, c], axis=-1).astype(jnp.bfloat16)
        payload = jnp.einsum("bij,bjc->bic", onehot, stacked,
                             preferred_element_type=jnp.float32)
        return key_s, payload

    @jax.jit
    def sort1_u32(key, gy, gx, c):
        # 64-voxel grid: key in [0, 64); 1/8-voxel quantization is finer
        # than the z-chunk windows need. 9 bits chunk key + 13 bits index.
        assert N <= 0x2000, (  # indices 0..N-1 must fit 13 bits
            f"sort1_u32 packs the payload index into 13 bits; n={N} would "
            "overflow into the quantized key and corrupt the sort"
        )
        qk = jnp.minimum((key * 8.0).astype(jnp.uint32), jnp.uint32(511))
        idx0 = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.uint32)[None], (B, N)
        )
        packed = (qk << jnp.uint32(13)) | idx0
        packed_s = jax.lax.sort(packed, dimension=-1)
        idx = (packed_s & jnp.uint32(0x1FFF)).astype(jnp.int32)
        key_s = (packed_s >> jnp.uint32(13)).astype(jnp.float32) / 8.0
        stacked = jnp.stack([gy, gx, c], axis=-1)
        payload = jnp.take_along_axis(stacked, idx[..., None], axis=1)
        return key_s, payload

    # correctness: all variants must agree on (key_s, gy_s, gx_s, c_s)
    k4, y4, x4, c4 = map(np.asarray, sort4(key, gy, gx, c))
    k5, y5, x5, c5, _ = map(np.asarray, sort5(key, gy, gx, c))
    k2, p2 = sort2_gather(key, gy, gx, c)
    k2, p2 = np.asarray(k2), np.asarray(p2)
    np.testing.assert_allclose(k4, k5)
    np.testing.assert_allclose(k4, k2)
    for ref, got in [(y4, y5), (x4, x5), (c4, c5),
                     (y4, p2[..., 0]), (x4, p2[..., 1]), (c4, p2[..., 2])]:
        np.testing.assert_allclose(ref, got)

    for name, fn in [("sort4 (current)", sort4),
                     ("sort5 (+idx payload)", sort5),
                     ("sort2+gather", sort2_gather),
                     ("sort1_u32+gather", sort1_u32)]:
        print(f"{name:22s} {timeit(fn, key, gy, gx, c):7.3f} ms")
    if B * N * N <= 480 * 8000 * 8000 // 100:  # onehot is O(N^2): tiny only
        print(f"{'sort2+onehot':22s} {timeit(sort2_onehot, key, gy, gx, c):7.3f} ms")
    else:
        print("sort2+onehot         skipped (O(N^2) memory at this shape)")


if __name__ == "__main__":
    main()
