"""Microbench: fused affine+lrelu+conv3x3 Pallas vs the XLA chain.

Shapes = the generator's 512² blk6 convs (docs/runs/README.md roofline:
the stage's memory-bound elementwise fusions run ~2.4× the HBM roofline
from 64→128 lane padding):

  conv1: (B, 512, 256, 128) -> 64   (input affine=None — upsample feeds it)
  conv2: (B, 512, 256,  64) -> 64   (input affine+lrelu fused = norm1 chain)

    python benchmarks/fusedconv_bench.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=10):
    import jax

    def fence(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.numpy.ravel(leaf)[0])

    fence(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fence(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from im23d_tpu.ops.conv_pallas import fused_affine_conv3x3

    B, H, W = args.batch, 512, 256
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def xla_chain(x, a, bb, k):
        if a is not None:
            pre = x.astype(jnp.float32) * a[:, None, None, :] + bb[:, None, None, :]
            act = jnp.where(pre >= 0, pre, 0.2 * pre).astype(x.dtype)
        else:
            act = x
        ap_ = jnp.concatenate([act[:, :, :1], act, act[:, :, -1:]], axis=2)
        return jax.lax.conv_general_dilated(
            ap_, k.astype(x.dtype), (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for name, Cin, Cout, affine in (("conv1 128->64", 128, 64, False),
                                    ("conv2 64->64", 64, 64, True)):
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05,
                        jnp.float32)
        a = jnp.asarray(1 + 0.1 * rng.standard_normal((B, Cin)), jnp.float32)
        bb = jnp.asarray(0.1 * rng.standard_normal((B, Cin)), jnp.float32)
        aa, bbb = (a, bb) if affine else (None, None)

        pallas_fwd = jax.jit(
            lambda x, k, a=aa, bb=bbb: fused_affine_conv3x3(x, a, bb, k, None)
        )
        xla_fwd = jax.jit(lambda x, k, a=aa, bb=bbb: xla_chain(x, a, bb, k))

        ms_x = timeit(xla_fwd, x, k, iters=args.iters)
        ms_p = timeit(pallas_fwd, x, k, iters=args.iters)
        yp = np.asarray(pallas_fwd(x, k), np.float32)
        yr = np.asarray(xla_fwd(x, k), np.float32)
        err = float(np.abs(yp - yr).max())
        print(f"{name:16s} xla {ms_x:7.2f} ms   pallas {ms_p:7.2f} ms   "
              f"maxdiff {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
