"""Microbench: folded-width Pallas head conv vs the XLA conv+tanh pair.

Production shape: (B, 512, 256, 64) bf16 -> (B, 512, 256, 3|4), 5×5 kernel
(the generator's conv_final family — docs/runs/README.md round-3 roofline:
18.7 ms of the bs-32 G step on XLA).  Prints fwd and fwd+bwd device-ish
wall (min-of-iters with scalar-fetch fencing, the repo convention).

    python benchmarks/headconv_bench.py [--batch 32] [--iters 10]
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

    fence(fn(*args))  # compile
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

    from im23d_tpu.ops.conv_pallas import head_conv_tanh

    B, H, W, Cin, Cout = args.batch, 512, 256, 64, 3
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), dt)
    k = jnp.asarray(rng.standard_normal((5, 5, Cin, Cout)) * 0.05, jnp.float32)
    b = jnp.zeros((Cout,), jnp.float32)

    def xla_ref(x, k, b):
        left = jnp.repeat(x[:, :, :1], 2, axis=2)
        right = jnp.repeat(x[:, :, -1:], 2, axis=2)
        xp = jnp.concatenate([left, x, right], axis=2)
        y = jax.lax.conv_general_dilated(
            xp, k.astype(x.dtype), (1, 1), ((2, 2), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(x.dtype)
        return jnp.tanh(y.astype(jnp.float32)).astype(x.dtype)

    pallas_fwd = jax.jit(lambda x, k, b: head_conv_tanh(x, k, b))
    xla_fwd = jax.jit(xla_ref)

    co = jnp.asarray(rng.standard_normal((B, H, W, Cout)), dt)

    pallas_bwd = jax.jit(jax.grad(
        lambda x, k, b: jnp.sum(
            head_conv_tanh(x, k, b)[..., :3].astype(jnp.float32)
            * co.astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    ))
    xla_bwd = jax.jit(jax.grad(
        lambda x, k, b: jnp.sum(
            xla_ref(x, k, b).astype(jnp.float32) * co.astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    ))

    print(f"shape (B={B}, 512, 256, {Cin}) {args.dtype}")
    for name, fn in (("xla fwd", xla_fwd), ("pallas fwd", pallas_fwd),
                     ("xla fwd+bwd", xla_bwd), ("pallas fwd+bwd", pallas_bwd)):
        ms = timeit(fn, x, k, b, iters=args.iters)
        print(f"{name:16s} {ms:8.2f} ms")

    # value sanity on-chip (bf16 tolerance)
    yp = np.asarray(pallas_fwd(x, k, b))[..., :3]
    yr = np.asarray(xla_fwd(x, k, b))
    print("max |pallas - xla| =", float(np.abs(yp - yr).max()))


if __name__ == "__main__":
    main()
