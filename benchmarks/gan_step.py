"""512x512 mesh-GAN training step-time benchmark (BASELINE config #5).

Measures the jitted G-step and D-step wall time of the conditional CUB
512x512 GAN (reference ``code/main.py --name cub_512x512_class``:
batch 32, 2 critics, class conditioning) on the available devices.

Usage:
    python benchmarks/gan_step.py [--batch_size 32] [--compute_dtype bfloat16]

Prints one JSON line per configuration with g/d step ms and imgs/sec for
the reference 1G+2D iteration pattern.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(trainer, batch, steps: int = 6) -> dict:
    import jax

    # Stage the batch on device once: in production the input pipeline
    # overlaps the ~17 MB fp16 H2D with the step; on the axon RPC tunnel a
    # per-step upload adds hundreds of ms that say nothing about the step.
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    def sync(losses):
        # explicit scalar fetch: block_until_ready does not reliably
        # synchronize through the axon tunnel (see bench.py).  One fetch
        # fences the step; fetching every loss adds a ~25 ms tunnel RPC
        # round-trip each.
        float(next(iter(losses.values())))

    # one G + two D to compile both executables
    for _ in range(3):
        losses = trainer.train_step(batch)
    sync(losses)

    def time_phase(target_mod):
        # run only iterations whose phase matches (g: it%3==0, d otherwise)
        ts = []
        for _ in range(steps):
            while (trainer.total_it % (1 + trainer.cfg.d_steps_per_g) == 0) != (
                target_mod == "g"
            ):
                sync(trainer.train_step(batch))
            t0 = time.perf_counter()
            sync(trainer.train_step(batch))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    g_s = time_phase("g")
    d_s = time_phase("d")

    # Pipelined iteration time: queue `groups` full 1G+kD groups back to
    # back and sync once.  The per-phase timings above fence every step, so
    # each carries a full dispatch/tunnel round trip (~70 ms on the axon
    # RPC tunnel) that a real training loop — which only fetches metrics
    # every log interval — never pays.  This is the number a production
    # loop sustains; g/d_step_ms remain the fenced per-phase breakdown.
    # k (group size) comes from the trainer config so the names/sums can't
    # drift from the measurement loop if d_steps_per_g changes.
    k = 1 + trainer.cfg.d_steps_per_g
    groups = 5
    while trainer.total_it % k != 0:
        sync(trainer.train_step(batch))
    group_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(groups * k):
            losses = trainer.train_step(batch)
        sync(losses)
        group_ts.append((time.perf_counter() - t0) / groups)
    it_s = min(group_ts)

    B = batch["alpha"].shape[0]
    return dict(
        g_step_ms=round(g_s * 1e3, 2),
        d_step_ms=round(d_s * 1e3, 2),
        group_size=k,  # steps per group: 1 G + (k-1) D
        iter_group_fenced_ms=round((g_s + (k - 1) * d_s) * 1e3, 2),
        iter_group_ms=round(it_s * 1e3, 2),
        imgs_per_sec_pipelined=round(k * B / it_s, 2),
        methodology="pipelined group of 1G+%dD, sync once per group" % (k - 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--texture_resolution", type=int, default=512)
    ap.add_argument("--compute_dtype", type=str, default="both",
                    choices=("float32", "bfloat16", "both"))
    ap.add_argument("--wide_hires", action="store_true",
                    help="128-channel top generator block (full bf16 lane "
                    "occupancy at the 512^2 stage; see GANConfig.wide_hires)")
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    template = MeshTemplate(segments=32, rings=16)  # CUB autodetect template
    B, R = args.batch_size, args.texture_resolution
    rng = np.random.default_rng(0)
    batch = dict(
        texture=rng.standard_normal((B, R, R, 3)).astype(np.float16),
        alpha=rng.random((B, R, R, 1)).astype(np.float16),
        mesh=(rng.standard_normal((B, 32, 32, 3)) * 0.01).astype(np.float16),
        c=np.stack([rng.integers(0, 200, B), np.zeros(B)], 1).astype(np.int32),
    )
    dtypes = (
        ["float32", "bfloat16"]
        if args.compute_dtype == "both"
        else [args.compute_dtype]
    )
    for dt in dtypes:
        cfg = GANTrainConfig(
            model=GANConfig(
                texture_resolution=R, conditional_class=True,
                compute_dtype=dt, wide_hires=args.wide_hires,
            ),
            batch_size=B,
        )
        trainer = GANTrainer(cfg, template=template)
        out = measure(trainer, batch)
        print(json.dumps(dict(
            bench="gan_step", texture_resolution=R, batch_size=B,
            compute_dtype=dt, wide_hires=args.wide_hires, **out,
        )), flush=True)


if __name__ == "__main__":
    main()
