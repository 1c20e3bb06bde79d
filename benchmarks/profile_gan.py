"""Capture + summarize an op-level device-time profile of the GAN step.

Runs the bench.py GAN config (512x512 conditional CUB shape, bf16, batch
32) on the real chip under ``jax.profiler.trace`` and prints the top ops
by total device time, parsed straight from the xplane proto (TF's
``tsl.profiler`` protobuf ships in this environment; no tensorboard UI
needed).  This is the measurement tool behind the layout/fusion work on
the 1G+2D iteration (docs/runs/README.md gan_512_bf16).

The wanted phase's jitted step is invoked directly (state rebound through
the donated buffers), so the trace window contains ONLY that step —
``train_step``'s 1G+2D alternation would interleave foreign steps into
the capture.  Async copy ops (copy-start/copy-done: MSA prefetches whose
event spans overlap compute) are totalled separately from the serial op
timeline, so "busy" approximates true device busy time per step.

Usage:
    python benchmarks/profile_gan.py [--batch_size 32] [--steps 6]
        [--phase g|d] [--top 25]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASYNC_PREFIXES = ("copy-start", "copy-done", "all-gather-start",
                  "all-reduce-start", "collective-permute-start")


def summarize_xplane(logdir: str, top: int = 25) -> dict:
    """Aggregate device-stream op durations from the newest xplane.pb.

    Returns dict with:
      ops        [(op_name, total_ms, count)] non-async ops by device time
      busy_ms    sum of all non-async op durations (serial core timeline)
      async_ms   sum of async-copy event spans (overlap compute; not
                 additive with busy_ms)
      steps_ms   per-step span durations from the step-marker line
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        space.ParseFromString(fh.read())

    totals: dict[str, float] = collections.defaultdict(float)
    counts: dict[str, int] = collections.defaultdict(int)
    busy = async_total = 0.0
    steps: list[float] = []
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            if "module" in lname:
                continue
            # step-marker lines carry numeric-named per-step span events;
            # collect them separately instead of polluting the op totals
            is_steps = "step" in lname or all(
                ev_meta[ev.metadata_id].name.isdigit() for ev in line.events[:3]
            )
            for ev in line.events:
                if is_steps:
                    steps.append(ev.duration_ps / 1e9)
                    continue
                name = ev_meta[ev.metadata_id].name
                ms = ev.duration_ps / 1e9
                if name.lstrip("%").startswith(ASYNC_PREFIXES):
                    async_total += ms
                    continue
                busy += ms
                totals[name] += ms
                counts[name] += 1
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    return dict(
        ops=[(name, ms, counts[name]) for name, ms in ranked[:top]],
        busy_ms=busy, async_ms=async_total, steps_ms=sorted(steps),
    )


def build_trainer(args):
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    template = MeshTemplate(segments=32, rings=16)
    B, R = args.batch_size, args.texture_resolution
    rng = np.random.default_rng(0)
    batch = dict(
        texture=rng.standard_normal((B, R, R, 3)).astype(np.float16),
        alpha=rng.random((B, R, R, 1)).astype(np.float16),
        mesh=(rng.standard_normal((B, 32, 32, 3)) * 0.01).astype(np.float16),
        c=np.stack([rng.integers(0, 200, B), np.zeros(B)], 1).astype(np.int32),
    )
    cfg = GANTrainConfig(
        model=GANConfig(
            texture_resolution=R, conditional_class=True,
            compute_dtype="bfloat16",
            wide_hires=getattr(args, "wide_hires", False),
        ),
        batch_size=B,
    )
    return GANTrainer(cfg, template=template), batch


def run_phase(trainer, batch, phase: str, steps: int):
    """Invoke the phase's jitted step `steps` times, rebinding donated
    state exactly as GANTrainer.train_step does."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.fold_in(trainer._rng, trainer.total_it)
    lr = jnp.float32(1.0)
    for _ in range(steps):
        if phase == "g":
            (trainer.g_params, trainer.g_stats, trainer.d_stats, trainer.opt_g,
             trainer.g_ema, losses) = trainer._g_step(
                trainer.g_params, trainer.g_stats, trainer.d_params,
                trainer.d_stats, trainer.opt_g, trainer.g_ema,
                jnp.float32(0.999), lr, batch, rng, trainer.te_params,
            )
        else:
            (trainer.d_params, trainer.d_stats, trainer.g_stats,
             trainer.opt_d, losses) = trainer._d_step(
                trainer.g_params, trainer.g_stats, trainer.d_params,
                trainer.d_stats, trainer.opt_d, lr, batch, rng,
                trainer.te_params,
            )
    float(next(iter(losses.values())))  # fence (axon tunnel needs a fetch)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--texture_resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--phase", choices=("g", "d"), default="g")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--wide_hires", action="store_true",
                    help="128-channel top generator block (GANConfig.wide_hires)")
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax

    trainer, batch = build_trainer(args)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    run_phase(trainer, batch, "g", 1)  # compile both executables
    run_phase(trainer, batch, "d", 1)

    logdir = args.logdir or tempfile.mkdtemp(prefix="gan_profile_")
    with jax.profiler.trace(logdir):
        run_phase(trainer, batch, args.phase, args.steps)

    s = summarize_xplane(logdir, args.top)
    print(json.dumps({
        "logdir": logdir, "steps": args.steps, "phase": args.phase,
        "busy_ms_per_step": round(s["busy_ms"] / args.steps, 2),
        "async_copy_ms_per_step": round(s["async_ms"] / args.steps, 2),
        "step_spans_ms": [round(x, 1) for x in s["steps_ms"]],
    }))
    for name, ms, n in s["ops"]:
        print(f"{ms:9.3f} ms  x{n:<4d} {name[:130]}")


if __name__ == "__main__":
    main()
