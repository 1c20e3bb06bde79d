"""Separate the axes of the in-run steps/sec decay (VERDICT r3 weak #3).

Long chairs runs show per-step device time growing monotonically
(v4: 48.6 -> 32.1 steps/s over a 2k run; the round-4 10k probe run:
48 -> 33 steps/s with host dispatch FLAT at ~1.6 ms and RSS flat — so the
growth is on-device).  Two candidate mechanisms:

1. SCHEDULE-driven: the dropout keep-prob p (0.07 -> 1.0) and smoothing
   sigma (3.0 -> 0.2) are traced functions of ``state.step``
   (reference ``training_test_shape_net.py:21-29``); rising p activates
   14x more splat weight mass by the end of the run.
2. PARAMS-driven: as the model learns, the predicted clouds concentrate,
   changing the z-sorted block-windowed splat kernel's occupancy.

This bench measures fenced per-step time as a function of a FORCED
``state.step`` (sweeping the schedules with params held fixed), optionally
before and after ``--train`` real steps (sweeping params), and after
restoring the fresh params.  Whichever axis moves the time is the
mechanism.

Usage: python benchmarks/step_time_sweep.py [--total_steps 10000]
           [--train 3000] [--group 50] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--total_steps", type=int, default=10000,
                    help="schedule denominator (matches the decaying runs)")
    ap.add_argument("--train", type=int, default=0,
                    help="real training steps between the two sweeps")
    ap.add_argument("--group", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pool", type=int, default=2)
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = ShapeNetConfig(**{
        **ShapeNetConfig.chairs().__dict__,
        "total_steps": args.total_steps,
        "eval_every": 10 * args.total_steps,
    })
    learner = ShapeNetLearner(cfg)
    # NOTE: do NOT jax.device_get the whole param tree here to snapshot the
    # fresh weights — a full-tree fetch hangs the axon tunnel indefinitely
    # (reproduced twice, round 4; single-scalar fetches are fine).
    # _init_state() is deterministic in the config seed, so "restore fresh
    # params" below just re-initializes on device.
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views, n_points=256, seed=0
    )
    pool = [learner.put_batch(data.next_batch()) for _ in range(args.pool)]

    losses = learner.train_step(pool[0], already_on_device=True)  # compile
    float(losses["total_loss"])

    def measure_group() -> float:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.group):
                losses = learner.train_step(pool[i % len(pool)],
                                            already_on_device=True)
            float(losses["total_loss"])  # fence (axon needs a scalar fetch)
            best = min(best, time.perf_counter() - t0)
        return best / args.group * 1e3

    def force_step(s: int) -> None:
        learner.state = learner.state.replace(
            step=jnp.asarray(s, jnp.asarray(0).dtype)
        )

    sweep_points = [0, args.total_steps // 4, args.total_steps // 2,
                    3 * args.total_steps // 4, args.total_steps - args.group]

    def sweep(label: str) -> None:
        for s in sweep_points:
            force_step(s)
            ms = measure_group()
            print(json.dumps(dict(bench="step_time_sweep", phase=label,
                                  forced_step=s, step_ms=round(ms, 3))),
                  flush=True)

    sweep("fresh_params")

    if args.train:
        force_step(0)
        t0 = time.time()
        for i in range(args.train):
            losses = learner.train_step(pool[i % len(pool)],
                                        already_on_device=True)
        final = float(losses["total_loss"])
        print(json.dumps(dict(bench="step_time_sweep", phase="train",
                              steps=args.train,
                              train_wall_s=round(time.time() - t0, 1),
                              final_total_loss=round(final, 3))), flush=True)
        sweep("trained_params")

        learner.state = learner._init_state()  # deterministic in cfg.seed
        sweep("fresh_params_restored")


if __name__ == "__main__":
    main()
