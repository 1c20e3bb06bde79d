"""End-of-schedule (p=1.0) chairs step-time sweep over splat kernel knobs.

At p=1.0 no points are dropped, the per-chunk block windows are at their
widest, and the step costs ~29.4 ms (vs 19.7 at schedule start —
docs/runs/README.md step_time_sweep).  This sweeps the windowed kernels'
z-chunk (IM23D_SPLAT_ZC) and block width (IM23D_SPLAT_BLK) at the forced
schedule end; the knobs are read at trace time, so each combo runs in a
child interpreter.

    python benchmarks/p1_sweep.py                  # sweep combos
    python benchmarks/p1_sweep.py --single 4 128   # one combo (child mode)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_single(zc: int, blk: int, steps: int = 10, reps: int = 3,
               at_start: bool = False) -> None:
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = ShapeNetConfig.chairs()
    learner = ShapeNetLearner(cfg, mesh=make_mesh())
    data = SyntheticSilhouettes(cfg.batch_size, cfg.image_size, cfg.num_views,
                                n_points=256, seed=0)
    batches = [data.next_batch() for _ in range(4)]
    for _ in range(2):
        losses = learner.train_step(batches[0])
    float(losses["total_loss"])
    pool = [learner.put_batch(b) for b in batches]
    if not at_start:
        learner.state = learner.state.replace(
            step=jnp.asarray(cfg.total_steps, jnp.asarray(0).dtype)
        )

    def measure():
        t0 = time.perf_counter()
        for i in range(steps):
            losses = learner.train_step(pool[i % 4], already_on_device=True)
        float(losses["total_loss"])
        return time.perf_counter() - t0

    measure()  # compile at the forced step position
    dt = min(measure() for _ in range(reps))
    p_now, _ = learner._schedules(learner.state.step)
    print(json.dumps(dict(
        zc=zc, blk=blk, at_start=at_start,
        step_now=int(learner.state.step), p_now=round(float(p_now), 4),
        step_ms=round(dt / steps * 1e3, 3),
        imgs_per_sec=round(cfg.batch_size * steps / dt, 1),
    )), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", nargs=2, type=int, default=None)
    ap.add_argument("--at_start", action="store_true")
    ap.add_argument("--combos", default="4:128,8:128,4:256,8:256,16:256")
    args = ap.parse_args()

    if args.single:
        run_single(args.single[0], args.single[1], at_start=args.at_start)
        return

    here = os.path.dirname(os.path.abspath(__file__))
    for combo in args.combos.split(","):
        zc, blk = combo.split(":")
        env = dict(os.environ, IM23D_SPLAT_ZC=zc, IM23D_SPLAT_BLK=blk)
        env["PYTHONPATH"] = os.path.dirname(here) + os.pathsep + env.get(
            "PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", zc, blk]
            + (["--at_start"] if args.at_start else []),
            env=env, timeout=2400,
        )
        if proc.returncode != 0:
            print(json.dumps(dict(zc=int(zc), blk=int(blk),
                                  error=f"rc={proc.returncode}")), flush=True)


if __name__ == "__main__":
    main()
