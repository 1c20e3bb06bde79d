"""Root-cause instrument for the ~11 KB/step host-RSS creep (VERDICT r4).

Runs the same ``ShapeNetLearner`` loop as ``sustained_chairs.py`` at a tiny
config and snapshots RSS + tracemalloc every ``--snap_every`` steps, then
prints the top allocation-growth sites between the first and last snapshot
grouped by file.  Python-side growth (e.g. the TensorBoard event-writer
buffering suspect) shows up attributed to its module; if RSS grows while
tracemalloc stays flat, the leak is native (axon RPC client / XLA host
buffers), not framework Python.

Runs on any backend; pass ``--tensorboard 0`` for the A/B arm.

    python benchmarks/rss_probe.py --steps 4000 --tensorboard 1
    python benchmarks/rss_probe.py --steps 4000 --tensorboard 0
"""

import argparse
import itertools
import json
import os
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_kb() -> int:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--snap_every", type=int, default=500)
    ap.add_argument("--tensorboard", type=int, default=1)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: whatever "
                    "setup_jax picks, i.e. the chip under axon)")
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from im23d_tpu.core import metrics_logger
    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    if not args.tensorboard:
        # MetricsLogger(tensorboard=...) is not plumbed through ShapeNetLearner,
        # so the A/B arm disables the mirror at the module seam
        orig = metrics_logger.MetricsLogger.__init__

        def patched(self, workdir, name="train", tensorboard=True):
            orig(self, workdir, name=name, tensorboard=False)

        metrics_logger.MetricsLogger.__init__ = patched

    cfg = ShapeNetConfig(
        image_size=32, voxel_size=16, num_points=256, num_views=2,
        num_candidates=2, batch_size=4, total_steps=args.steps,
        log_every=args.log_every, eval_every=10 * args.steps,
    )
    workdir = f"/tmp/rss_probe_{os.getpid()}"
    learner = ShapeNetLearner(cfg, workdir=workdir)
    data = SyntheticSilhouettes(cfg.batch_size, cfg.image_size, cfg.num_views,
                                n_points=64, seed=0)
    pool = [learner.put_batch(data.next_batch()) for _ in range(4)]
    feed = itertools.cycle(pool)
    learner.train_step(next(feed), already_on_device=True)  # compile

    tracemalloc.start(10)
    snap0 = None
    rss = []
    t0 = time.time()
    tlog = t0
    for i in range(args.steps):
        losses = learner.train_step(next(feed), already_on_device=True)
        step = i + 1
        if learner.logger and step % cfg.log_every == 0:
            host = {k: float(v) for k, v in losses.items()}
            host["steps_per_sec"] = cfg.log_every / max(time.time() - tlog, 1e-9)
            tlog = time.time()
            learner.logger.log(step, host)
        if step % args.snap_every == 0:
            float(losses["total_loss"])
            snap = tracemalloc.take_snapshot()
            cur, peak = tracemalloc.get_traced_memory()
            rss.append(dict(step=step, rss_kb=_rss_kb(),
                            traced_kb=round(cur / 1024, 1)))
            print(json.dumps(rss[-1]), flush=True)
            if snap0 is None:
                snap0 = snap
            last = snap
    # attribution: growth between first and last snapshot, grouped by file
    stats = last.compare_to(snap0, "filename")
    print("\n=== top tracemalloc growth (first->last snapshot) ===", flush=True)
    for s in stats[:15]:
        print(f"{s.size_diff / 1024:+10.1f} KB  {s.count_diff:+8d} blocks  "
              f"{s.traceback[0].filename}", flush=True)
    steps_span = rss[-1]["step"] - rss[0]["step"]
    print(json.dumps(dict(
        bench="rss_probe",
        tensorboard=bool(args.tensorboard),
        steps=args.steps,
        rss_slope_kb_per_step=round(
            (rss[-1]["rss_kb"] - rss[0]["rss_kb"]) / steps_span, 3),
        traced_slope_kb_per_step=round(
            (rss[-1]["traced_kb"] - rss[0]["traced_kb"]) / steps_span, 3),
        wall_s=round(time.time() - t0, 1),
    )), flush=True)


if __name__ == "__main__":
    main()
