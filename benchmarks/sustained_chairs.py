"""Sustained end-to-end ShapeNet training run (real TPU, single chip).

Unlike ``bench.py`` (pure device step time on pre-staged batches), this
measures the full training loop: ``ShapeNetLearner.fit`` with logging,
metric fetches every ``log_every`` steps, and a checkpoint at the end —
the number a user sees on the wall clock for a real run.  All three
reference categories are supported (``--category chairs|planes|cars``),
the schedule denominator can be pinned to the production value
(``--schedule_steps 130000`` runs a prefix of the real schedule), and
``--probe_every N`` instruments the loop with per-N-step dispatch/fenced
/RSS/GC probes (the round-4 throughput-decay investigation).

Batches come from a fixed pre-staged pool of ``SyntheticSilhouettes``
(see docs/runs/README.md for the axon-tunnel streaming caveat; the real
data pipeline sustains ~3880 imgs/s host-side with the RAM cache, well
above the device step, so the pool is not hiding an input bottleneck).

Usage: python benchmarks/sustained_chairs.py [--steps 2000] [--workdir D]
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def _probed_fit(learner, feed, num_steps: int, probe_every: int,
                workdir: str) -> dict:
    """learner.fit's loop with a host-side probe every ``probe_every`` steps.

    Each probe record separates the step's DISPATCH cost (time for
    ``train_step`` to return — pure host+RPC work; the device keeps running)
    from its FENCED cost (dispatch + one scalar fetch = wait for the device
    to drain), and snapshots host RSS and GC counters.  If steps/sec decays
    while ``dispatch_ms`` grows and ``fenced_ms`` stays flat, the host/tunnel
    is degrading; if ``fenced_ms`` grows too, the device step itself is.
    """
    import gc
    import json as _json

    cfg = learner.cfg
    probe_path = os.path.join(workdir, "probe.jsonl")
    losses: dict = {}
    t0 = time.time()
    tlog = t0
    step0 = int(learner.state.step)
    with open(probe_path, "w") as probe_fh:
        for i in range(num_steps):
            batch_dev = next(feed)
            step = step0 + i + 1
            if probe_every and step % probe_every == 0:
                g0, g1, g2 = gc.get_count()
                td0 = time.perf_counter()
                losses = learner.train_step(batch_dev, already_on_device=True)
                dispatch_s = time.perf_counter() - td0
                float(losses["total_loss"])  # fence: device drained
                fenced_s = time.perf_counter() - td0
                probe_fh.write(_json.dumps(dict(
                    step=step,
                    wall_s=round(time.time() - t0, 2),
                    dispatch_ms=round(dispatch_s * 1e3, 3),
                    fenced_ms=round(fenced_s * 1e3, 3),
                    rss_mb=round(_rss_mb(), 1),
                    gc_counts=[g0, g1, g2],
                    gc_collections=[s["collections"] for s in gc.get_stats()],
                )) + "\n")
                probe_fh.flush()
            else:
                losses = learner.train_step(batch_dev, already_on_device=True)
            if learner.logger and step % cfg.log_every == 0:
                host = {k: float(v) for k, v in losses.items()}
                host["steps_per_sec"] = cfg.log_every / max(
                    time.time() - tlog, 1e-9
                )
                tlog = time.time()
                learner.logger.log(step, host)
    return {k: float(v) for k, v in losses.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--category", choices=("chairs", "planes", "cars"),
                    default="chairs",
                    help="reference per-category config "
                    "(training_test_shape_net.py:182-237): chairs 128px/"
                    "voxel64/8000pts/bs24, planes & cars 64px/voxel32/"
                    "4000pts/bs16")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--schedule_steps", type=int, default=None,
                    help="schedule denominator (ShapeNetConfig.total_steps); "
                    "defaults to --steps.  Set to the production 130000 to "
                    "run a prefix of the real training schedule: the p/sigma "
                    "sweep then covers only steps/schedule_steps of its "
                    "range instead of all of it")
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--stream", action="store_true",
                    help="feed a fresh host batch every step (measures the "
                    "host->device path too; on the axon dev tunnel this "
                    "degrades after ~500 transfers — see docs/runs/README.md "
                    "— but on a real TPU host it is the production mode)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--no_logger", action="store_true",
                    help="disable the MetricsLogger entirely (no TB, no "
                    "jsonl, no log.txt) — the at-scale arm of the RSS-creep "
                    "attribution (docs/runs/README.md round 5)")
    ap.add_argument("--probe_every", type=int, default=0,
                    help="if > 0, run the loop with a host-side probe every "
                    "N steps recording RSS, GC counts, dispatch-only time "
                    "and fenced step time to <workdir>/probe.jsonl — the "
                    "instrument for the in-run throughput-decay "
                    "investigation (VERDICT r3 weak #3)")
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    base = getattr(ShapeNetConfig, args.category)()
    cfg = ShapeNetConfig(**{
        **base.__dict__,
        "total_steps": args.schedule_steps or args.steps,
        "eval_every": args.steps,  # one grid + checkpoint at the end
    })
    workdir = args.workdir or f"/tmp/{args.category}_sustained_{os.getpid()}"
    tsetup = time.time()
    learner = ShapeNetLearner(cfg, workdir=workdir)
    if args.no_logger and learner.logger is not None:
        learner.logger.close()
        learner.logger = None
    print(f"[phase] learner init {time.time() - tsetup:.1f}s", file=sys.stderr,
          flush=True)
    tsetup = time.time()
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views, n_points=256, seed=0
    )
    host_batches = [data.next_batch(return_gt=True) for _ in range(args.pool)]
    gt_clouds = [b.pop("gt_cloud") for b in host_batches]
    print(f"[phase] host datagen {time.time() - tsetup:.1f}s", file=sys.stderr,
          flush=True)
    tsetup = time.time()
    pool = [learner.put_batch(b) for b in host_batches]
    print(f"[phase] pool upload {time.time() - tsetup:.1f}s", file=sys.stderr,
          flush=True)

    # one compile step outside the timed window (jit warm-up is a one-time
    # cost amortized over 130k steps in production; docs/runs reports both)
    warm0 = time.time()
    learner.train_step(pool[0], already_on_device=True)
    float(learner.state.step)  # sync
    warm = time.time() - warm0

    if args.stream:
        # fresh host batches each step: exercises the real host->device feed
        def batches():
            while True:
                yield learner.put_batch(data.next_batch())
        feed = batches()
    else:
        feed = itertools.cycle(pool)
    t0 = time.time()
    if args.probe_every:
        losses = _probed_fit(learner, feed, args.steps - 1, args.probe_every,
                             workdir)
    else:
        losses = learner.fit(feed, num_steps=args.steps - 1)
    dt = time.time() - t0
    imgs = cfg.batch_size * (args.steps - 1)

    # loop-only steady state from the metrics stream (excludes the
    # end-of-run projection grid + checkpoint that fit() performs at
    # eval_every, which is a once-per-13k-steps cost in production)
    loop_ips = None
    first_proj = last_proj = None
    mpath = os.path.join(workdir, "metrics_shapenet.jsonl")
    if os.path.exists(mpath):
        recs = [json.loads(line) for line in open(mpath)]
        # learning-trajectory evidence: a throughput number from a
        # non-learning run is not a valid result, so the projection-loss
        # endpoints ride along in the output
        projs = [r["projection_loss"] for r in recs if "projection_loss" in r]
        if projs:
            first_proj = round(projs[0], 3)
            last_proj = round(projs[-1], 3)
        recs = [r for r in recs if "steps_per_sec" in r]
        if len(recs) >= 2:
            span = recs[-1]["time"] - recs[0]["time"]
            loop_ips = round(
                cfg.batch_size * (recs[-1]["step"] - recs[0]["step"]) / span, 1
            )
    # Chamfer vs the synthetic ground-truth clouds (BASELINE "ShapeNet
    # Chamfer" trail): predicted clouds from the trained model on every pool
    # batch vs the generator's true geometry
    import jax
    import jax.numpy as jnp
    import numpy as np
    from im23d_tpu.metrics.chamfer import chamfer_distance

    @jax.jit
    def predict(params, images, pose_input):
        out = learner.model.apply(params, images, pose_input)
        return out["point_cloud"]

    chamfers = []
    for hb, gt in zip(host_batches, gt_clouds):
        nb = learner._normalize(jax.tree_util.tree_map(jnp.asarray, hb))
        pred = predict(learner.state.params, nb["images"], nb["pose_input"])
        total, _, _ = chamfer_distance(pred.astype(jnp.float32),
                                       jnp.asarray(gt))
        chamfers.append(float(jnp.mean(total)))
    chamfer_gt = round(float(np.mean(chamfers)), 5)
    if learner.logger is not None:
        learner.logger.log(args.steps, {"chamfer_synthetic_gt": chamfer_gt})

    print(json.dumps({
        "category": args.category,
        "steps": args.steps,
        "schedule_steps": args.schedule_steps or args.steps,
        "warmup_s": round(warm, 1),
        "wall_s": round(dt, 1),
        "mode": "stream" if args.stream else "device_pool",
        "imgs_per_sec_wall": round(imgs / dt, 1),  # whole run incl. the
        # one-time end-of-run grid-jit compile + checkpoint
        "imgs_per_sec_loop": loop_ips,  # steady-state loop from the
        # metrics stream (excludes the end-of-run one-time costs)
        "first_projection_loss": first_proj,
        "last_projection_loss": last_proj,
        "chamfer_synthetic_gt": chamfer_gt,
        "final_total_loss": round(float(losses.get("total_loss", 0.0)), 3),
        "workdir": workdir,
    }))


if __name__ == "__main__":
    main()
