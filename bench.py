"""Flagship benchmark: ShapeNet-chairs unsupervised train step on TPU.

Reference config: ``code/training_test_shape_net.py:184-197`` — batch 24,
image 128, voxel 64, 8000 points, 5 views, 4 pose candidates.  Metric is
training throughput in images/sec (batch * steps/sec of the full jitted
train step: forward, 480-way candidate projection, backward, AdamW).

Prints ONE final JSON line: {"metric", "value", "unit", "vs_baseline"}
(plus ``gan_512_cond_iter_ms`` folded in when ``--metric all`` ran the GAN
bench too — the driver records only the LAST JSON line, so both numbers
must ride on it).  The reference publishes no wall-clock numbers
(BASELINE.md), so vs_baseline compares against the previous round's
recorded value when available (BENCH_r*.json), else 1.0.

Process hygiene (round-4 fix): the 512² GAN bench streams ~100 MB batches
through the axon tunnel and measurably degrades throughput for anything
that runs after it in the same process (round-3 recorded 352 imgs/s for a
chairs config that measures 1104 imgs/s solo).  Under ``--metric all`` the
GAN bench therefore runs in a SUBPROCESS — before the parent ever
initializes its own TPU client — and the chairs headline is measured in
the clean parent process.
"""

import glob
import json
import os
import re
import subprocess
import sys
import time

# v5e bf16 peak (MXU); MFU here is a guideline, not a gate: both workloads
# are measured against this single number even though some heads run f32.
PEAK_FLOPS = 197e12


def _analytic_flops(key: str) -> float | None:
    """Cached analytic FLOPs from benchmarks/flops_cache.json (committed;
    regenerate with ``python benchmarks/flops_count.py`` after model
    changes).  XLA HLO cost analysis of the lowered step — for chairs this
    is the dense-projection p=1.0 workload, so MFU is computed against the
    end-of-schedule step time, where the Pallas kernel does the same work.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "flops_cache.json")
    try:
        with open(path) as fh:
            return float(json.load(fh)[key])
    except Exception:
        return None


def _prior_value(unit: str, metric: str | None = None):
    """Latest recorded value with this unit (and metric, if given) from
    prior rounds' ``BENCH_r*.json``.

    The driver wraps the benchmark's JSON line under a ``"parsed"`` key
    (see ``BENCH_r01.json``); bare records are accepted too so local
    ``python bench.py > BENCH_rXX.json`` snapshots also count.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    prior, prior_name = None, None
    paths = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: int(re.findall(r"\d+", os.path.basename(p))[0]),
    )
    for path in paths:
        try:
            with open(path) as fh:
                rec = json.load(fh)
            rec = rec.get("parsed", rec)
            if rec.get("unit") == unit and (
                metric is None or rec.get("metric") == metric
            ):
                prior = float(rec["value"])
                prior_name = os.path.splitext(os.path.basename(path))[0]
        except Exception:
            pass
    return prior, prior_name


def _prior_gan_ms():
    """Prior GAN iteration ms: either a dedicated gan record or the
    ``gan_512_cond_iter_ms`` key folded into a combined chairs record.

    Candidates are ranked by ROUND NUMBER regardless of record shape, so a
    newer dedicated record is never shadowed by an older folded one.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    best_round, prior, prior_name = -1, None, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        try:
            rnd = int(re.findall(r"\d+", os.path.basename(path))[0])
            with open(path) as fh:
                rec = json.load(fh)
            rec = rec.get("parsed", rec)
            if "gan_512_cond_iter_ms" in rec:
                value = float(rec["gan_512_cond_iter_ms"])
            elif rec.get("metric") == "gan_512_cond_iter_time":
                value = float(rec["value"])
            else:
                continue
            if rnd > best_round:
                best_round, prior = rnd, value
                prior_name = os.path.splitext(os.path.basename(path))[0]
        except Exception:
            pass
    return prior, prior_name


def main_gan(emit: bool = True) -> dict:
    """512x512 conditional GAN iteration time (pipeline B).

    Wraps ``benchmarks/gan_step.py`` (bf16 path, reference 1G+2D iteration
    pattern, batch 32 — ``code/main.py:63,691-728``).  Returns the metric
    dict; with ``emit`` also prints it as a JSON line.
    """
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import numpy as np

    from benchmarks.gan_step import measure
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    B, R = 32, 512
    template = MeshTemplate(segments=32, rings=16)
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
        ),
        batch_size=B,
    )
    trainer = GANTrainer(cfg, template=template)
    out = measure(trainer, batch)
    value = out["iter_group_ms"]
    prior, prior_name = _prior_gan_ms()
    # lower is better for a time metric.  "vs_baseline" is round-over-round
    # (the reference publishes no numbers — BASELINE.md); "baseline" names
    # the record compared against.
    vs_baseline = prior / value if prior else 1.0
    rec = {
        "metric": "gan_512_cond_iter_time",
        "value": value,
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 4),
        "baseline": prior_name or "none",
    }
    flops = _analytic_flops("gan_1g2d_group_flops_bs32")
    if flops:
        rec["mfu_pct"] = round(flops / (value / 1e3) / PEAK_FLOPS * 100, 2)
    if emit:
        print(json.dumps(rec), flush=True)
    return rec


def _gan_in_subprocess() -> dict | None:
    """Run the GAN bench in a child interpreter and parse its JSON line.

    Keeps the parent's TPU client unopened until the child exits, so the
    chairs headline below is measured over a fresh tunnel connection.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py"), "--metric", "gan"],
            env=env, cwd=here, capture_output=True, text=True, timeout=1500,
        )
    except subprocess.TimeoutExpired:
        print("gan subprocess timed out; continuing with chairs only",
              file=sys.stderr, flush=True)
        return None
    # mirror the child's stderr (compile logs/warnings) for debuggability;
    # keep its stdout OFF our stdout so our final line stays last.
    sys.stderr.write(proc.stderr[-4000:])
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            rec = json.loads(line)
            if rec.get("metric") == "gan_512_cond_iter_time":
                return rec
        except json.JSONDecodeError:
            continue
    print(f"gan subprocess produced no metric (rc={proc.returncode})",
          file=sys.stderr, flush=True)
    return None


def main(gan_rec: dict | None = None) -> None:
    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = ShapeNetConfig.chairs()
    n_dev = len(jax.devices())
    batch = cfg.batch_size
    if batch % n_dev:
        batch = ((batch + n_dev - 1) // n_dev) * n_dev
        cfg = ShapeNetConfig(**{**cfg.__dict__, "batch_size": batch})

    mesh = make_mesh()
    learner = ShapeNetLearner(cfg, mesh=mesh)
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views, n_points=256, seed=0
    )

    # Warmup / compile.  Note: float() forces a device sync each step —
    # block_until_ready alone does not reliably synchronize on the axon
    # tunnel, so throughput is measured with an explicit scalar fetch.
    # Batches are staged on device once and cycled: in production the input
    # pipeline overlaps host->device transfer with the step (uint8 batches
    # are ~5 MB vs ~160 ms steps), but on the axon RPC tunnel the per-step
    # upload itself adds +-40% wall-clock noise that says nothing about the
    # training step being measured (docs/runs/README.md).
    batches = [data.next_batch() for _ in range(4)]
    for _ in range(3):
        losses = learner.train_step(batches[0])
    float(losses["total_loss"])
    pool = [learner.put_batch(b) for b in batches]

    n_steps = 10

    def measure() -> float:
        # dispatch all steps back-to-back, fetch once at the end: training
        # fetches metrics every eval interval, not per step, and a per-step
        # scalar fetch is a full RPC round-trip on the axon tunnel
        t0 = time.perf_counter()
        for i in range(n_steps):
            losses = learner.train_step(
                pool[i % len(pool)], already_on_device=True
            )
        float(losses["total_loss"])
        return time.perf_counter() - t0

    # best of 3 passes: the tunnel adds run-to-run noise
    dt = min(measure() for _ in range(3))
    imgs_per_sec = cfg.batch_size * n_steps / dt

    # End-of-schedule companion number: a fresh learner measures near
    # schedule start (dropout keep-prob p = 0.07), where the windowed splat
    # legitimately skips ~93% of points.  Forcing state.step to the end of
    # the 130k schedule measures the p = 1.0 regime.  Round-5 caveat: this
    # cost is CONTENT-dependent (out-of-bounds culling tracks how trained
    # the cloud is — docs/runs/README.md p=1.0 investigation), and by this
    # point the pool has absorbed the 90 headline steps, so this proxy
    # reads low; the honest trained-regime number is the completed 130k
    # run's final drains (27.1 ms/step = 886 imgs/s).  The proxy stays for
    # round-over-round comparability.
    import jax.numpy as jnp

    learner.state = learner.state.replace(
        step=jnp.asarray(cfg.total_steps, jnp.asarray(0).dtype)
    )
    dt_end = min(measure() for _ in range(3))
    imgs_per_sec_end = cfg.batch_size * n_steps / dt_end

    prior, prior_name = _prior_value("imgs/sec")

    vs_baseline = imgs_per_sec / prior if prior else 1.0
    rec = {
        "metric": "shapenet_chairs_train_throughput",
        "value": round(imgs_per_sec, 3),
        "unit": "imgs/sec",
        "vs_baseline": round(vs_baseline, 4),
        "baseline": prior_name or "none",
        # p=1.0 full-workload rate (see comment above): the headline value
        # is the schedule-start rate every prior round recorded; this key
        # is the other end of the range a full 130k-step run sweeps.
        "end_of_schedule_imgs_per_sec": round(imgs_per_sec_end, 3),
    }
    # MFU vs the v5e bf16 peak at the p=1.0 point, where the measured step
    # does the same work the analytic (dense-path) FLOPs count describes
    flops = _analytic_flops("chairs_train_step_flops")
    if flops:
        step_s = dt_end / n_steps
        rec["mfu_pct"] = round(flops / step_s / PEAK_FLOPS * 100, 2)
    if gan_rec is not None:
        # fold the GAN number into the SAME line: the driver keeps only the
        # last JSON line + a short tail, which XLA warnings can fill.
        rec["gan_512_cond_iter_ms"] = gan_rec["value"]
        rec["gan_vs_baseline"] = gan_rec["vs_baseline"]
        if "mfu_pct" in gan_rec:
            rec["gan_mfu_pct"] = gan_rec["mfu_pct"]
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric", choices=("all", "chairs", "gan"), default="all",
        help="all = GAN bench in a subprocess, then the chairs headline in "
        "this (clean) process, both folded into ONE final JSON line; "
        "chairs = ShapeNet train throughput only; gan = 512x512 "
        "conditional GAN iteration time only",
    )
    choice = ap.parse_args().metric
    if choice == "gan":
        main_gan()
    elif choice == "chairs":
        main()
    else:
        main(gan_rec=_gan_in_subprocess())
