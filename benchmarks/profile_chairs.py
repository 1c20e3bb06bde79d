"""Op-level device-time profile of the chairs train step at a forced
schedule position.

The step-time sweep (step_time_sweep.py) showed per-step device time is a
function of the traced p/sigma schedule position alone (19.7 ms at step 0
-> 29.4 ms at step ~10k/10k, any params).  This tool captures an xplane
trace of N steps at a forced ``state.step`` and prints the top ops, so the
growth can be attributed to specific kernels.

Usage: python benchmarks/profile_chairs.py [--forced_step 0]
           [--total_steps 10000] [--steps 6] [--top 20]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_gan import summarize_xplane  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--forced_step", type=int, default=0)
    ap.add_argument("--total_steps", type=int, default=10000)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--logdir", default=None)
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
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views, n_points=256, seed=0
    )
    batch = learner.put_batch(data.next_batch())
    losses = learner.train_step(batch, already_on_device=True)  # compile
    float(losses["total_loss"])

    learner.state = learner.state.replace(
        step=jnp.asarray(args.forced_step, jnp.asarray(0).dtype)
    )
    logdir = args.logdir or tempfile.mkdtemp(prefix="chairs_profile_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            losses = learner.train_step(batch, already_on_device=True)
        float(losses["total_loss"])  # fence

    s = summarize_xplane(logdir, args.top)
    print(json.dumps({
        "logdir": logdir, "steps": args.steps,
        "forced_step": args.forced_step, "total_steps": args.total_steps,
        "busy_ms_per_step": round(s["busy_ms"] / args.steps, 2),
        "async_copy_ms_per_step": round(s["async_ms"] / args.steps, 2),
    }))
    for name, ms, n in s["ops"]:
        print(f"{ms / args.steps:9.3f} ms/step  x{n:<4d} {name[:120]}")


if __name__ == "__main__":
    main()
