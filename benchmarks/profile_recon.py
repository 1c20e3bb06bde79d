"""Op-level device-time profile of the recon (mesh-estimation) train step.

The round-2 breakdown (docs/runs/README.md recon_r2_raster) attributed
~50 ms to the rasterizer pair and ~35 ms to the texture sampler, leaving
~125 ms of "everything else (bf16 net, splat-free losses, optimizer)"
undecomposed.  This captures an xplane trace of N steps at the same
production shape (bs 50, image 256², texture 256², deltas+z0, bf16) and
prints the top ops (VERDICT r4 item 7).

Usage: python benchmarks/profile_recon.py [--steps 6] [--top 30]
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
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--image_resolution", type=int, default=256)
    ap.add_argument("--texture_resolution", type=int, default=256)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    B = args.batch_size
    cfg = ReconConfig(
        batch_size=B,
        image_resolution=args.image_resolution,
        texture_resolution=args.texture_resolution,
        mesh_resolution=32,
        optimize_deltas=True,
        optimize_z0=True,
        compute_dtype="bfloat16",
    )
    trainer = ReconTrainer(cfg, dataset_size=B,
                           template=MeshTemplate(segments=32, rings=16))
    rng = np.random.default_rng(0)
    quat = rng.standard_normal((B, 4))
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    batch = dict(
        image=jnp.asarray(
            rng.random((B, args.image_resolution, args.image_resolution, 4)),
            jnp.float32,
        ),
        scale=jnp.full((B,), 0.7),
        translation=jnp.zeros((B, 3)),
        rotation=jnp.asarray(quat, jnp.float32),
        idx=jnp.arange(B),
    )
    losses = trainer.train_step(batch)  # compile
    float(losses["recon_loss"])

    logdir = args.logdir or tempfile.mkdtemp(prefix="recon_profile_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            losses = trainer.train_step(batch)
        float(losses["recon_loss"])  # fence

    s = summarize_xplane(logdir, args.top)
    print(json.dumps({
        "logdir": logdir, "steps": args.steps,
        "busy_ms_per_step": round(s["busy_ms"] / args.steps, 2),
        "async_copy_ms_per_step": round(s["async_ms"] / args.steps, 2),
    }))
    for name, ms, n in s["ops"]:
        print(f"{ms / args.steps:9.3f} ms/step  x{n:<4d} {name[:120]}")


if __name__ == "__main__":
    main()
