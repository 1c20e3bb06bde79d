"""Reconstruction-network train-step benchmark (BASELINE config #4 shape).

Times the jitted ReconTrainer step at the reference CUB configuration
(``code/run_reconstruction.py --batch_size 50``: image 256, texture 256,
per-image pose deltas + z0 refinement) on the available devices, with the
batch staged on device (the axon RPC tunnel adds hundreds of ms per-step
upload that says nothing about the step itself).

Usage: python benchmarks/recon_step.py [--batch_size 50] [--texture 256]
Prints one JSON line with the min/median wall step time.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--texture", type=int, default=256)
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    import jax

    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    B = args.batch_size
    trainer = ReconTrainer(
        ReconConfig(
            batch_size=B,
            image_resolution=256,
            texture_resolution=args.texture,
            optimize_deltas=True,
            optimize_z0=True,
            compute_dtype=args.compute_dtype,
        ),
        dataset_size=B,
        template=MeshTemplate(segments=32, rings=16),
    )

    rng = np.random.default_rng(0)
    batch = dict(
        image=rng.random((B, 256, 256, 4), dtype=np.float64).astype(np.float32),
        scale=np.full((B,), 0.7, np.float32),
        translation=np.zeros((B, 3), np.float32),
        rotation=np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (B, 1)),
        idx=np.arange(B, dtype=np.int32),
    )
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    def sync(losses):
        # explicit scalar fetch: block_until_ready does not reliably
        # synchronize through the axon tunnel.  One fetch fences the whole
        # step (all outputs of the executable complete together); fetching
        # every loss would add one tunnel RPC round-trip (~25 ms) each.
        float(losses["recon_loss"])

    for _ in range(3):
        losses = trainer.train_step(batch)
    sync(losses)

    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        sync(trainer.train_step(batch))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({
        "metric": "recon_train_step_time",
        "value": round(ts[0] * 1e3, 2),
        "unit": "ms",
        "median_ms": round(ts[len(ts) // 2] * 1e3, 2),
        "imgs_per_sec": round(B / ts[0], 1),
    }))


if __name__ == "__main__":
    main()
