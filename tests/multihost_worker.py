"""Worker for the multi-process SPMD test (see test_multihost.py).

Each process contributes 2 virtual CPU devices to a 4-device global mesh
via jax.distributed, then runs one ShapeNet training step on its LOCAL
half of the global batch.  Prints the resulting loss so the parent can
assert cross-process agreement.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys


def main() -> int:
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from im23d_tpu.parallel.mesh import init_multihost

    mesh = init_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 2 * num_processes, len(jax.devices())
    assert mesh.devices.size == 2 * num_processes

    import numpy as np

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    global_batch = 4
    cfg = ShapeNetConfig(
        image_size=32, voxel_size=16, num_points=64, num_views=2,
        num_candidates=2, batch_size=global_batch, total_steps=2,
    )
    learner = ShapeNetLearner(cfg, mesh=mesh)
    # identical global data on every process; each passes its LOCAL shard.
    # Host-side generation must stay on a process-local device — the
    # multi-process default device is global device 0, which other
    # processes cannot fetch from.
    with jax.default_device(jax.local_devices()[0]):
        data = SyntheticSilhouettes(global_batch, cfg.image_size,
                                    cfg.num_views, n_points=32, seed=0)
        batch = data.next_batch()

    def shard(v):
        # leaves have different leading dims (images: B; pose_input/masks:
        # B*V, model-major) — each process takes its contiguous fraction
        v = np.asarray(v)
        per = v.shape[0] // num_processes
        return v[process_id * per:(process_id + 1) * per]

    local = {k: shard(v) for k, v in batch.items()}
    losses = learner.train_step(local)
    print(f"MULTIHOST_LOSS {float(losses['total_loss']):.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
