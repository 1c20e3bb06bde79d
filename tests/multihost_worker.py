"""Worker for the multi-process SPMD test (see test_multihost.py).

Each process contributes 2 virtual CPU devices to a 4-device global mesh
via jax.distributed, then runs one ShapeNet training step on its LOCAL
half of the global batch.  Prints the resulting loss so the parent can
assert cross-process agreement.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id> [shapenet|gan]
"""

import os
import sys


def main() -> int:
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    model = sys.argv[4] if len(sys.argv) > 4 else "shapenet"
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

    if model == "gan":
        return main_gan(mesh, num_processes, process_id)

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


def main_gan(mesh, num_processes: int, process_id: int) -> int:
    """One G step + one D step of the texture/mesh GAN over the global
    mesh: BatchNorm batch statistics become global across processes
    (the SPMD replacement for the reference's sync_batchnorm)."""
    import numpy as np

    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    global_batch = 4
    trainer = GANTrainer(
        GANTrainConfig(
            model=GANConfig(texture_resolution=128, mesh_resolution=32),
            batch_size=global_batch,
        ),
        template=MeshTemplate(segments=8, rings=4),
        mesh=mesh,
    )
    rng = np.random.RandomState(0)  # identical global data on all processes
    per = global_batch // num_processes
    sl = slice(process_id * per, (process_id + 1) * per)
    batch = dict(
        texture=(rng.rand(global_batch, 128, 128, 3).astype(np.float32) * 2 - 1)[sl],
        alpha=(rng.rand(global_batch, 128, 128, 1) > 0.4).astype(np.float32)[sl],
        mesh=(rng.randn(global_batch, 32, 32, 3).astype(np.float32) * 0.02)[sl],
    )
    g_losses = trainer.train_step(batch)  # it 0 -> G step
    d_losses = trainer.train_step(batch)  # it 1 -> D step
    print(f"MULTIHOST_LOSS {float(g_losses['g_loss']):.6f} "
          f"{float(d_losses['d_fake']):.6f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
