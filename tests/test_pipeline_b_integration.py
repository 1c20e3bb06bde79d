"""Pipeline B producer->consumer integration: the pseudo-gt cache written by
``ReconTrainer.generate_pseudogt`` (reference format,
``run_reconstruction.py:499-658``) is consumed directly by the GAN training
CLI (``main.py`` cache readers, ``abstract_dataset.py:29-81``) — the cache
contract holds end-to-end, including the precomputed FID stats the
in-training evaluator loads.
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_generated_pseudogt_cache_trains_gan(tmp_path, monkeypatch):
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    n, tex_res = 4, 128  # 128 = the generator's smallest texture resolution
    trainer = ReconTrainer(
        ReconConfig(image_resolution=64, texture_resolution=64, batch_size=2),
        dataset_size=n,
        template=MeshTemplate(segments=8, rings=4),
        mesh=make_mesh(jax.devices()[:1]),
    )

    rng = np.random.RandomState(0)
    paths = [f"001.Some_Bird/img_{i}.jpg" for i in range(n)]

    def batches(with_idx=True):
        for start in range(0, n, 2):
            rot = rng.randn(2, 4).astype(np.float32)
            rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
            batch = dict(
                image=rng.rand(2, 64, 64, 4).astype(np.float32),
                hd_image=rng.rand(2, 256, 256, 3).astype(np.float32),
                inception_image=(
                    rng.rand(2, 299, 299, 3).astype(np.float32) * 2 - 1
                ),
                scale=np.full((2,), 0.7, np.float32),
                translation=np.zeros((2, 3), np.float32),
                rotation=rot,
                idx=np.arange(start, start + 2, dtype=np.int32),
            )
            yield batch

    cache = str(tmp_path / "cache" / "cub")
    os.makedirs(cache, exist_ok=True)
    trainer.generate_pseudogt(
        batches(), cache, "cub",
        pseudogt_resolution=tex_res, inception_resolution=299,
        paths=paths, val_loader=batches(),
        renderer_resolution=256,  # keep the CPU rasterizer cheap in CI
    )

    # both stats tiers came out of the generator (train + CUB testval)
    assert os.path.exists(
        os.path.join(cache, "precomputed_fid_299x299_train.npz")
    )
    assert os.path.exists(
        os.path.join(cache, "precomputed_fid_299x299_testval.npz")
    )

    # CUB annotation files the GAN dataset reads for class labels
    cub = tmp_path / "datasets" / "cub" / "CUB_200_2011"
    os.makedirs(cub, exist_ok=True)
    with open(cub / "images.txt", "w") as fh:
        fh.writelines(f"{i + 1} {p}\n" for i, p in enumerate(paths))
    with open(cub / "image_class_labels.txt", "w") as fh:
        fh.writelines(f"{i + 1} {i % 3 + 1}\n" for i in range(n))

    monkeypatch.chdir(tmp_path)
    from im23d_tpu.cli.main import main

    rc = main([
        "--dataset", "cub", "--name", "pipeb", "--cache_dir", cache,
        "--texture_resolution", str(tex_res), "--batch_size", str(n),
        "--num_discriminators", "2", "--compute_dtype", "float32",
        "--conditional_class",
        # 3 epochs x 1 batch = one full 1G+2D group, so both g_ and d_
        # loss curves appear in the metrics stream
        "--epochs", "3", "--evaluate_freq", "3", "--save_freq", "3",
    ])
    assert rc == 0

    records = [
        json.loads(line)
        for line in (tmp_path / "gan_weights" / "pipeb" / "metrics_gan.jsonl")
        .read_text().splitlines()
    ]
    keys = set().union(*(r.keys() for r in records))
    # training ran on the generated cache, and the in-training FID pass
    # loaded the stats the recon trainer wrote (train + val tiers)
    assert "g_loss" in keys and "d_fake" in keys
    # no real inception weights in CI -> the FID labels itself uncalibrated
    assert "fid_uncalibrated/combined" in keys
    assert "fid_uncalibrated/combined_val" in keys
