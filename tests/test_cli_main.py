"""End-to-end GAN CLI test on a synthetic pseudo-gt cache.

Covers the full reference driver loop (``code/main.py``): training with
in-loop FID + sample grids every ``--evaluate_freq`` epochs, two-tier
checkpointing, loss-curve persistence, and the conditional
``--save_results`` export path.
"""

import json
import os

import numpy as np
import pytest

from im23d_tpu.cli.main import main

N_IMAGES = 4
TEX_RES = 128  # the generator's smallest output resolution


def make_synthetic_cub_cache(root, n=N_IMAGES, res=TEX_RES, captions=False):
    """Reference-format cache tree under <root>: cache/cub/{poses_metadata,
    pseudogt_<res>x<res>/, precomputed_fid_299x299_train.npz} plus the CUB
    annotation files CubGANDataset reads for class labels."""
    rng = np.random.RandomState(0)
    cache = os.path.join(root, "cache", "cub")
    pg = os.path.join(cache, f"pseudogt_{res}x{res}")
    os.makedirs(pg, exist_ok=True)

    paths = [f"001.Some_Bird/img_{i}.jpg" for i in range(n)]
    rot = rng.randn(n, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    meta = dict(
        path=paths,
        scale=np.full((n, 1), 0.7, np.float32),
        translation=np.zeros((n, 3), np.float32),
        rotation=rot,
    )
    np.savez(os.path.join(cache, "poses_metadata.npz"), data=meta)

    for i in range(n):
        data = dict(
            image=rng.rand(4, res, res).astype(np.float16) * 2 - 1,
            texture=rng.rand(3, res, res).astype(np.float16) * 2 - 1,
            texture_alpha=(rng.rand(1, res, res) > 0.3).astype(np.float16),
            mesh=(rng.randn(3, 32, 32) * 0.01).astype(np.float16),
        )
        np.savez(os.path.join(pg, f"{i}.npz"), data=data)

    # fake-but-valid FID real stats (random inception weights in CI anyway);
    # the testval stats have fewer images to exercise the val subsampling
    s = np.tril(rng.rand(288, 288).astype(np.float32) * 1e-3)
    np.savez(
        os.path.join(cache, "precomputed_fid_299x299_train.npz"),
        stats_m=rng.rand(288).astype(np.float32),
        stats_s=s, num_images=n, resolution=299,
    )
    np.savez(
        os.path.join(cache, "precomputed_fid_299x299_testval.npz"),
        stats_m=rng.rand(288).astype(np.float32),
        stats_s=s, num_images=max(n - 2, 1), resolution=299,
    )

    cub = os.path.join(root, "datasets", "cub", "CUB_200_2011")
    os.makedirs(cub, exist_ok=True)
    with open(os.path.join(cub, "images.txt"), "w") as fh:
        fh.writelines(f"{i + 1} {p}\n" for i, p in enumerate(paths))
    with open(os.path.join(cub, "image_class_labels.txt"), "w") as fh:
        fh.writelines(f"{i + 1} {i % 3 + 1}\n" for i in range(n))

    if captions:
        np.savez(
            os.path.join(cache, "captions_tokens.npz"),
            tokens=rng.randint(1, 30, size=(n, 2, 18)).astype(np.int32),
            n_words=30,
            vocab=np.asarray(["<pad>"] + [f"word{i}" for i in range(1, 30)]),
        )
    return cache


BASE_ARGS = [
    "--dataset", "cub",
    "--texture_resolution", str(TEX_RES),
    "--batch_size", str(N_IMAGES),
    "--num_discriminators", "2",
    "--compute_dtype", "float32",
]


@pytest.mark.slow
def test_gan_cli_train_eval_export(tmp_path, monkeypatch):
    cache = make_synthetic_cub_cache(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    rc = main(BASE_ARGS + [
        "--name", "t", "--cache_dir", cache, "--conditional_class",
        "--epochs", "2", "--evaluate_freq", "2", "--save_freq", "1",
        "--checkpoint_freq", "2",
    ])
    assert rc == 0

    workdir = tmp_path / "gan_weights" / "t"
    # loss scalars and in-training fid series in the metrics log
    records = [
        json.loads(line)
        for line in (workdir / "metrics_gan.jsonl").read_text().splitlines()
    ]
    keys = set().union(*(r.keys() for r in records))
    assert "g_loss" in keys and "d_fake" in keys
    # no --inception_weights in this run -> the random-init extractor is
    # used and the metric name must say the numbers are uncalibrated
    assert {"fid_uncalibrated/combined", "fid_uncalibrated/texture_only",
            "fid_uncalibrated/mesh_only",
            "fid_uncalibrated/combined_val"} <= keys

    # sample grids were rendered
    images = os.listdir(workdir / "images")
    assert any(f.startswith("samples_render") for f in images)
    assert any(f.startswith("samples_texture") for f in images)
    # real + cross-variant comparison grids (reference main.py:378-404)
    assert any(f.startswith("samples_real_image") for f in images)
    assert any(f.startswith("samples_render_fake_texture") for f in images)
    assert any(f.startswith("samples_render_fake_mesh") for f in images)
    assert any(f.startswith("samples_mesh_map") for f in images)

    # two-tier checkpoints: rolling 'latest' (epoch 1) + numbered (epoch 2)
    ckpts = os.listdir(workdir / "checkpoints")
    assert "step_latest" in ckpts
    assert any(c.startswith("step_") and c != "step_latest" for c in ckpts)

    # loss curves persisted beside the checkpoint
    curves = np.load(
        workdir / "checkpoints"
        / f"curves_{max(int(c[5:]) for c in ckpts if c[5:].isdigit())}.npz"
    )
    assert len(curves["g_loss"]) > 0

    # conditional --save_results: obj/mtl/png per sample + a render grid
    rc = main(BASE_ARGS + [
        "--name", "t", "--cache_dir", cache, "--conditional_class",
        "--save_results",
    ])
    assert rc == 0
    out = tmp_path / "results" / "t"
    objs = [f for f in os.listdir(out) if f.endswith(".obj")]
    assert len(objs) == N_IMAGES
    assert (tmp_path / "results" / "t.png").exists()


@pytest.mark.slow
def test_gan_cli_interrupt_saves_checkpoint(tmp_path, monkeypatch):
    cache = make_synthetic_cub_cache(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    from im23d_tpu.train import gan_trainer as gt

    real_step = gt.GANTrainer.train_step
    calls = {"n": 0}

    def interrupting_step(self, batch):
        if calls["n"] >= 1:
            raise KeyboardInterrupt
        calls["n"] += 1
        return real_step(self, batch)

    monkeypatch.setattr(gt.GANTrainer, "train_step", interrupting_step)
    rc = main(BASE_ARGS + [
        "--name", "ti", "--cache_dir", cache, "--epochs", "5",
    ])
    assert rc == 130
    # interrupt left a restorable rolling checkpoint
    assert (tmp_path / "gan_weights" / "ti" / "checkpoints" / "step_latest").is_dir()


def make_synthetic_p3d_cache(root, n_imagenet=4, n_pascal=2, res=TEX_RES):
    """Reference-format P3D cache: poses_metadata over imagenet+pascal paths
    (the dataset must filter to car_imagenet), pseudo-gt for every image,
    FID stats, and the shape/color labels csv."""
    rng = np.random.RandomState(1)
    cache = os.path.join(root, "cache", "p3d")
    pg = os.path.join(cache, f"pseudogt_{res}x{res}")
    os.makedirs(pg, exist_ok=True)

    n = n_imagenet + n_pascal
    paths = [f"car_imagenet/img_{i}.jpg" for i in range(n_imagenet)]
    paths += [f"car_pascal/img_{i}.jpg" for i in range(n_pascal)]
    rot = rng.randn(n, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    np.savez(
        os.path.join(cache, "poses_metadata.npz"),
        data=dict(
            path=paths,
            scale=np.full((n, 1), 0.7, np.float32),
            translation=np.zeros((n, 3), np.float32),
            rotation=rot,
        ),
    )
    for i in range(n):
        np.savez(os.path.join(pg, f"{i}.npz"), data=dict(
            image=rng.rand(4, res, res).astype(np.float16) * 2 - 1,
            texture=rng.rand(3, res, res).astype(np.float16) * 2 - 1,
            texture_alpha=(rng.rand(1, res, res) > 0.3).astype(np.float16),
            mesh=(rng.randn(3, 32, 32) * 0.01).astype(np.float16),
        ))
    s = np.tril(rng.rand(288, 288).astype(np.float32) * 1e-3)
    np.savez(
        os.path.join(cache, "precomputed_fid_299x299_train.npz"),
        stats_m=rng.rand(288).astype(np.float32),
        stats_s=s, num_images=n, resolution=299,
    )

    labels_dir = os.path.join(root, "datasets", "p3d")
    os.makedirs(labels_dir, exist_ok=True)
    shapes = ["sedan", "suv", "sport"]
    colors = ["red", "blue", "white", "black"]
    with open(os.path.join(labels_dir, "p3d_labels.csv"), "w") as fh:
        fh.write("filename,color1,color2,shape,notes\n")
        for i in range(n_imagenet):
            fh.write(f"img_{i}.jpg,{colors[i % 4]},{colors[(i + 1) % 4]},"
                     f"{shapes[i % 3]},x\n")
    return cache


@pytest.mark.slow
def test_gan_cli_p3d_color_conditional(tmp_path, monkeypatch):
    """P3D path end-to-end: car_imagenet filtering, labels csv, shape+color
    conditioning through training and conditional --save_results."""
    cache = make_synthetic_p3d_cache(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    args = [
        "--dataset", "p3d", "--conditional_class", "--conditional_color",
        "--texture_resolution", str(TEX_RES), "--batch_size", "4",
        "--num_discriminators", "2", "--compute_dtype", "float32",
        "--name", "p3d_t", "--cache_dir", cache,
    ]
    rc = main(args + ["--epochs", "1", "--save_freq", "1",
                      "--checkpoint_freq", "1", "--evaluate_freq", "5"])
    assert rc == 0
    workdir = tmp_path / "gan_weights" / "p3d_t"
    assert "g_loss" in (workdir / "metrics_gan.jsonl").read_text()

    rc = main(args + ["--save_results"])
    assert rc == 0
    out = tmp_path / "results" / "p3d_t"
    assert len([f for f in os.listdir(out) if f.endswith(".obj")]) == 4


@pytest.mark.slow
def test_gan_cli_text_conditional(tmp_path, monkeypatch):
    """--conditional_text end-to-end through the CLI: caption cache with a
    vocab, in-training eval decodes the grid samples' captions to text."""
    cache = make_synthetic_cub_cache(str(tmp_path), captions=True)
    monkeypatch.chdir(tmp_path)

    rc = main(BASE_ARGS + [
        "--name", "txt", "--cache_dir", cache, "--conditional_text",
        "--epochs", "1", "--evaluate_freq", "1", "--save_freq", "1",
    ])
    assert rc == 0
    workdir = tmp_path / "gan_weights" / "txt"
    log = (workdir / "log.txt").read_text()
    assert "sample captions:" in log and "word" in log
    assert any(
        f.startswith("samples_render")
        for f in os.listdir(workdir / "images")
    )


@pytest.mark.slow
def test_gan_cli_device_cache_matches_host_path(tmp_path, monkeypatch):
    """--device_cache trains through the same CLI loop as the host iterator
    (same epoch/augment semantics — exact batch parity is pinned in
    tests/test_fabricate.py); metrics stream and checkpoints land as usual."""
    cache = make_synthetic_cub_cache(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    rc = main(BASE_ARGS + [
        "--name", "dc", "--cache_dir", cache, "--conditional_class",
        "--device_cache",
        "--epochs", "2", "--evaluate_freq", "100", "--save_freq", "2",
        "--checkpoint_freq", "100",
    ])
    assert rc == 0
    workdir = tmp_path / "gan_weights" / "dc"
    records = [
        json.loads(line)
        for line in (workdir / "metrics_gan.jsonl").read_text().splitlines()
    ]
    keys = set().union(*(r.keys() for r in records))
    assert "g_loss" in keys and "d_fake" in keys
    log = (workdir / "log.txt").read_text()
    assert "device_cache: staged" in log
