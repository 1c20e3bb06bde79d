"""End-to-end recon CLI test on a fake on-disk CUB annotation tree.

Covers the full reference driver loop (``code/run_reconstruction.py``):
training with periodic eval / image grids / two-tier checkpoints, the
final-save + async-wait exit path, and ``--evaluate`` restore.
"""

import os

import numpy as np
import pytest

from im23d_tpu.cli.run_reconstruction import main

N_IMAGES = 4


def make_fake_cub_tree(root, n=N_IMAGES, img_hw=(60, 80)):
    """CMR-format CUB tree under <root>/datasets: images + train/testval
    .mat annotations shaped like the reference's cub_cleaned/sfm files."""
    import scipy.io as sio
    from PIL import Image

    rng = np.random.RandomState(0)
    cub = os.path.join(root, "datasets", "cub")
    img_dir = os.path.join(cub, "CUB_200_2011", "images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(cub, "data"), exist_ok=True)
    os.makedirs(os.path.join(cub, "sfm"), exist_ok=True)

    images = np.zeros(
        (n,), dtype=[("rel_path", "O"), ("mask", "O"), ("bbox", "O"),
                     ("parts", "O")]
    )
    sfm = np.zeros((n,), dtype=[("scale", "O"), ("trans", "O"), ("rot", "O")])
    for i in range(n):
        rel = f"img_{i}.png"
        arr = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, rel))
        mask = np.zeros(img_hw, np.uint8)
        mask[10:40, 20:60] = 1
        images[i] = (
            rel, mask,
            {"x1": 21.0, "y1": 11.0, "x2": 60.0, "y2": 40.0},
            np.zeros((3, 15)),
        )
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        rot = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        sfm[i] = (np.float64(1.5), rng.rand(2) * 20, rot)

    for split in ("train", "testval"):
        sio.savemat(os.path.join(cub, "data", f"{split}_cub_cleaned.mat"),
                    {"images": images})
        sio.savemat(os.path.join(cub, "sfm", f"anno_{split}.mat"),
                    {"sfm_anno": sfm})
    return os.path.join(root, "datasets")


BASE_ARGS = [
    "--name", "r", "--dataset", "cub",
    "--batch_size", "2",
    "--image_resolution", "64",
    "--texture_resolution", "64",
    "--compute_dtype", "float32",
    "--num_workers", "2",
]


@pytest.mark.slow
def test_recon_cli_train_then_evaluate(tmp_path, monkeypatch):
    datasets_root = make_fake_cub_tree(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    rc = main(BASE_ARGS + [
        "--datasets_root", datasets_root,
        "--epochs", "1", "--checkpoint_freq", "1", "--evaluate_freq", "1",
        "--image_freq", "1",
    ])
    assert rc == 0

    workdir = tmp_path / "checkpoints_recon" / "r"
    # loss scalars + the val series in the metrics log
    text = (workdir / "metrics_recon.jsonl").read_text()
    assert "recon_loss" in text and "val/iou" in text
    # multi-view grid rendered for the fixed viz batch
    images = os.listdir(workdir / "images")
    assert any(f.startswith("render_multiview") for f in images)
    # the final checkpoint was written and is restorable by --evaluate
    assert os.listdir(workdir / "checkpoints")

    rc = main(BASE_ARGS + ["--datasets_root", datasets_root, "--evaluate"])
    assert rc == 0
