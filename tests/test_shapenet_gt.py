"""Ground-truth point-cloud sourcing + real-data Chamfer/IoU eval.

The reference has no Chamfer evaluator (``code/models/unsupervised_part.py``
evals projection-MSE only); BASELINE requires one, fed from points files or
meshes in the ShapeNet model dirs.
"""

import os

import numpy as np
import pytest

from im23d_tpu.data.shapenet import (
    load_gt_points,
    normalize_cloud,
    sample_mesh_points,
)

CUBE_OBJ = """\
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 2 3
f 1 3 4
f 5 7 6
f 5 8 7
f 1 5 6
f 1 6 2
f 2 6 7
f 2 7 3
f 3 7 8
f 3 8 4
f 4 8 5
f 4 5 1
"""


def test_sample_mesh_points_on_surface():
    rng = np.random.RandomState(0)
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]])
    pts = sample_mesh_points(verts, faces, 500, rng)
    assert pts.shape == (500, 3)
    assert np.allclose(pts[:, 2], 0)  # in the triangle's plane
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-6).all()  # inside the triangle


def test_sample_mesh_points_area_weighted():
    rng = np.random.RandomState(0)
    # two triangles, the second 100x the area of the first
    verts = np.asarray(
        [[0, 0, 0], [0.1, 0, 0], [0, 0.1, 0], [5, 0, 1], [6, 0, 1], [5, 1, 1]],
        np.float32,
    )
    faces = np.asarray([[0, 1, 2], [3, 4, 5]])
    pts = sample_mesh_points(verts, faces, 1000, rng)
    big = (pts[:, 2] > 0.5).mean()
    assert big > 0.95


def test_normalize_cloud_frame():
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 3) * 7 + 3
    out = normalize_cloud(pts)
    assert np.allclose(out.mean(axis=0), 0, atol=1e-5)
    assert np.isclose(np.linalg.norm(out, axis=-1).max(), 0.5, atol=1e-5)
    # batched input too
    outb = normalize_cloud(np.stack([pts, pts * 2]))
    assert np.allclose(outb[0], outb[1], atol=1e-5)


def test_load_gt_points_sources(tmp_path):
    rng = np.random.RandomState(0)

    d1 = tmp_path / "m1"
    d1.mkdir()
    np.save(d1 / "points.npy", rng.randn(100, 3).astype(np.float32))
    pts = load_gt_points(d1, 64, rng)
    assert pts.shape == (64, 3)

    d2 = tmp_path / "m2"
    (d2 / "models").mkdir(parents=True)
    (d2 / "models" / "model_normalized.obj").write_text(CUBE_OBJ)
    pts2 = load_gt_points(d2, 128, rng)
    assert pts2.shape == (128, 3)
    # cube surface: normalized points have max-norm coordinate at the faces
    assert np.isclose(np.abs(pts2).max(), 0.5 / np.sqrt(3), rtol=0.1)

    d3 = tmp_path / "m3"
    d3.mkdir()
    assert load_gt_points(d3, 64, rng) is None


@pytest.mark.slow
def test_evaluate_gt_clouds_end_to_end(tmp_path):
    from PIL import Image

    from im23d_tpu.cli.evaluation_test_shape_net import evaluate_gt_clouds
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = ShapeNetConfig(
        image_size=32, voxel_size=16, num_points=128, num_views=2,
        num_candidates=2, batch_size=2, total_steps=10,
    )
    learner = ShapeNetLearner(cfg)

    rng = np.random.RandomState(0)
    dirs = []
    for i in range(3):
        d = tmp_path / f"model_{i}"
        d.mkdir()
        img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(d / "render_0.png")
        if i < 2:  # third model has no GT source
            np.save(d / "points.npy", rng.randn(300, 3).astype(np.float32))
        dirs.append(str(d))

    chamfer, iou, n = evaluate_gt_clouds(learner, dirs, cfg, 256, cfg.batch_size)
    assert n == 2
    assert np.isfinite(chamfer) and chamfer > 0
    assert 0.0 <= iou <= 1.0
