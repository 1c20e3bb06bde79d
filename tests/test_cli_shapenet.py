"""End-to-end ShapeNet CLI tests: train then evaluate on synthetic data
with a tiny config (the override flags keep both sides shape-consistent)."""

import os

import pytest

from im23d_tpu.cli.evaluation_test_shape_net import main as eval_main
from im23d_tpu.cli.training_test_shape_net import main as train_main

TINY = [
    "--category", "planes", "--synthetic",
    "--batch_size", "2", "--image_size", "32", "--voxel_size", "16",
    "--num_points", "128", "--num_views", "2", "--num_candidates", "2",
]


@pytest.mark.slow
def test_shapenet_cli_train_then_eval(tmp_path):
    workdir = str(tmp_path / "run")
    rc = train_main(TINY + ["--steps", "4", "--workdir", workdir])
    assert rc == 0
    assert os.listdir(os.path.join(workdir, "checkpoints"))

    out_dir = str(tmp_path / "eval")
    rc = eval_main(TINY + ["--workdir", workdir, "--num_batches", "2",
                           "--out_dir", out_dir])
    assert rc == 0
    produced = os.listdir(out_dir)
    assert "student_projections.png" in produced
    assert "candidate_projections.png" in produced
    assert "gt_masks.png" in produced


@pytest.mark.slow
def test_shapenet_cli_tensor_parallel(tmp_path):
    """--tp 2 on the 8-device virtual mesh: wide Dense kernels shard over
    the 'model' axis, batch over the 4-wide 'data' axis."""
    workdir = str(tmp_path / "run_tp")
    rc = train_main(TINY + ["--steps", "3", "--workdir", workdir, "--tp", "2",
                            "--batch_size", "4"])
    assert rc == 0
    assert os.listdir(os.path.join(workdir, "checkpoints"))


@pytest.mark.slow
def test_shapenet_cli_eval_only_restore(tmp_path):
    workdir = str(tmp_path / "run")
    rc = train_main(TINY + ["--steps", "2", "--workdir", workdir])
    assert rc == 0
    # train CLI --eval_only restores and evaluates without training
    rc = train_main(TINY + ["--steps", "2", "--workdir", workdir,
                            "--restore", workdir, "--eval_only"])
    assert rc == 0
