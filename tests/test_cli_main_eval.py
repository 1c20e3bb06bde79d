"""GAN CLI --evaluate --which_epoch best: sweep over numbered checkpoints.

Separate from test_cli_main.py so the two FID-heavy end-to-end tests can
run in different pytest invocations (each involves several trainer
constructions and inception passes on CPU).
"""

import os
import sys

import pytest

from im23d_tpu.cli.main import main

sys.path.insert(0, os.path.dirname(__file__))
from test_cli_main import BASE_ARGS, make_synthetic_cub_cache  # noqa: E402


@pytest.mark.slow
def test_which_epoch_best_sweep(tmp_path, monkeypatch):
    cache = make_synthetic_cub_cache(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    # epoch 1 -> rolling step_latest, epoch 2 -> numbered checkpoint
    rc = main(BASE_ARGS + [
        "--name", "b", "--cache_dir", cache, "--conditional_class",
        "--epochs", "2", "--save_freq", "1", "--checkpoint_freq", "2",
        "--evaluate_freq", "5",
    ])
    assert rc == 0
    ckpts = os.listdir(tmp_path / "gan_weights" / "b" / "checkpoints")
    assert "step_latest" in ckpts and len(ckpts) >= 2

    # the sweep must skip the rolling step_latest dir (regression:
    # int("latest") ValueError) and restore the best numbered epoch
    rc = main(BASE_ARGS + [
        "--name", "b", "--cache_dir", cache, "--conditional_class",
        "--evaluate", "--which_epoch", "best",
    ])
    assert rc == 0

    # --save_results --which_epoch best would export the unrestored init:
    # refused up front
    with pytest.raises(SystemExit):
        main(BASE_ARGS + [
            "--name", "b", "--cache_dir", cache, "--conditional_class",
            "--save_results", "--which_epoch", "best",
        ])
