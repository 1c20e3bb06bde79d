import json
import os

import numpy as np

from im23d_tpu.core.metrics_logger import MetricsLogger


def test_metrics_logger_jsonl_and_logtxt(tmp_path):
    logger = MetricsLogger(str(tmp_path), "test")
    logger.log(1, {"loss": 2.5})
    logger.log(2, {"loss": 1.25, "aux": 0.5})
    logger.log_text("hello world")
    logger.close()

    lines = open(tmp_path / "metrics_test.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 1.25

    txt = open(tmp_path / "log.txt").read()
    assert "hello world" in txt
    # argv header present (first line)
    assert len(txt.splitlines()) >= 2


def test_metrics_logger_image_grid(tmp_path):
    logger = MetricsLogger(str(tmp_path), "test")
    imgs = np.random.RandomState(0).rand(6, 16, 16)  # grayscale
    logger.log_images(7, "renders", imgs, nrow=3)
    logger.close()
    files = os.listdir(tmp_path / "images")
    assert files == ["renders_00000007.png"]
    from PIL import Image

    grid = np.asarray(Image.open(tmp_path / "images" / files[0]))
    assert grid.shape == (32, 48, 3)  # 2 rows x 3 cols of 16x16
