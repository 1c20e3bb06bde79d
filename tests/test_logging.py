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


def test_step_profiler_captures_window(tmp_path):
    """--profile_dir plumbing: a trace of steps [start, start+steps) is
    written and close() is idempotent."""
    import jax
    import jax.numpy as jnp

    from im23d_tpu.core.jax_setup import StepProfiler

    prof = StepProfiler(str(tmp_path), start=2, steps=2)
    f = jax.jit(lambda x: x * 2.0)
    for wrapped in prof.wrap(range(6)):
        f(jnp.float32(wrapped)).block_until_ready()
    prof.close()  # window already closed: must be a no-op
    # a profile directory with at least one trace file appeared
    found = [
        os.path.join(r, f_) for r, _, fs in os.walk(tmp_path) for f_ in fs
    ]
    assert found, "profiler trace wrote no files"


def test_step_profiler_close_mid_window(tmp_path):
    from im23d_tpu.core.jax_setup import StepProfiler

    prof = StepProfiler(str(tmp_path), start=0, steps=100)
    prof.tick()  # starts the trace
    prof.close()  # interrupt path: must stop it cleanly
    prof.close()
