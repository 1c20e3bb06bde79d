"""Training observability: JSONL metrics + optional TensorBoard.

The reference logs scalars/histograms/image grids to TensorBoard inline in
its train loops (``code/training_test_shape_net.py:94-100``,
``code/main.py:378-410``) plus a plain-text ``log.txt``.  We always write a
machine-readable ``metrics.jsonl`` (one dict per event) and mirror scalars to
TensorBoard when a writer backend is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


def tile_grid(images, ncol: int, fill: float = 0.0):
    """Tile (N, H, W[, C]) floats in [0, 1] into one (H', W', C) grid array.

    The single grid-layout implementation behind every image export
    (``MetricsLogger.log_images``, ``train/gan_eval.export_results``,
    ``cli/evaluation_test_shape_net``).  ``fill`` paints the remainder
    cells of a non-full last row.
    """
    import numpy as np

    arr = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    if arr.ndim == 3:
        arr = arr[..., None]
    n, h, w, c = arr.shape
    nrows = -(-n // ncol)
    grid = np.full((nrows * h, ncol * w, c), fill, np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
    return grid


class MetricsLogger:
    def __init__(self, workdir: str, name: str = "train",
                 tensorboard: bool = True):
        self.dir = os.path.abspath(workdir)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, f"metrics_{name}.jsonl"), "a", buffering=1)
        # plain-text log mirroring stdout, line-buffered, argv header
        # (reference main.py:643-653 / run_reconstruction.py:391-401)
        import sys

        self._txt = open(os.path.join(self.dir, "log.txt"), "a", buffering=1)
        print(" ".join(sys.argv), file=self._txt)
        self._tb = None
        if tensorboard:
            try:  # optional TensorBoard mirror
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(self.dir, "tb", name))
            except Exception:
                self._tb = None

    def log_text(self, text: str) -> None:
        """Mirror a line to log.txt and stdout (reference ``log()``)."""
        print(text, file=self._txt)
        print(text)

    def log(self, step: int, scalars: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_histogram(self, step: int, name: str, values) -> None:
        if self._tb is not None:
            import numpy as np

            self._tb.add_histogram(name, np.asarray(values), int(step))

    def log_images(self, step: int, name: str, images, nrow: int = 4) -> None:
        """Image grid: TensorBoard when available, PNG file always.

        ``images``: (N, H, W, C) floats in [0, 1] (C = 1 or 3).
        (Reference logs render/projection grids each eval —
        ``training_test_shape_net.py:173-179``, ``main.py:378-404``.)
        """
        import numpy as np

        arr = np.asarray(images, np.float32)
        if arr.ndim == 3:
            arr = arr[..., None]
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        grid = tile_grid(arr, nrow)
        from PIL import Image

        img_dir = os.path.join(self.dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        Image.fromarray((grid * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{name.replace('/', '_')}_{int(step):08d}.png")
        )
        if self._tb is not None:
            self._tb.add_image(name, grid.transpose(2, 0, 1), int(step))

    def close(self) -> None:
        self._fh.close()
        self._txt.close()
        if self._tb is not None:
            self._tb.close()
