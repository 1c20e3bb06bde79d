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


class MetricsLogger:
    def __init__(self, workdir: str, name: str = "train"):
        self.dir = os.path.abspath(workdir)
        os.makedirs(self.dir, exist_ok=True)
        self._fh = open(os.path.join(self.dir, f"metrics_{name}.jsonl"), "a", buffering=1)
        self._tb = None
        try:  # optional TensorBoard mirror
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=os.path.join(self.dir, "tb", name))
        except Exception:
            self._tb = None

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

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
