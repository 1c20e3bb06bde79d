from im23d_tpu.core.checkpoint import save_checkpoint, restore_checkpoint, latest_step
from im23d_tpu.core.metrics_logger import MetricsLogger

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step", "MetricsLogger"]
