from im23d_tpu.metrics.chamfer import chamfer_distance, nn_dist2
from im23d_tpu.metrics.iou import mean_iou, iou_3d
from im23d_tpu.metrics.fid import calculate_stats, frechet_distance

__all__ = [
    "chamfer_distance",
    "nn_dist2",
    "mean_iou",
    "iou_3d",
    "calculate_stats",
    "frechet_distance",
]
