from im23d_tpu.losses.effective import (
    project_candidates,
    unsupervised_loss,
    supervised_loss,
)

__all__ = ["project_candidates", "unsupervised_loss", "supervised_loss"]
