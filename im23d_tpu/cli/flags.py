"""Shared CLI flag helpers.

The reference uses ``argparse type=bool`` for several flags
(``code/main.py:40,59`` etc.), which silently parses ``--flag False`` as
True (``bool('False')`` is truthy).  "Implement the intent": these flags
accept explicit true/false words and reject anything else.
"""

from __future__ import annotations

import argparse

_TRUE = {"1", "true", "t", "yes", "y", "on"}
_FALSE = {"0", "false", "f", "no", "n", "off"}


def str2bool(value) -> bool:
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in _TRUE:
        return True
    if v in _FALSE:
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


_SHAPENET_OVERRIDES = (
    "image_size", "voxel_size", "num_points", "num_views", "num_candidates",
)


def add_shapenet_overrides(p: argparse.ArgumentParser) -> None:
    """Optional per-category config overrides shared by the ShapeNet train
    and eval CLIs (both sides must agree for checkpoints to restore)."""
    for flag in _SHAPENET_OVERRIDES:
        p.add_argument(f"--{flag}", type=int, default=None,
                       help="override the per-category config value")


def apply_shapenet_overrides(cfg, args):
    """Return cfg with any non-None override flags applied."""
    overrides = {
        k: getattr(args, k) for k in _SHAPENET_OVERRIDES
        if getattr(args, k, None) is not None
    }
    if overrides:
        cfg = type(cfg)(**{**cfg.__dict__, **overrides})
    return cfg
