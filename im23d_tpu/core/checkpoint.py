"""Checkpoint save/restore for training pytrees (orbax-backed).

Logical contents mirror the reference checkpoints: ShapeNet
``{model, opt, step}`` (``code/training_test_shape_net.py:168-171``), GAN
``{generator, generator_running_avg, discriminator, optimizers, epoch, ...}``
(``code/main.py:749-775``) — but stored as JAX pytrees via orbax, which gives
async-capable, multi-host-safe checkpointing for free.
"""

from __future__ import annotations

import os
import re
from typing import Any

import orbax.checkpoint as ocp


def _ckpt_dir(workdir: str, step: int) -> str:
    return os.path.join(os.path.abspath(workdir), "checkpoints", f"step_{step}")


def save_checkpoint(workdir: str, step: int, tree: Any) -> str:
    path = _ckpt_dir(workdir, step)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(workdir: str) -> int | None:
    root = os.path.join(os.path.abspath(workdir), "checkpoints")
    if not os.path.isdir(root):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(root)
        if (m := re.fullmatch(r"step_(\d+)", name))
    ]
    return max(steps) if steps else None


def resolve_step(workdir: str, step=None):
    """Step to restore: pass-through when given, else the NEWEST of the
    rolling ``step_latest`` tier and the numbered checkpoints (by mtime —
    either tier can be the most recent under the reference's two-frequency
    save scheme, ``main.py:770-775``).  None when nothing exists."""
    if step is not None:
        return step
    root = os.path.join(os.path.abspath(workdir), "checkpoints")
    candidates = []
    numbered = latest_step(workdir)
    if numbered is not None:
        candidates.append(numbered)
    if os.path.isdir(os.path.join(root, "step_latest")):
        candidates.append("latest")
    if not candidates:
        return None
    return max(
        candidates,
        key=lambda s: os.path.getmtime(os.path.join(root, f"step_{s}")),
    )


def restore_checkpoint(workdir: str, step: int, target: Any) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete tree)."""
    path = _ckpt_dir(workdir, step)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)
