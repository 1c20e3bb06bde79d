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


_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(workdir: str, step: int, tree: Any,
                    block: bool = True) -> str:
    """Save a pytree checkpoint.

    ``block=False`` uses orbax's AsyncCheckpointer: the device->host copy
    happens before return, the disk write proceeds in a background thread
    while training continues (one outstanding save at a time).  Call
    ``wait_for_async_saves()`` before process exit or restoring from the
    same directory.
    """
    path = _ckpt_dir(workdir, step)
    if block:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
    else:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # serialize outstanding saves
        ckptr.save(path, args=ocp.args.StandardSave(tree), force=True)
    return path


def wait_for_async_saves() -> None:
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def numbered_steps(workdir: str) -> list[int]:
    """Sorted permanent (numbered) checkpoint steps; excludes the rolling
    ``step_latest`` tier."""
    root = os.path.join(os.path.abspath(workdir), "checkpoints")
    if not os.path.isdir(root):
        return []
    return sorted(
        int(m.group(1))
        for name in os.listdir(root)
        if (m := re.fullmatch(r"step_(\d+)", name))
    )


def latest_step(workdir: str) -> int | None:
    steps = numbered_steps(workdir)
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
    wait_for_async_saves()  # never read a directory an async save is writing
    path = _ckpt_dir(workdir, step)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)
