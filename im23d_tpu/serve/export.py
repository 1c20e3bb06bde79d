"""AOT serving artifacts: serialize jitted inference graphs to disk.

The reference "deploys" by shipping torch checkpoints and re-running its
training scripts in eval mode (``code/main.py --save_results``); a TPU
production story wants ahead-of-time compiled, version-stable artifacts
that run without the model code or flax present.  ``jax.export`` lowers a
jitted function to StableHLO with the trained parameters baked in as
constants, serializes it, and reloads it into a bare callable — the
serving process needs only jax and the artifact file.

Artifacts are lowered for multiple platforms at once (default tpu+cpu) so
the same file serves on a TPU host and in a CPU canary/test environment.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def export_callable(fn, example_args: Sequence,
                    platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Lower ``fn(*example_args)`` to a serialized multi-platform artifact.

    Closed-over arrays (model parameters) are baked into the artifact as
    constants, making it self-contained.
    """
    from jax import export as jexport

    specs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        tuple(example_args),
    )
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)
    return exp.serialize()


def save_artifact(path: str, fn, example_args: Sequence,
                  platforms: Sequence[str] = ("tpu", "cpu")) -> None:
    with open(path, "wb") as f:
        f.write(export_callable(fn, example_args, platforms))


def load_artifact(path: str):
    """Load a serialized artifact into a plain callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def export_gan_inference(trainer, batch_size: int, path: str,
                         platforms: Sequence[str] = ("tpu", "cpu")) -> None:
    """Export the EMA generator: (z [, classes]) -> (texture, mesh_map).

    Class conditioning is preserved when the model is conditional; the
    caption path is resolved at export time as unconditional (serving a
    text-conditional model bakes the encoder separately).
    """
    mcfg = trainer.mcfg
    g_ema = trainer.g_ema
    z = jnp.zeros((batch_size, mcfg.latent_dim), jnp.float32)
    if mcfg.conditional_class:
        c = jnp.zeros((batch_size, len(mcfg.n_classes)), jnp.int32)

        def infer(z_, c_):
            return trainer._inference(g_ema, z_, c_, None)

        save_artifact(path, infer, (z, c), platforms)
    else:
        def infer(z_):
            return trainer._inference(g_ema, z_, None, None)

        save_artifact(path, infer, (z,), platforms)


def export_reconstruction_inference(
        trainer, batch_size: int, path: str,
        platforms: Sequence[str] = ("tpu", "cpu")) -> None:
    """Export the reconstruction net: RGBA image -> (texture, mesh_map)."""
    res = trainer.cfg.image_resolution
    images = jnp.zeros((batch_size, res, res, 4), jnp.float32)
    params, batch_stats = trainer.params, trainer.batch_stats
    model = trainer.model

    # apply the model directly rather than via trainer._infer: that jit is
    # bound to the training mesh's in_shardings, which would bake a
    # multi-device layout into an artifact meant to run on one device
    def infer(images_):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, images_,
            train=False,
        )

    save_artifact(path, infer, (images,), platforms)
