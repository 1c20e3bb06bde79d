"""Import reference PyTorch checkpoints into framework checkpoints.

The reference deploys pretrained weights as ``torch.save`` dicts
(``code/main.py:749-775`` for the GAN, ``code/run_reconstruction.py:472-486``
for the mesh-estimation network).  This tool converts one of those ``.pth``
files into an orbax checkpoint this framework's trainers restore, so a
reference user's ``pretrained_weights_{cub,p3d}`` /
``pretrained_reconstruction_{cub,p3d}`` assets run here unchanged:

    python -m im23d_tpu.cli.import_torch \
        --checkpoint gan_weights/pretrained_weights_cub/checkpoint_latest.pth \
        --name pretrained_weights_cub
    python -m im23d_tpu.cli.main --dataset cub --batch_size 16 \
        --weights pretrained_weights_cub --save_results

Model hyperparameters come from the ``args`` dict the reference snapshots
into every checkpoint (``main.py:762``); class-embedding sizes are inferred
from the weight shapes themselves.  What transfers: generator + EMA
generator (+ frozen text encoder when present) for the GAN; network +
per-image DatasetParams for the recon net; epoch / iteration counters and
the four loss curves.  What starts fresh: discriminator and optimizer
moments (torch Adam state has no analogue in the re-designed optax
pipeline) — importing is for inference/eval/pseudo-gt; continued GAN
training warms the critics up from scratch.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def _graft(dst: dict, src: dict, path: str = "") -> tuple[int, list[str]]:
    """Copy every leaf of ``src`` onto the same path in ``dst`` (in place).

    Returns (n_grafted, missing_paths).  Shape mismatches raise — they mean
    the checkpoint was trained with different hyperparameters than the
    config we rebuilt from its ``args`` snapshot.
    """
    import jax.numpy as jnp

    missing: list[str] = []
    n = 0

    def rec(d, s, p):
        nonlocal n
        for k, v in s.items():
            sub = f"{p}/{k}"
            if isinstance(v, dict):
                if not isinstance(d.get(k), dict):
                    missing.append(sub)
                    continue
                rec(d[k], v, sub)
            else:
                if k not in d:
                    missing.append(sub)
                    continue
                have, want = tuple(np.shape(d[k])), tuple(np.shape(v))
                if have != want:
                    raise ValueError(
                        f"shape mismatch at {sub}: checkpoint {want} vs "
                        f"model {have} — config/checkpoint disagree"
                    )
                d[k] = jnp.asarray(np.asarray(v), jnp.result_type(d[k]))
                n += 1

    rec(dst, src, path)
    return n, missing


def _count_leaves(tree) -> int:
    import jax

    return len(jax.tree_util.tree_leaves(tree))


def _report(what: str, n: int, dst, missing: list[str]) -> None:
    total = _count_leaves(dst)
    print(f"{what}: grafted {n}/{total} model arrays")
    for p in missing:
        print(f"  WARNING: checkpoint entry with no model counterpart: {p}")


def _to_np(x):
    """torch tensor / array / list -> numpy (torch only imported if needed)."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _sd_numpy(sd: dict) -> dict:
    return {k: _to_np(v) for k, v in sd.items()}


def make_gan_trainer(chk: dict, name: str, out_root: str):
    """Build a GANTrainer with the reference checkpoint's weights grafted in
    (config inferred from the checkpoint's args snapshot + weight shapes).
    Split out of ``import_gan`` so tests / callers can keep driving the
    restored trainer (render, export) after the import."""
    from im23d_tpu.core.torch_convert import convert_generator
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    ref_args = dict(chk.get("args") or {})
    gen_sd = _sd_numpy(chk["generator"])
    ema_sd = _sd_numpy(chk["generator_running_avg"])

    # class-embedding sizes come from the weights, not the args snapshot
    # (the reference derives them from the dataset at runtime)
    n_classes = []
    if "emb_class.weight" in gen_sd:
        n_classes.append(gen_sd["emb_class.weight"].shape[0])
    if "emb_color.weight" in gen_sd:
        n_classes.append(gen_sd["emb_color.weight"].shape[0])
    cfg_kwargs = {
        f.name: ref_args[f.name]
        for f in dataclasses.fields(GANConfig) if f.name in ref_args
    }
    # conditioning comes from the weights: the reference's args snapshot is
    # unreliable here (--conditional_class defaults to a truthy string,
    # code/main.py:44 — SURVEY §2.1 bug list)
    cfg_kwargs["conditional_class"] = bool(n_classes)
    cfg_kwargs["conditional_color"] = "emb_color.weight" in gen_sd
    if n_classes:
        cfg_kwargs["n_classes"] = tuple(n_classes)
    mcfg = GANConfig(**cfg_kwargs)
    trainer = GANTrainer(
        GANTrainConfig(model=mcfg, batch_size=2),
        workdir=os.path.join(out_root, name),
    )

    conv = convert_generator(gen_sd, has_mesh_head=not mcfg.texture_only)
    g_target = {"params": trainer.g_params, "batch_stats": trainer.g_stats}
    n, miss = _graft(g_target, conv)
    _report("generator", n, g_target, miss)
    conv_ema = convert_generator(ema_sd, has_mesh_head=not mcfg.texture_only)
    n, miss = _graft(trainer.g_ema, conv_ema)
    _report("generator_running_avg", n, trainer.g_ema, miss)

    te_sd = chk.get("text_encoder") or chk.get("text_encoder_g")
    if te_sd is not None and mcfg.conditional_text:
        from im23d_tpu.core.torch_convert import convert_text_encoder

        te_params, te_cfg = convert_text_encoder(_sd_numpy(te_sd))
        trainer.set_text_encoder(te_params, **te_cfg)
        print(f"text encoder: {te_cfg['vocab_size']} words")

    trainer.epoch = int(chk.get("epoch", 0))
    trainer.total_it = int(chk.get("iteration", 0))
    for ref_key, key in (("g_curve", "g_loss"), ("flat_curve", "flat_loss"),
                         ("d_fake_curve", "d_fake"), ("d_real_curve", "d_real")):
        if ref_key in chk:
            trainer.curves[key] = [float(v) for v in chk[ref_key]]
    return trainer


def import_gan(chk: dict, name: str, out_root: str) -> str:
    from im23d_tpu.core.checkpoint import wait_for_async_saves

    trainer = make_gan_trainer(chk, name, out_root)
    path = trainer.save(tag="latest")
    wait_for_async_saves()
    return path


def import_recon(chk: dict, name: str, out_root: str, dataset: str) -> str:
    from im23d_tpu.core.checkpoint import wait_for_async_saves
    from im23d_tpu.core.torch_convert import convert_reconstruction
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    ref_args = dict(chk.get("args") or {})
    gen_sd = _sd_numpy(chk["generator"])
    dp_sd = _sd_numpy(chk.get("dataset_params") or {})

    cfg_kwargs = {
        f.name: ref_args[f.name]
        for f in dataclasses.fields(ReconConfig) if f.name in ref_args
    }
    # optimize_* must mirror the weights, not the ReconConfig defaults: a
    # checkpoint with no dataset_params would otherwise save a size-1
    # dp_params tree that a later full-dataset restore cannot load.
    cfg_kwargs["optimize_deltas"] = "ds_translation" in dp_sd
    cfg_kwargs["optimize_z0"] = "ds_z0" in dp_sd
    cfg = ReconConfig(**{"batch_size": 2, **cfg_kwargs})
    dataset_size = (
        next(iter(dp_sd.values())).shape[0] if dp_sd else 1
    )
    rings = 31 if dataset == "p3d" else 16
    trainer = ReconTrainer(
        cfg, dataset_size=dataset_size,
        template=MeshTemplate(segments=32, rings=rings),
        workdir=os.path.join(out_root, name),
    )

    conv = convert_reconstruction(gen_sd)
    r_target = {"params": trainer.params, "batch_stats": trainer.batch_stats}
    n, miss = _graft(r_target, conv)
    _report("reconstruction net", n, r_target, miss)
    if dp_sd:
        n, miss = _graft(trainer.dp_params, dp_sd)
        _report("dataset_params", n, trainer.dp_params, miss)

    trainer.epoch = int(chk.get("epoch", 0))
    trainer.total_it = int(chk.get("iteration", 0))
    path = trainer.save(tag="latest")
    wait_for_async_saves()
    return path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, required=True,
                   help="reference checkpoint_*.pth file")
    p.add_argument("--name", "--weights", dest="name", type=str, required=True,
                   help="run name to import into (gan_weights/<name> or "
                        "checkpoints_recon/<name>)")
    p.add_argument("--kind", choices=("auto", "gan", "recon"), default="auto",
                   help="checkpoint family; auto-detected from the dict keys")
    p.add_argument("--dataset", type=str, default=None,
                   help="(cub|p3d); default: the checkpoint's args snapshot")
    p.add_argument("--out_root", type=str, default=None,
                   help="default: gan_weights/ or checkpoints_recon/")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    from im23d_tpu.core.torch_convert import load_torch_checkpoint

    chk = load_torch_checkpoint(args.checkpoint)
    kind = args.kind
    if kind == "auto":
        kind = "gan" if "generator_running_avg" in chk else "recon"
    dataset = args.dataset or dict(chk.get("args") or {}).get("dataset", "cub")

    if kind == "gan":
        out_root = args.out_root or "gan_weights"
        path = import_gan(chk, args.name, out_root)
    else:
        out_root = args.out_root or "checkpoints_recon"
        path = import_recon(chk, args.name, out_root, dataset)
    print(f"imported {kind} checkpoint -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
