"""Texture/mesh GAN training + evaluation CLI.

Flag-compatible re-design of the reference ``code/main.py`` driver (same
flag names/defaults, ``main.py:37-86``), minus the CUDA plumbing: the
``--gpu_ids`` DataParallel path is replaced by SPMD sharding over all local
TPU devices automatically.  The reference's always-on ``--conditional_class``
default bug (``main.py:44``) is fixed: it is a plain store_true flag.

Examples:
    python -m im23d_tpu.cli.main --name cub_512x512_class --conditional_class \
        --dataset cub --batch_size 32 --epochs 600
    python -m im23d_tpu.cli.main --name cub_pretrained --dataset cub \
        --batch_size 16 --save_results
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    from im23d_tpu.cli.flags import str2bool

    p = argparse.ArgumentParser(description=__doc__)
    # Model settings (reference main.py:39-55)
    p.add_argument("--texture_resolution", type=int, default=512)
    p.add_argument("--mesh_resolution", type=int, default=32)
    p.add_argument("--symmetric_g", type=str2bool, default=True)
    p.add_argument("--texture_only", action="store_true")
    p.add_argument("--conditional_class", action="store_true")
    p.add_argument("--conditional_color", action="store_true")
    p.add_argument("--conditional_text", action="store_true")
    p.add_argument("--norm_g", type=str, default="syncbatch",
                   help="(syncbatch|batch|instance|none) — syncbatch==batch under SPMD")
    p.add_argument("--latent_dim", type=int, default=64)
    p.add_argument("--mesh_path", type=str, default="autodetect")
    # Training settings (:58-69)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--norm_d", type=str, default="none")
    p.add_argument("--mesh_regularization", type=float, default=1e-4)
    p.add_argument("--lr_g", type=float, default=1e-4)
    p.add_argument("--lr_d", type=float, default=4e-4)
    p.add_argument("--d_steps_per_g", type=int, default=2)
    p.add_argument("--g_running_average_alpha", type=float, default=0.999)
    p.add_argument("--lr_decay_after", type=int, default=1000)
    p.add_argument("--loss", type=str, default="hinge")
    p.add_argument("--mask_output", type=str2bool, default=True)
    p.add_argument("--num_discriminators", type=int, default=-1)
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="conv-stack compute precision; auto = bfloat16 on "
                        "TPU, float32 elsewhere (new flag — the reference "
                        "trains pure f32)")
    # Session settings (:71-86)
    p.add_argument("--name", "--weights", dest="name", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True, help="(p3d|cub)")
    p.add_argument("--cache_dir", type=str, default=None,
                   help="default: cache/<dataset>")
    p.add_argument("--checkpoint_freq", type=int, default=20)
    p.add_argument("--save_freq", type=int, default=5)
    p.add_argument("--evaluate_freq", type=int, default=20)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--which_epoch", type=str, default="latest")
    p.add_argument("--export_serving", type=str, default=None,
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO, EMA generator baked in) to this path "
                        "and exit; implies --evaluate")
    p.add_argument("--export_platforms", type=str, default="tpu,cpu")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--truncation_sigma", type=float, default=-1)
    # reference flags accepted for drop-in compatibility (main.py:51-55,77,83)
    p.add_argument("--gpu_ids", type=str, default="0",
                   help="accepted for reference parity; devices come from "
                        "the jax runtime (SPMD over all visible chips)")
    p.add_argument("--num_workers", type=int, default=4,
                   help="data-loading threads")
    p.add_argument("--device_cache", action="store_true",
                   help="stage the whole pseudo-gt cache in device memory "
                        "once and assemble batches on device (jitted gather "
                        "+ UV-mirror augmentation; same epoch/augment "
                        "semantics as the host iterator).  Removes the "
                        "per-step host->device upload for caches that fit "
                        "in HBM — the right layout when the host link is "
                        "slow or remote (new flag; no reference analogue)")
    p.add_argument("--text_max_length", type=int, default=18)
    p.add_argument("--text_pretrained_encoder", type=str,
                   default="cache/cub/text_encoder200.pth")
    p.add_argument("--text_train_encoder", action="store_true")
    p.add_argument("--text_attention", type=str2bool, default=True)
    p.add_argument("--text_embedding_dim", type=int, default=256)
    p.add_argument("--inception_weights", type=str, default=None,
                   help="path to a torchvision inception state dict (npz/pth)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a multi-host TPU "
                        "pod (or set IM23D_MULTIHOST=1); the mesh then "
                        "spans every chip in the slice and --batch_size "
                        "is per-process")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a window of "
                        "steady-state steps to this directory")
    return p


def load_inception_variables(path):
    """--inception_weights: torchvision inception_v3 state dict (.pth via
    torch, or .npz of the same tensors) -> flax variables, for FID numbers
    comparable to the reference's torchvision-pretrained scores."""
    if not path:
        return None
    import numpy as np

    from im23d_tpu.metrics.inception import load_torch_state_dict

    if path.endswith(".npz"):
        sd = dict(np.load(path, allow_pickle=True))
    else:
        from im23d_tpu.core.torch_convert import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
    return load_torch_state_dict(sd)


def load_dataset(args):
    from im23d_tpu.data.pseudogt import CubGANDataset, Pascal3DGANDataset

    cache_dir = args.cache_dir or os.path.join("cache", args.dataset)
    common = dict(
        texture_resolution=args.texture_resolution,
        evaluate=args.evaluate,
        conditional_class=args.conditional_class,
        conditional_text=args.conditional_text,
    )
    if args.dataset == "cub":
        assert not args.conditional_color, "Not supported"
        return CubGANDataset(cache_dir, **common)
    if args.dataset == "p3d":
        assert not args.conditional_text, "Not supported"
        return Pascal3DGANDataset(
            cache_dir, conditional_color=args.conditional_color, **common
        )
    raise ValueError("Invalid dataset")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()
    if args.save_results or args.export_serving:
        args.evaluate = True

    from im23d_tpu.core.checkpoint import wait_for_async_saves
    from im23d_tpu.core.metrics_logger import MetricsLogger
    from im23d_tpu.data.pseudogt import EvalDataset, gan_batch_iterator
    from im23d_tpu.data.cmr import batch_iterator
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_eval import (
        FIDEvaluator,
        export_results,
        load_precomputed_stats,
    )
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    ds = load_dataset(args)
    if args.num_discriminators == -1:
        args.num_discriminators = ds.suggest_num_discriminators()
    if args.truncation_sigma < 0:
        args.truncation_sigma = ds.suggest_truncation_sigma()
    if args.num_discriminators >= 3:
        assert args.texture_resolution >= 512

    if args.mesh_path == "autodetect":
        segments, rings = ds.suggest_mesh_template()
        template = MeshTemplate(segments=segments, rings=rings)
    else:
        template = MeshTemplate(args.mesh_path)

    if args.compute_dtype == "auto":
        import jax

        args.compute_dtype = (
            "bfloat16" if jax.default_backend() == "tpu" else "float32"
        )

    mcfg = GANConfig(
        compute_dtype=args.compute_dtype,
        texture_resolution=args.texture_resolution,
        mesh_resolution=args.mesh_resolution,
        symmetric_g=args.symmetric_g,
        texture_only=args.texture_only,
        conditional_class=args.conditional_class,
        conditional_color=args.conditional_color,
        conditional_text=args.conditional_text,
        norm_g="batch" if args.norm_g == "syncbatch" else args.norm_g,
        norm_d=args.norm_d,
        latent_dim=args.latent_dim,
        num_discriminators=args.num_discriminators,
        mask_output=args.mask_output,
        n_classes=tuple(getattr(ds, "n_classes", (1,))),
    )
    tcfg = GANTrainConfig(
        model=mcfg, lr_g=args.lr_g, lr_d=args.lr_d,
        text_vocab_size=max(getattr(ds, "n_words", 0), 2),
        text_max_length=args.text_max_length,
        d_steps_per_g=args.d_steps_per_g,
        g_ema_alpha=args.g_running_average_alpha,
        mesh_regularization=args.mesh_regularization,
        loss=args.loss, epochs=args.epochs,
        lr_decay_after=args.lr_decay_after, batch_size=args.batch_size,
    )

    workdir = os.path.join("gan_weights", args.name)
    mesh = None
    if args.multihost or os.environ.get("IM23D_MULTIHOST") == "1":
        from im23d_tpu.parallel.mesh import init_multihost

        mesh = init_multihost()
    trainer = GANTrainer(tcfg, template=template, workdir=workdir,
                         mesh=mesh)
    if args.conditional_text and os.path.exists(args.text_pretrained_encoder):
        from im23d_tpu.core.torch_convert import (
            convert_text_encoder,
            load_torch_checkpoint,
        )

        te_params, te_cfg = convert_text_encoder(
            load_torch_checkpoint(args.text_pretrained_encoder)
        )
        trainer.set_text_encoder(te_params, **te_cfg)
        print(f"loaded pretrained text encoder "
              f"({te_cfg['vocab_size']} words) from "
              f"{args.text_pretrained_encoder}")
    if args.continue_train or args.evaluate:
        if args.which_epoch not in ("latest", "best"):
            trainer.restore(step=int(args.which_epoch))
        elif args.which_epoch == "latest" or not args.evaluate:
            trainer.restore()

    if (args.export_serving or args.save_results) and args.which_epoch == "best":
        # the 'best' sweep (FID over all numbered checkpoints) runs in the
        # evaluate path below; exporting here would serialize the unrestored
        # init instead of a trained generator
        flag = "--export_serving" if args.export_serving else "--save_results"
        raise SystemExit(
            f"{flag} requires --which_epoch latest or a numeric epoch "
            "(run --evaluate --which_epoch best first to identify the "
            "best epoch)"
        )

    if args.export_serving:
        from im23d_tpu.serve import export_gan_inference

        export_gan_inference(
            trainer, args.batch_size, args.export_serving,
            platforms=tuple(args.export_platforms.split(",")),
        )
        print(f"wrote serving artifact to {args.export_serving}")
        return 0

    import numpy as np

    def sample_conditioning(n, seed=0):
        """Random dataset indices -> (classes, poses, caption tokens), the
        reference's export conditioning (``main.py:847-852`` draws classes
        and render poses from the dataset)."""
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(ds), size=n)
        classes = (
            np.stack([np.atleast_1d(ds.classes[i]) for i in idx])
            if args.conditional_class else None
        )
        poses = dict(
            scale=np.asarray(ds.data["scale"])[idx],
            translation=np.asarray(ds.data["translation"])[idx],
            rotation=np.asarray(ds.data["rotation"])[idx],
        )
        captions = (
            ds.caption_tokens[idx, 0]
            if getattr(ds, "caption_tokens", None) is not None else None
        )
        return classes, poses, captions, idx

    if args.save_results:
        out = os.path.join("results", args.name)
        classes, poses, captions, _ = sample_conditioning(args.batch_size)
        files = export_results(
            trainer, template, out, n_samples=args.batch_size,
            truncation_sigma=args.truncation_sigma, classes=classes,
            poses=poses, caption_tokens=captions,
            render_res=min(args.texture_resolution, 512),
        )
        print(f"exported {len(files)} samples to {out}")
        return 0

    eval_ds = EvalDataset(ds)

    def eval_batches():
        # drop_last=False: FID scores every dataset image — the evaluator
        # pads the tail batch to the compiled shape and slices activations
        return batch_iterator(eval_ds, args.batch_size, shuffle=False,
                              drop_last=False)

    if args.evaluate:
        from im23d_tpu.train.gan_eval import load_val_stats, val_fids

        cache_dir = args.cache_dir or os.path.join("cache", args.dataset)
        stats_path = os.path.join(cache_dir, "precomputed_fid_299x299_train.npz")
        m_real, s_real, _, _ = load_precomputed_stats(stats_path)
        val_stats = load_val_stats(cache_dir)
        evaluator = FIDEvaluator(
            trainer, template,
            inception_variables=load_inception_variables(args.inception_weights),
        )

        def fid_now(variants: bool = True):
            acts = evaluator.activations_for_batches(
                eval_batches(), args.truncation_sigma, variants=variants
            )
            fids = {
                key: evaluator.fid_against_stats(act, m_real, s_real)
                for key, act in acts.items()
            }
            if val_stats is not None and variants:
                # deterministic val subsample under --evaluate (the
                # reference seeds 1234 there, main.py:361-363); the best
                # sweep skips val like the reference's fast=True
                # (main.py:818,363)
                fids.update(val_fids(acts, val_stats,
                                     np.random.RandomState(1234)))
            return fids

        if args.which_epoch == "best":
            # sweep all numbered checkpoints for the lowest combined FID
            # (reference main.py:787-829)
            from im23d_tpu.core.checkpoint import numbered_steps

            steps = numbered_steps(workdir)
            if not steps:
                raise SystemExit(
                    f"--which_epoch best: no numbered checkpoints to sweep "
                    f"under {workdir}/checkpoints (only the rolling "
                    f"step_latest tier exists; raise --checkpoint_freq "
                    f"coverage or pass --which_epoch latest)"
                )
            best = (None, float("inf"))
            for step in steps:
                trainer.restore(step=step)
                # the sweep ranks by combined FID only (reference
                # main.py:787-829): skip the texture/mesh-variant renders
                fid = fid_now(variants=False)["combined"]
                print(f"checkpoint {step}: {evaluator.metric_prefix}/combined {fid:.3f}")
                if fid < best[1]:
                    best = (step, fid)
            print(f"best checkpoint: {best[0]} (fid {best[1]:.3f})")
            trainer.restore(step=best[0])

        for key, fid in fid_now().items():
            print(f"{evaluator.metric_prefix}/{key}: {fid:.3f}")
        return 0

    logger = MetricsLogger(workdir, "gan", tensorboard=args.tensorboard)

    # in-training FID every --evaluate_freq epochs (reference main.py:776-777)
    # requires the precomputed real stats; degrade to grids-only without them
    cache_dir = args.cache_dir or os.path.join("cache", args.dataset)
    stats_path = os.path.join(cache_dir, "precomputed_fid_299x299_train.npz")
    evaluator = None
    fid_real = None
    val_stats = None
    if os.path.exists(stats_path):
        from im23d_tpu.train.gan_eval import load_val_stats

        evaluator = FIDEvaluator(
            trainer, template,
            inception_variables=load_inception_variables(args.inception_weights),
        )
        m_real, s_real, _, _ = load_precomputed_stats(stats_path)
        fid_real = (m_real, s_real)
        val_stats = load_val_stats(cache_dir)
    else:
        logger.log_text(
            f"no FID stats at {stats_path}; in-training eval logs image "
            "grids only"
        )

    # fixed conditioning for the periodic sample grids, so the grid shows
    # the same classes/poses every eval (reference logs grids each FID pass,
    # main.py:378-410)
    viz_n = min(args.batch_size, 16)
    viz_classes, viz_poses, viz_captions, viz_idx = sample_conditioning(
        viz_n, seed=1234
    )
    # matching real pseudo-gt for the comparison grids (the reference logs
    # real textures/images next to the fakes, main.py:378-404)
    viz_real = None
    if getattr(ds, "has_pseudo_ground_truth", False):
        items = [ds.load_pseudo_ground_truth(int(i)) for i in viz_idx]
        viz_real = {
            k: np.stack([it[k] for it in items]).astype(np.float32)
            for k in ("image", "texture", "mesh")
        }

    def evaluate_during_training(epoch):
        if evaluator is not None:
            from im23d_tpu.train.gan_eval import val_fids

            acts = evaluator.activations_for_batches(
                eval_batches(), args.truncation_sigma, variants=True
            )
            prefix = evaluator.metric_prefix
            fids = {
                f"{prefix}/{key}": evaluator.fid_against_stats(act, *fid_real)
                for key, act in acts.items()
            }
            if val_stats is not None:
                # fresh subsample per eval like the reference's unseeded
                # np.random.choice during training (main.py:363)
                fids.update({
                    f"{prefix}/{k}": v for k, v in val_fids(
                        acts, val_stats, np.random.RandomState(epoch)
                    ).items()
                })
            logger.log(trainer.total_it, fids)
            logger.log_text(
                f"epoch {epoch} " +
                " ".join(f"{k} {v:.3f}" for k, v in fids.items())
            )
        import jax
        import jax.numpy as jnp

        from im23d_tpu.train.gan_eval import render_generated

        z = trainer.truncation_sample(
            jax.random.PRNGKey(1234), viz_n, args.truncation_sigma
        )
        c = jnp.asarray(viz_classes, jnp.int32) if viz_classes is not None else None
        tex, mesh_map = trainer.generate(z, c, caption_tokens=viz_captions)
        s = jnp.asarray(viz_poses["scale"], jnp.float32).reshape(-1)
        t = jnp.asarray(viz_poses["translation"], jnp.float32)
        r = jnp.asarray(viz_poses["rotation"], jnp.float32)
        img, alpha = render_generated(template, 256, mesh_map, tex, s, t, r)

        def composite(image, a):
            return np.where(np.asarray(a) > 0, np.asarray(image), 1.0)

        logger.log_images(
            trainer.total_it, "samples/render", composite(img, alpha)
        )
        logger.log_images(
            trainer.total_it, "samples/texture", np.asarray(tex) / 2.0 + 0.5
        )

        def mesh_grid(m):
            m = np.asarray(m, np.float32)
            lo = m.min(axis=(1, 2), keepdims=True)
            hi = m.max(axis=(1, 2), keepdims=True)
            return (m - lo) / np.maximum(hi - lo, 1e-8)

        logger.log_images(
            trainer.total_it, "samples/mesh_map", mesh_grid(mesh_map)
        )

        if viz_real is not None:
            # real images + cross-variant renders beside the fakes
            # (reference image/real_tex, render/{real,fake_texture,fake_mesh},
            # main.py:378-404)
            # the pseudo-gt loader returns "image" already in [0,1]
            logger.log_images(
                trainer.total_it, "samples/real_image",
                np.asarray(viz_real["image"]),
            )
            logger.log_images(
                trainer.total_it, "samples/real_texture",
                np.asarray(viz_real["texture"]) / 2.0 + 0.5,
            )
            img_t, alpha_t = render_generated(
                template, 256, jnp.asarray(viz_real["mesh"]), tex, s, t, r
            )
            logger.log_images(
                trainer.total_it, "samples/render_fake_texture",
                composite(img_t, alpha_t),
            )
            img_m, alpha_m = render_generated(
                template, 256, mesh_map, jnp.asarray(viz_real["texture"]),
                s, t, r,
            )
            logger.log_images(
                trainer.total_it, "samples/render_fake_mesh",
                composite(img_m, alpha_m),
            )

        vocab = getattr(ds, "caption_vocab", None)
        if viz_captions is not None and vocab is not None:
            # decoded captions for the grid samples (reference
            # render/caption text, main.py:389-401)
            lines = [
                f"{i}. " + " ".join(
                    vocab[w] for w in row.tolist() if w != 0
                )
                for i, row in enumerate(np.asarray(viz_captions))
            ]
            logger.log_text("sample captions:\n" + "\n".join(lines))

    profiler = None
    if args.profile_dir:
        from im23d_tpu.core.jax_setup import StepProfiler

        profiler = StepProfiler(args.profile_dir)

    dev_cache = None
    if args.device_cache:
        from im23d_tpu.data.device_cache import DeviceGANCache

        dev_cache = DeviceGANCache(ds, args.batch_size, mesh=trainer.mesh)
        logger.log_text(
            f"device_cache: staged {len(ds)} items "
            f"({dev_cache.nbytes() / 1e6:.0f} MB) in device memory"
        )

    def epoch_iterator(epoch):
        if dev_cache is not None:
            return dev_cache.epoch_batches(epoch)
        return gan_batch_iterator(ds, args.batch_size, seed=epoch,
                                  num_workers=args.num_workers)

    try:
        for epoch in range(trainer.epoch, args.epochs):
            trainer.epoch = epoch
            t0 = time.time()
            # host fetches of loss scalars stall the device pipeline, so
            # sample them: the first 1G+2D group each epoch (so both g_ and
            # d_ curves are always populated) + every 10th iteration after
            for it_in_epoch, batch in enumerate(epoch_iterator(epoch)):
                if profiler is not None:
                    profiler.tick()
                losses = trainer.train_step(batch)
                if it_in_epoch < 3 or it_in_epoch % 10 == 0:
                    scalars = {k: float(v) for k, v in losses.items()}
                    logger.log(trainer.total_it, scalars)
                    trainer.record_curves(scalars)
            logger.log_text(f"epoch {epoch}: {time.time() - t0:.1f}s")
            trainer.epoch = epoch + 1
            # two-tier checkpointing (reference main.py:749-775): rolling
            # 'latest' every save_freq, permanent numbered every
            # checkpoint_freq
            if (epoch + 1) % args.checkpoint_freq == 0:
                trainer.save()
            elif (epoch + 1) % args.save_freq == 0:
                trainer.save(tag="latest")
            if (epoch + 1) % args.evaluate_freq == 0:
                evaluate_during_training(epoch)
    except KeyboardInterrupt:
        # final checkpoint on interrupt (reference main.py:779-783)
        logger.log_text("KeyboardInterrupt: saving final checkpoint")
        trainer.save(tag="latest")
        wait_for_async_saves()
        return 130
    finally:
        if profiler is not None:
            profiler.close()
    trainer.save()
    wait_for_async_saves()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
