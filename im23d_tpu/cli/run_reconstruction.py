"""Mesh-estimation training / evaluation / pseudo-gt CLI.

Flag-compatible re-design of the reference ``code/run_reconstruction.py``
(same flag names/defaults, ``:33-67``).

Examples:
    python -m im23d_tpu.cli.run_reconstruction --name cub_recon --dataset cub
    python -m im23d_tpu.cli.run_reconstruction --name cub_recon --dataset cub \
        --generate_pseudogt --batch_size 50
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    from im23d_tpu.cli.flags import str2bool

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", type=str, required=True)
    p.add_argument("--dataset", type=str, required=True, help="(p3d|cub)")
    p.add_argument("--mesh_path", type=str, default="autodetect")
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--image_resolution", type=int, default=256)
    p.add_argument("--symmetric", type=str2bool, default=True)
    p.add_argument("--texture_resolution", type=int, default=128)
    p.add_argument("--mesh_resolution", type=int, default=32)
    p.add_argument("--loss", type=str, default="mse", help="(mse|l1)")
    p.add_argument("--checkpoint_freq", type=int, default=100)
    p.add_argument("--evaluate_freq", type=int, default=10)
    p.add_argument("--save_freq", type=int, default=10)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--no_augmentation", action="store_true")
    p.add_argument("--optimize_deltas", type=str2bool, default=True)
    p.add_argument("--optimize_z0", action="store_true")
    p.add_argument("--generate_pseudogt", action="store_true")
    p.add_argument("--pseudogt_resolution", type=int, default=512)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--which_epoch", type=str, default="latest")
    p.add_argument("--export_serving", type=str, default=None,
                   help="write an AOT serving artifact (jax.export "
                        "StableHLO, trained net baked in) to this path "
                        "and exit")
    p.add_argument("--export_platforms", type=str, default="tpu,cpu")
    p.add_argument("--mesh_regularization", type=float, default=5e-5)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_dataset", type=float, default=1e-4)
    p.add_argument("--lr_decay_every", type=int, default=250)
    p.add_argument("--datasets_root", type=str, default="datasets")
    # reference flags accepted for drop-in compatibility (:49,:60)
    p.add_argument("--image_freq", type=int, default=10,
                   help="epochs between TensorBoard image grids")
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="network conv compute dtype (auto = bfloat16 on "
                   "TPU); losses/renderer/export stay float32")
    p.add_argument("--num_workers", type=int, default=4,
                   help="data-loading threads")
    p.add_argument("--data_processes", type=int, default=0,
                   help="forked item-decode worker processes (the PIL codec "
                        "path is GIL-bound; raise to ~4 on many-core TPU "
                        "hosts — the reference uses 4 DataLoader worker "
                        "processes). 0 = threads only")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a multi-host TPU "
                        "pod (or set IM23D_MULTIHOST=1); the mesh then "
                        "spans every chip in the slice and --batch_size "
                        "is per-process")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a window of "
                        "steady-state steps to this directory")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    from im23d_tpu.core.checkpoint import wait_for_async_saves
    from im23d_tpu.core.metrics_logger import MetricsLogger
    from im23d_tpu.data.cmr import CUBDataset, P3dDataset, batch_iterator
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    if args.mesh_path == "autodetect":
        rings = 31 if args.dataset == "p3d" else 16
        template = MeshTemplate(segments=32, rings=rings)
    else:
        template = MeshTemplate(args.mesh_path)

    if args.generate_pseudogt:
        inception_resolution = 299
        renderer_res = max(1024, 2 * args.pseudogt_resolution)
        sizes = [args.image_resolution, inception_resolution, renderer_res]
    else:
        sizes = args.image_resolution

    is_train = not (args.no_augmentation or args.evaluate or args.generate_pseudogt)
    if args.dataset == "cub":
        train_ds = CUBDataset(args.datasets_root, "train", is_train, sizes)
        val_ds = (
            CUBDataset(args.datasets_root, "testval", False,
                       299 if args.generate_pseudogt else args.image_resolution)
        )
    elif args.dataset == "p3d":
        train_ds = P3dDataset(args.datasets_root, "train", is_train, sizes)
        val_ds = (
            None if args.generate_pseudogt
            else P3dDataset(args.datasets_root, "val", False, args.image_resolution)
        )
    else:
        raise ValueError("Invalid dataset")

    if args.compute_dtype == "auto":
        import jax

        args.compute_dtype = (
            "bfloat16" if jax.default_backend() == "tpu" else "float32"
        )
    cfg = ReconConfig(
        compute_dtype=args.compute_dtype,
        image_resolution=args.image_resolution,
        texture_resolution=args.texture_resolution,
        mesh_resolution=args.mesh_resolution,
        symmetric=args.symmetric,
        loss=args.loss,
        mesh_regularization=args.mesh_regularization,
        optimize_deltas=args.optimize_deltas,
        optimize_z0=args.optimize_z0,
        lr=args.lr,
        lr_dataset=args.lr_dataset,
        lr_decay_every=args.lr_decay_every,
        epochs=args.epochs,
        batch_size=args.batch_size,
    )
    workdir = os.path.join("checkpoints_recon", args.name)
    mesh = None
    if args.multihost or os.environ.get("IM23D_MULTIHOST") == "1":
        from im23d_tpu.parallel.mesh import init_multihost

        mesh = init_multihost()
    trainer = ReconTrainer(cfg, dataset_size=len(train_ds), template=template,
                           workdir=workdir, mesh=mesh)
    if (args.evaluate or args.generate_pseudogt or args.continue_train
            or args.export_serving):
        trainer.restore(
            step=None if args.which_epoch in ("latest", "best")
            else int(args.which_epoch)
        )

    if args.export_serving:
        from im23d_tpu.serve import export_reconstruction_inference

        export_reconstruction_inference(
            trainer, args.batch_size, args.export_serving,
            platforms=tuple(args.export_platforms.split(",")),
        )
        print(f"wrote serving artifact to {args.export_serving}")
        return 0

    train_keys = ("image", "scale", "translation", "rotation", "idx")

    if args.generate_pseudogt:
        cache_dir = os.path.join("cache", args.dataset)
        os.makedirs(cache_dir, exist_ok=True)
        renderer_res = max(1024, 2 * args.pseudogt_resolution)

        def loader():
            for batch in batch_iterator(train_ds, args.batch_size,
                                        shuffle=False, drop_last=False,
                                        num_workers=args.num_workers,
                                        process_workers=args.data_processes):
                batch["hd_image"] = batch.pop(f"image_{renderer_res}") / 2.0 + 0.5
                batch["inception_image"] = batch.pop("image_299")
                yield batch

        def val_loader():
            for batch in batch_iterator(val_ds, args.batch_size,
                                        shuffle=False, drop_last=False):
                batch["inception_image"] = batch.pop("image")
                yield batch

        trainer.generate_pseudogt(
            loader(), cache_dir, args.dataset,
            pseudogt_resolution=args.pseudogt_resolution,
            paths=train_ds.get_paths(),
            val_loader=val_loader() if args.dataset == "cub" else None,
        )
        return 0

    def val_batches():
        # drop_last=False: the evaluator pads the tail batch and weighs the
        # pads 0, so every validation image scores (reference eval keeps
        # the tail too)
        return batch_iterator(val_ds, args.batch_size, shuffle=False,
                              drop_last=False, keys=train_keys)

    if args.evaluate:
        means = trainer.evaluate(val_batches())
        print({k: round(v, 5) for k, v in means.items()})
        return 0

    logger = MetricsLogger(workdir, "recon", tensorboard=args.tensorboard)

    # fixed visualization batch: the same sample is rendered every
    # image_freq epochs (not whatever batch the epoch iterator ended on)
    viz_batch = next(
        iter(batch_iterator(train_ds, args.batch_size, shuffle=False,
                            keys=train_keys))
    )

    profiler = None
    if args.profile_dir:
        from im23d_tpu.core.jax_setup import StepProfiler

        profiler = StepProfiler(args.profile_dir)

    try:
        for epoch in range(trainer.epoch, args.epochs):
            trainer.epoch = epoch
            t0 = time.time()
            for it_in_epoch, batch in enumerate(
                batch_iterator(train_ds, args.batch_size, seed=epoch,
                               keys=train_keys, num_workers=args.num_workers,
                               process_workers=args.data_processes)
            ):
                if profiler is not None:
                    profiler.tick()
                losses = trainer.train_step(batch)
                if it_in_epoch % 10 == 0:
                    logger.log(trainer.total_it,
                               {k: float(v) for k, v in losses.items()})
            logger.log_text(f"epoch {epoch}: {time.time() - t0:.1f}s")
            trainer.epoch = epoch + 1
            # two-tier checkpointing (reference --save_freq rolling /
            # --checkpoint_freq permanent, run_reconstruction.py:472-486)
            if (epoch + 1) % args.checkpoint_freq == 0:
                trainer.save()
            elif (epoch + 1) % args.save_freq == 0:
                trainer.save(tag="latest")
            if (epoch + 1) % args.evaluate_freq == 0 and val_ds is not None:
                means = trainer.evaluate(val_batches())
                logger.log(trainer.total_it,
                           {f"val/{k}": v for k, v in means.items()})
            if (epoch + 1) % args.image_freq == 0:
                # multi-view render grid of a fixed sample (reference logs
                # these every --image_freq epochs, run_reconstruction.py:487-491)
                tex, mesh_map = trainer.predict(viz_batch["image"])
                raw_vtx = trainer.template.get_vertex_positions(mesh_map)
                grid = trainer.render_multiview(raw_vtx, tex, idx=0)
                logger.log_images(trainer.total_it, "render_multiview",
                                  grid[None], nrow=1)
    except KeyboardInterrupt:
        # final checkpoint on interrupt (reference run_reconstruction.py:492-496)
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
