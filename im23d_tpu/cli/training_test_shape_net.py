"""ShapeNet unsupervised training CLI.

Equivalent of the reference ``code/training_test_shape_net.py`` __main__
blocks (chairs / planes / cars configs, ``:182-237``) with an argparse
front-end, plus a synthetic-data mode for environments without the ShapeNet
renders.

Examples:
    python -m im23d_tpu.cli.training_test_shape_net --category chairs \
        --data_root data --workdir runs/chairs
    python -m im23d_tpu.cli.training_test_shape_net --category chairs \
        --synthetic --steps 200 --workdir /tmp/smoke
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--category", choices=("chairs", "planes", "cars"),
                   default="chairs")
    p.add_argument("--data_root", type=str, default="data",
                   help="directory with <synset>.{train,valid} splits + renders")
    p.add_argument("--no_ram_cache", action="store_true",
                   help="stream renders from disk instead of caching the "
                        "decoded uint8 views in RAM (~325 KB/model at 128^2)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on generated silhouette data (no assets needed)")
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--steps", type=int, default=None,
                   help="override the per-category step count")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--restore", type=str, default=None,
                   help="workdir to restore the latest checkpoint from")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--compute_dtype", type=str, default="auto",
                   choices=("auto", "float32", "bfloat16"),
                   help="encoder/pose-trunk compute dtype (auto = bfloat16 "
                        "on TPU); heads and the projection loss stay f32")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a multi-host TPU "
                        "pod (or set IM23D_MULTIHOST=1); the mesh then "
                        "spans every chip in the slice and --batch_size "
                        "is per-process")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel width: shard the wide Dense "
                        "kernels over a 'model' mesh axis of this size "
                        "(devices = data x tp)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of a window of "
                        "steady-state steps to this directory")
    from im23d_tpu.cli.flags import add_shapenet_overrides

    add_shapenet_overrides(p)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    from im23d_tpu.core.checkpoint import wait_for_async_saves
    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    from im23d_tpu.cli.flags import apply_shapenet_overrides

    cfg = getattr(ShapeNetConfig, args.category)()
    overrides = {}
    if args.steps is not None:
        overrides["total_steps"] = args.steps
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.compute_dtype != "auto":
        overrides["compute_dtype"] = args.compute_dtype
    if overrides:
        cfg = ShapeNetConfig(**{**cfg.__dict__, **overrides})
    cfg = apply_shapenet_overrides(cfg, args)

    mesh = None
    param_shardings = None
    if args.multihost or os.environ.get("IM23D_MULTIHOST") == "1":
        from im23d_tpu.parallel.mesh import init_multihost

        mesh = init_multihost()
    if args.tp > 1:
        from im23d_tpu.parallel.mesh import dense_tp_shardings, make_2d_mesh

        mesh = make_2d_mesh(args.tp)  # global devices: data x model
        param_shardings = dense_tp_shardings(args.tp)
    learner = ShapeNetLearner(cfg, workdir=args.workdir, mesh=mesh,
                              param_shardings=param_shardings)
    if args.restore:
        learner.restore(args.restore)

    if args.synthetic:
        data = SyntheticSilhouettes(
            cfg.batch_size, cfg.image_size, cfg.num_views, n_points=512
        )
        train_iter = iter(data)
        valid_batches = lambda: [data.next_batch() for _ in range(2)]
    else:
        from im23d_tpu.data.shapenet import DataBunch

        bunch = DataBunch(
            args.data_root, args.category, cfg.batch_size,
            cfg.image_size, use_camera=False,
            cache_in_ram=not args.no_ram_cache,
        )
        train_iter = bunch.train_iter()
        valid_batches = bunch.valid_batches

    if args.eval_only:
        means = learner.evaluate(valid_batches)
        print({k: round(v, 5) for k, v in means.items()})
        return 0

    profiler = None
    if args.profile_dir:
        from im23d_tpu.core.jax_setup import StepProfiler

        profiler = StepProfiler(args.profile_dir)
        train_iter = profiler.wrap(train_iter)

    try:
        losses = learner.fit(train_iter, num_steps=cfg.total_steps,
                             valid_batches=valid_batches)
    except KeyboardInterrupt:
        # final checkpoint on interrupt (the reference drivers save on
        # KeyboardInterrupt, main.py:779-783 / run_reconstruction.py:492-496)
        print("KeyboardInterrupt: saving final checkpoint")
        learner.save(tag="latest")
        wait_for_async_saves()
        return 130
    finally:
        if profiler is not None:
            profiler.close()
    learner.save()
    wait_for_async_saves()
    print({k: round(v, 5) for k, v in losses.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
