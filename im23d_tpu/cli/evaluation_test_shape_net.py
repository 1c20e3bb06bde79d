"""ShapeNet checkpoint evaluation / visualization CLI.

Equivalent of the reference ``code/evaluation_test_shape_net.py``: load a
Learner checkpoint, report validation projection losses, render candidate
projections to PNG — and additionally Chamfer-L2 + 3D IoU against
ground-truth clouds (the BASELINE metric set the reference lacks; it only
reports projection MSE, SURVEY.md §6).

Example:
    python -m im23d_tpu.cli.evaluation_test_shape_net --workdir runs/chairs \
        --synthetic --out_dir runs/chairs/eval
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", type=str, required=True)
    p.add_argument("--category", choices=("chairs", "planes", "cars"),
                   default="chairs")
    p.add_argument("--data_root", type=str, default="data")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--num_batches", type=int, default=4)
    p.add_argument("--out_dir", type=str, default=None,
                   help="save projection grids as PNGs here")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    import jax.numpy as jnp
    import numpy as np

    from im23d_tpu.metrics.chamfer import chamfer_distance
    from im23d_tpu.metrics.iou import iou_3d
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = getattr(ShapeNetConfig, args.category)()
    learner = ShapeNetLearner(cfg, workdir=args.workdir)
    learner.restore(step=args.step)
    print(f"restored step {int(learner.state.step)}")

    if args.synthetic:
        from im23d_tpu.data.synthetic import SyntheticSilhouettes

        data = SyntheticSilhouettes(cfg.batch_size, cfg.image_size,
                                    cfg.num_views, n_points=512, seed=1)
        batches = [data.next_batch() for _ in range(args.num_batches)]
    else:
        from im23d_tpu.data.shapenet import DataBunch

        bunch = DataBunch(args.data_root, args.category, cfg.batch_size,
                          cfg.image_size, use_camera=False)
        batches = list(bunch.valid_batches())[: args.num_batches]

    # Projection losses (reference parity: projection-MSE eval)
    means = learner.evaluate(batches)
    print("projection eval:", {k: round(v, 5) for k, v in means.items()})

    # Chamfer + 3D IoU of predicted vs pseudo-GT clouds where available
    # (for synthetic data we regenerate the ground-truth clouds)
    if args.synthetic:
        from im23d_tpu.data.synthetic import _random_shapes
        import numpy as _np

        rng = _np.random.RandomState(123)
        gt = _random_shapes(rng, cfg.batch_size, 512)
        batch = batches[0]
        nb = learner._normalize(
            dict(images=jnp.asarray(batch["images"]),
                 pose_input=jnp.asarray(batch["pose_input"])))
        out = learner.state.apply_fn(
            learner.state.params, nb["images"], nb["pose_input"]
        )
        pred = out["point_cloud"]
        total, _, _ = chamfer_distance(pred, jnp.asarray(gt))
        iou = iou_3d(pred, jnp.asarray(gt), voxel_size=32)
        print(f"chamfer_l2 {float(jnp.mean(total)):.5f} "
              f"iou_3d {float(jnp.mean(iou)):.4f} "
              "(note: synthetic clouds are NOT the checkpoint's training targets)")

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        from PIL import Image

        batch = batches[0]
        # render the student projections of the first batch
        nb = learner._normalize(
            dict(images=jnp.asarray(batch["images"]),
                 pose_input=jnp.asarray(batch["pose_input"]),
                 masks=jnp.asarray(batch["masks"])))
        model_out = learner.state.apply_fn(
            learner.state.params, nb["images"], nb["pose_input"]
        )
        from im23d_tpu.losses.effective import unsupervised_loss

        _, aux = unsupervised_loss(
            model_out, nb["masks"], jnp.float32(0.3), None,
            cfg.num_views, voxel_size=cfg.voxel_size, training=False,
        )
        proj = np.asarray(aux["projection"])
        for i in range(min(8, proj.shape[0])):
            arr = np.clip(proj[i] * 255, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(args.out_dir, f"projection_{i}.png")
            )
        print(f"saved projections to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
