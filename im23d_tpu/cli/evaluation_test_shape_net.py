"""ShapeNet checkpoint evaluation / visualization CLI.

Equivalent of the reference ``code/evaluation_test_shape_net.py``: load a
Learner checkpoint, report validation projection losses, render student and
per-candidate projection grids, plot the training loss curves — and
additionally Chamfer-L2 + 3D IoU against ground-truth point clouds (the
BASELINE metric set; the reference only reports projection MSE,
``code/models/unsupervised_part.py:110-111``).

Ground truth comes from each model dir: a committed points file or any OBJ
mesh (ShapeNetCore layout), surface-sampled host-side — see
``im23d_tpu.data.shapenet.load_gt_points``.  Both predicted and GT clouds
are normalized to a shared frame (zero-mean, max radius 0.5) before
Chamfer/IoU, since the unsupervised model is only trained up to the pose
ensemble's frame.

Examples:
    python -m im23d_tpu.cli.evaluation_test_shape_net --workdir runs/chairs \
        --data_root data --out_dir runs/chairs/eval
    python -m im23d_tpu.cli.evaluation_test_shape_net --workdir runs/chairs \
        --synthetic --out_dir runs/chairs/eval   # CI fallback
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
    p.add_argument("--gt_points", type=int, default=2048,
                   help="points per ground-truth cloud for Chamfer/IoU")
    p.add_argument("--max_models", type=int, default=256,
                   help="cap on valid-split models scored for Chamfer/IoU")
    p.add_argument("--out_dir", type=str, default=None,
                   help="save projection grids / loss-curve plots here")
    p.add_argument("--batch_size", type=int, default=None,
                   help="override the per-category batch size")
    from im23d_tpu.cli.flags import add_shapenet_overrides

    add_shapenet_overrides(p)
    return p


def _save_grid(path: str, tiles, ncol: int) -> None:
    """Tile (N, H, W) float arrays in [0, 1] into one PNG."""
    import numpy as np
    from PIL import Image

    from im23d_tpu.core.metrics_logger import tile_grid

    grid = tile_grid(tiles, ncol)[..., 0]
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


def evaluate_gt_clouds(learner, model_dirs, cfg, n_gt_points: int,
                       batch_size: int):
    """Chamfer-L2 + 3D-IoU of predicted vs GT clouds over model dirs.

    Returns (chamfer_mean, iou_mean, n_scored) — n_scored == 0 when no
    model dir carries a points file or mesh.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from im23d_tpu.data.shapenet import (
        _load_image_rgba,
        load_gt_points,
        normalize_cloud,
    )
    from im23d_tpu.metrics.chamfer import chamfer_distance
    from im23d_tpu.metrics.iou import iou_3d

    rng = np.random.RandomState(0)

    @jax.jit
    def predict_clouds(images):
        nb = learner._normalize(dict(images=images))
        # the pose branch is unused for Chamfer; feed the image itself so
        # the shared encoder sees a valid (B, H, W, 3) input
        out = learner.state.apply_fn(
            learner.state.params, nb["images"], nb["images"]
        )
        return out["point_cloud"]

    chamfers, ious, images_buf, gts_buf = [], [], [], []

    def flush():
        if not images_buf:
            return
        n = len(images_buf)
        # pad to a full batch for a single compiled shape
        while len(images_buf) < batch_size:
            images_buf.append(images_buf[-1])
            gts_buf.append(gts_buf[-1])
        pred = predict_clouds(jnp.asarray(np.stack(images_buf)))
        pred = jnp.asarray(normalize_cloud(np.asarray(pred)))
        gt = jnp.asarray(np.stack(gts_buf))
        total, _, _ = chamfer_distance(pred, gt)
        iou = iou_3d(pred, gt, voxel_size=32)
        chamfers.extend(np.asarray(total)[:n].tolist())
        ious.extend(np.asarray(iou)[:n].tolist())
        images_buf.clear()
        gts_buf.clear()

    for model in model_dirs:
        gt = load_gt_points(model, n_gt_points, rng)
        if gt is None:
            continue
        render = sorted(
            name for name in os.listdir(model) if name.startswith("render")
        )
        if not render:
            continue
        img = _load_image_rgba(
            os.path.join(model, render[0]), cfg.image_size
        )[..., :3]
        images_buf.append(img)
        gts_buf.append(gt)
        if len(images_buf) == batch_size:
            flush()
    flush()
    if not chamfers:
        return float("nan"), float("nan"), 0
    return float(np.mean(chamfers)), float(np.mean(ious)), len(chamfers)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    import jax.numpy as jnp
    import numpy as np

    from im23d_tpu.metrics.chamfer import chamfer_distance
    from im23d_tpu.metrics.iou import iou_3d
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    from im23d_tpu.cli.flags import apply_shapenet_overrides

    cfg = getattr(ShapeNetConfig, args.category)()
    if args.batch_size is not None:
        cfg = ShapeNetConfig(**{**cfg.__dict__, "batch_size": args.batch_size})
    cfg = apply_shapenet_overrides(cfg, args)
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

    # Chamfer + 3D IoU against ground truth
    if args.synthetic:
        # CI fallback: random clouds, NOT the checkpoint's training targets
        from im23d_tpu.data.synthetic import _random_shapes

        rng = np.random.RandomState(123)
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
    else:
        from im23d_tpu.data.shapenet import SYNSET_IDS, get_model_dirs

        model_dirs = get_model_dirs(
            args.data_root, SYNSET_IDS[args.category], "valid"
        )[: args.max_models]
        chamfer, iou, n = evaluate_gt_clouds(
            learner, model_dirs, cfg, args.gt_points, cfg.batch_size
        )
        if n:
            print(f"chamfer_l2 {chamfer:.5f} iou_3d {iou:.4f} "
                  f"({n} models, {args.gt_points} GT points, "
                  "normalized frame)")
        else:
            print("no GT point clouds / meshes found under model dirs; "
                  "skipping Chamfer/IoU (add points.npy or model OBJs)")

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)

        batch = batches[0]
        nb = learner._normalize(
            dict(images=jnp.asarray(batch["images"]),
                 pose_input=jnp.asarray(batch["pose_input"]),
                 masks=jnp.asarray(batch["masks"])))
        model_out = learner.state.apply_fn(
            learner.state.params, nb["images"], nb["pose_input"]
        )
        from im23d_tpu.losses.effective import unsupervised_loss

        # student projections (eval mode)
        _, aux = unsupervised_loss(
            model_out, nb["masks"], jnp.float32(0.3), None,
            cfg.num_views, voxel_size=cfg.voxel_size, training=False,
        )
        proj = np.asarray(aux["projection"])
        _save_grid(os.path.join(args.out_dir, "student_projections.png"),
                   proj[:16], ncol=4)

        # per-candidate projections (reference renders each pose
        # candidate's projection, evaluation_test_shape_net.py:65-114)
        _, aux_k = unsupervised_loss(
            model_out, nb["masks"], jnp.float32(0.3), None,
            cfg.num_views, voxel_size=cfg.voxel_size, training=True,
        )
        cand = np.asarray(aux_k["projection"])  # (B*V, K, S, S)
        K = cand.shape[1]
        _save_grid(
            os.path.join(args.out_dir, "candidate_projections.png"),
            cand[:8].reshape(-1, *cand.shape[2:]), ncol=K,
        )
        # ground-truth masks next to them for visual comparison
        masks = np.asarray(nb["masks"])[:8]
        import jax.image as jimage

        S = cand.shape[-1]
        masks_s = np.asarray(
            jimage.resize(jnp.asarray(masks), (masks.shape[0], S, S),
                          "linear")
        )
        _save_grid(os.path.join(args.out_dir, "gt_masks.png"), masks_s,
                   ncol=4)

        # loss curves from the workdir's metrics jsonl (the reference plots
        # TensorBoard CSV exports, evaluation_test_shape_net.py:117-177)
        curves_path = os.path.join(
            os.path.abspath(args.workdir), "metrics_shapenet.jsonl"
        )
        if os.path.exists(curves_path):
            import json

            recs = [json.loads(line) for line in open(curves_path)]
            keys = [
                k for base in ("total_loss", "projection_loss", "student_loss")
                for k in (base, f"valid/{base}")
                if any(k in r for r in recs)
            ]
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                fig, ax = plt.subplots(figsize=(8, 5))
                for k in keys:
                    pts = [(r["step"], r[k]) for r in recs if k in r]
                    ax.plot(*zip(*pts), label=k)
                ax.set_xlabel("step")
                ax.set_yscale("log")
                if keys:
                    ax.legend()
                fig.savefig(os.path.join(args.out_dir, "loss_curves.png"),
                            dpi=120, bbox_inches="tight")
                plt.close(fig)
            except ImportError:
                # environment without matplotlib: emit the curve data as CSV
                with open(os.path.join(args.out_dir, "loss_curves.csv"),
                          "w") as fh:
                    fh.write("step," + ",".join(keys) + "\n")
                    for r in recs:
                        if any(k in r for k in keys):
                            fh.write(
                                f"{r['step']},"
                                + ",".join(str(r.get(k, "")) for k in keys)
                                + "\n"
                            )
        print(f"saved projection grids to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
