"""Point cloud -> triangle mesh conversion CLI.

The reference acknowledges pypoisson for this step but never wires it in
(``README.md:114``; zero imports in ``code/``).  Here the occupancy field
comes from the framework's own effective-loss substrate (trilinear splat +
sigma Gaussian smoothing, on device) and the surface from a table-free
marching-tetrahedra extractor (``geometry/marching.py``).

Input formats: .npy (N, 3), .npz (first array), or a ShapeNet-learner
checkpoint + an image (predict the cloud, then mesh it).

Examples:
    python -m im23d_tpu.cli.pointcloud_to_mesh --input cloud.npy \
        --output mesh.obj --voxel_size 96 --sigma 1.5
    python -m im23d_tpu.cli.pointcloud_to_mesh --workdir runs/chairs \
        --image render_0.png --output chair.obj
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", type=str, default=None,
                   help=".npy/.npz point cloud (N, 3) in [-0.5, 0.5]")
    p.add_argument("--workdir", type=str, default=None,
                   help="ShapeNet learner checkpoint dir (with --image)")
    p.add_argument("--image", type=str, default=None,
                   help="input image to predict a cloud from")
    p.add_argument("--category", choices=("chairs", "planes", "cars"),
                   default="chairs")
    p.add_argument("--output", type=str, required=True, help="output .obj")
    p.add_argument("--voxel_size", type=int, default=96)
    p.add_argument("--sigma", type=float, default=1.5)
    p.add_argument("--level", type=float, default=0.2,
                   help="iso level in [0, 1] of the normalized occupancy")
    return p


def load_points(path: str):
    import numpy as np

    raw = np.load(path)
    if hasattr(raw, "files"):
        raw = raw[raw.files[0]]
    pts = np.asarray(raw, np.float32).reshape(-1, 3)
    # clamp into the splat's valid cube
    return np.clip(pts, -0.5 + 1e-4, 0.5 - 1e-4)


def predict_points(workdir: str, image_path: str, category: str):
    import numpy as np
    from PIL import Image

    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = getattr(ShapeNetConfig, category)()
    learner = ShapeNetLearner(cfg, workdir=workdir)
    learner.restore()
    img = Image.open(image_path).convert("RGB").resize(
        (cfg.image_size, cfg.image_size)
    )
    x = np.asarray(img, np.float32)[None] / 255.0
    out = learner.state.apply_fn(learner.state.params, x, x)
    return np.asarray(out["point_cloud"])[0]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    assert (args.input is None) != (args.workdir is None), (
        "pass exactly one of --input / --workdir"
    )

    from im23d_tpu.core.jax_setup import setup_jax

    setup_jax()

    from im23d_tpu.geometry.marching import point_cloud_to_mesh, save_obj_simple

    if args.input:
        pts = load_points(args.input)
    else:
        assert args.image, "--workdir needs --image"
        pts = predict_points(args.workdir, args.image, args.category)

    verts, faces = point_cloud_to_mesh(
        pts, voxel_size=args.voxel_size, sigma=args.sigma, level=args.level
    )
    if len(faces) == 0:
        print("no surface found — try lowering --level or raising --sigma")
        return 1
    save_obj_simple(args.output, verts, faces)
    print(f"wrote {args.output}: {len(verts)} vertices, {len(faces)} faces")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
