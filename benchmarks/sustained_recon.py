"""Sustained mesh-estimation training through the REAL CLI (pipeline B.1).

Drives ``im23d_tpu.cli.run_reconstruction`` — the flag-parity reference
driver (``code/run_reconstruction.py:405-465``: renderer-in-the-loop MSE +
flatness warm-up, per-image DatasetParams deltas/z0, periodic eval with
mIoU, LR halving, two-tier checkpoints) — at the production shape
(batch 50, image 256², texture 128, bf16) on a fabricated CMR-format CUB
tree (same fabricator as the CLI e2e tests, ``tests/test_cli_recon.py``).

Usage: python benchmarks/sustained_recon.py [--epochs 150] [--images 50]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--images", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--root", default=None)
    ap.add_argument("--noise", action="store_true",
                    help="round-4 noise photos (loop-machinery evidence "
                    "only; mIoU means nothing).  Default renders STRUCTURED "
                    "geometry through the framework renderer "
                    "(data/fabricate.py) so the mesh-estimation objective "
                    "has real signal and mIoU can rise")
    ap.add_argument("--evaluate_freq", type=int, default=0,
                    help="epochs between mIoU evals (0 = twice per run)")
    args = ap.parse_args()

    root = args.root or f"/tmp/recon_sustained_{os.getpid()}"
    os.makedirs(root, exist_ok=True)
    t0 = time.time()
    if args.noise:
        from test_cli_recon import make_fake_cub_tree  # noqa: E402

        make_fake_cub_tree(root, n=args.images, img_hw=(300, 400))
    else:
        from im23d_tpu.data.fabricate import build_structured_cmr_tree

        build_structured_cmr_tree(root, n=args.images)
    print(f"[phase] data fabrication {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    os.chdir(root)  # the CLI resolves checkpoints_recon/ and datasets/ here

    from im23d_tpu.cli.run_reconstruction import main as cli_main

    t0 = time.time()
    rc = cli_main([
        "--name", "sustained_recon",
        "--dataset", "cub",
        "--batch_size", str(args.batch_size),
        "--image_resolution", "256",
        "--texture_resolution", "128",
        "--optimize_z0",
        "--compute_dtype", "bfloat16",
        "--epochs", str(args.epochs),
        "--num_workers", "2",
        "--evaluate_freq", str(args.evaluate_freq
                               or max(args.epochs // 2, 1)),
        "--image_freq", str(10 * args.epochs),
        "--save_freq", str(max(args.epochs // 2, 1)),
        "--checkpoint_freq", str(args.epochs),
        "--datasets_root", os.path.join(root, "datasets"),
    ])
    wall = time.time() - t0

    iters = args.epochs * (-(-args.images // args.batch_size))
    mpath = None
    for cand in ("checkpoints_recon", "recon_weights"):
        p = os.path.join(root, cand, "sustained_recon", "metrics_recon.jsonl")
        if os.path.exists(p):
            mpath = p
            break
    summary = dict(bench="sustained_recon_256", rc=rc, epochs=args.epochs,
                   iterations=iters, wall_s=round(wall, 1),
                   iter_ms_sustained=round(wall / iters * 1e3, 1),
                   imgs_per_sec_sustained=round(
                       iters * args.batch_size / wall, 1))
    if mpath:
        recs = [json.loads(line) for line in open(mpath)]

        def series(key):
            vals = [r[key] for r in recs if key in r]
            return ([round(vals[0], 4), round(vals[-1], 4)] if vals else None)

        def full_series(key):
            vals = [(r["step"], round(r[key], 4)) for r in recs if key in r]
            return vals or None

        summary.update(
            structured=not args.noise,
            recon_loss_first_last=series("recon_loss"),
            flat_loss_first_last=series("flat_loss"),
            miou_first_last=series("iou") or series("val/iou"),
            miou_series=full_series("iou") or full_series("val/iou"),
            metrics=mpath,
        )
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
