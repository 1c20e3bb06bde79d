"""Sustained 512² conditional GAN training through the REAL CLI (pipeline B).

Drives ``im23d_tpu.cli.main`` — the flag-parity reference driver loop
(epoch loop, 1G+2D alternation, EMA, two-tier checkpoints, loss curves;
``code/main.py:669-777``) — for a few hundred iterations at the production
CUB shape (512² textures, batch 32, 2 critics, class conditioning, bf16)
on a synthetic pseudo-gt cache (same fabricator as the CLI e2e tests,
``tests/test_cli_main.py``).  FID eval is skipped (no pretrained Inception
weights exist in this environment; see docs — `fid_uncalibrated`).

This is training-loop *evidence*, not a microbench: it shows the driver
loop sustains the gan_step.py device rate at scale with losses that move
adversarially rather than diverging.

Usage: python benchmarks/sustained_gan.py [--epochs 250] [--images 64]
           [--batch_size 32] [--root /tmp/gan_sustained]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_cache(root: str, n: int, res: int) -> str:
    """Reference-format synthetic CUB cache (cache/cub/{poses_metadata,
    pseudogt_<res>x<res>} + CUB annotation files), as in the CLI e2e tests."""
    rng = np.random.RandomState(0)
    cache = os.path.join(root, "cache", "cub")
    pg = os.path.join(cache, f"pseudogt_{res}x{res}")
    os.makedirs(pg, exist_ok=True)

    paths = [f"001.Some_Bird/img_{i}.jpg" for i in range(n)]
    rot = rng.randn(n, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    np.savez(os.path.join(cache, "poses_metadata.npz"), data=dict(
        path=paths,
        scale=np.full((n, 1), 0.7, np.float32),
        translation=np.zeros((n, 3), np.float32),
        rotation=rot,
    ))
    for i in range(n):
        np.savez(os.path.join(pg, f"{i}.npz"), data=dict(
            image=rng.rand(4, res, res).astype(np.float16) * 2 - 1,
            texture=rng.rand(3, res, res).astype(np.float16) * 2 - 1,
            texture_alpha=(rng.rand(1, res, res) > 0.3).astype(np.float16),
            mesh=(rng.randn(3, 32, 32) * 0.01).astype(np.float16),
        ))
    cub = os.path.join(root, "datasets", "cub", "CUB_200_2011")
    os.makedirs(cub, exist_ok=True)
    with open(os.path.join(cub, "images.txt"), "w") as fh:
        fh.writelines(f"{i + 1} {p}\n" for i, p in enumerate(paths))
    with open(os.path.join(cub, "image_class_labels.txt"), "w") as fh:
        fh.writelines(f"{i + 1} {i % 3 + 1}\n" for i in range(n))
    return cache


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--texture_resolution", type=int, default=512)
    ap.add_argument("--root", default=None)
    ap.add_argument("--noise", action="store_true",
                    help="round-4 uniform-noise pseudo-gt (loop-machinery "
                    "evidence only: the critics trivially win).  Default is "
                    "the STRUCTURED fabricator (data/fabricate.py) whose "
                    "distribution the generator can actually learn, with "
                    "fid_uncalibrated real stats in the cache")
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--device_cache", action="store_true",
                    help="pass --device_cache to the CLI: stage the cache "
                    "in HBM once (the axon tunnel pays ~9 s/iteration for "
                    "host-fed 512² bs-32 batches; docs/runs/README.md)")
    ap.add_argument("--evaluate_freq", type=int, default=0,
                    help="epochs between in-training FID evals (0 = never)")
    args = ap.parse_args()

    root = args.root or f"/tmp/gan_sustained_{os.getpid()}"
    t0 = time.time()
    cache_marker = os.path.join(root, "cache", "cub", "poses_metadata.npz")
    if os.path.exists(cache_marker):
        print(f"[phase] reusing existing cache under {root}",
              file=sys.stderr, flush=True)
    elif args.noise:
        make_cache(root, args.images, args.texture_resolution)
    else:
        from im23d_tpu.data.fabricate import build_structured_cache

        build_structured_cache(
            root, args.images, resolution=args.texture_resolution,
            n_classes=args.classes, seed=0,
        )
    print(f"[phase] cache fabrication {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    os.chdir(root)  # the CLI resolves gan_weights/ and datasets/ from CWD

    from im23d_tpu.cli.main import main as cli_main

    t0 = time.time()
    rc = cli_main([
        "--name", "sustained_512",
        "--dataset", "cub",
        "--texture_resolution", str(args.texture_resolution),
        "--batch_size", str(args.batch_size),
        "--num_discriminators", "2",
        "--conditional_class",
        "--compute_dtype", "bfloat16",
        "--epochs", str(args.epochs),
        "--num_workers", "2",
        "--save_freq", "50",
        "--checkpoint_freq", str(args.epochs),       # one numbered at the end
        "--evaluate_freq", str(args.evaluate_freq or 10 * args.epochs),
    ] + (["--device_cache"] if args.device_cache else []))
    wall = time.time() - t0

    iters_per_epoch = -(-args.images // args.batch_size)
    total_iters = args.epochs * iters_per_epoch
    # guard the metrics read (as sustained_recon.py does): if the CLI failed
    # before writing metrics, still emit the summary JSON with rc/wall
    metrics_path = os.path.join(root, "gan_weights", "sustained_512",
                                "metrics_gan.jsonl")
    recs = ([json.loads(line) for line in open(metrics_path)]
            if os.path.exists(metrics_path) else [])
    def series(key):
        vals = [(r["step"], r[key]) for r in recs if key in r]
        return (round(vals[0][1], 3), round(vals[-1][1], 3)) if vals else None

    # full fid_uncalibrated trajectory: THE learning-evidence series for a
    # structured run (decreasing = G approaches the fabricated distribution)
    fid_series = {
        k: [(r["step"], round(r[k], 2)) for r in recs if k in r]
        for k in ("fid_uncalibrated/combined", "fid_uncalibrated/texture_only",
                  "fid_uncalibrated/mesh_only")
    }
    fid_series = {k: v for k, v in fid_series.items() if v}

    groups = total_iters / 3.0  # 1G+2D
    print(json.dumps({
        "bench": "sustained_gan_512",
        "structured": not args.noise,
        "fid_series": fid_series or None,
        "rc": rc,
        "epochs": args.epochs,
        "iterations": total_iters,
        "wall_s": round(wall, 1),
        "iter_group_ms_sustained": round(wall / groups * 1e3, 1),
        "imgs_per_sec_sustained": round(total_iters * args.batch_size / wall, 1),
        "g_loss_first_last": series("g_loss"),
        "d_real_first_last": series("d_real"),
        "d_fake_first_last": series("d_fake"),
        "flat_first_last": series("flat_loss"),
        "workdir": os.path.join(root, "gan_weights", "sustained_512"),
    }), flush=True)


if __name__ == "__main__":
    main()
