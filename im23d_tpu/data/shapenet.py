"""ShapeNet multi-view render dataset (host-side input pipeline).

Reads the exact on-disk layout the reference consumes
(``code/data/shape_net_dataset.py``): a split file ``<synset>.{train,valid}``
listing model dirs, each containing ``render*.png`` (RGBA; alpha is the
mask) and ``camera*.mat`` (Blender camera position -> quaternion).

Host-side decode (PIL / scipy.io) feeds device-side compute; batches are
plain numpy dicts, sharded onto the mesh by the trainer.  No torch
DataLoader — a thread-pooled prefetching iterator keeps the TPU fed.
"""

from __future__ import annotations

import os
import threading
import queue as queue_mod
from pathlib import Path
from typing import Iterator, Sequence

import numpy as np

from im23d_tpu.ops.quaternion import blender_camera_to_quaternion

SYNSET_IDS = {
    "chairs": "03001627",
    "planes": "02691156",
    "cars": "02958343",
}


def get_model_dirs(root: str, synset_id: str, split: str) -> list[Path]:
    """Model directories listed in ``<root>/<synset>.<split>``.

    Parity: reference ``get_models`` (``shape_net_dataset.py:22-31``).
    """
    root = Path(root)
    assert split in ("train", "valid")
    split_file = root / f"{synset_id}.{split}"
    data = root / synset_id
    with open(split_file) as fh:
        return [data / line.strip() for line in fh if line.strip()]


def _load_image_rgba(path: Path, image_size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.size != (image_size, image_size):
        img = img.resize((image_size, image_size), Image.BILINEAR)
    # uint8 passthrough: normalization happens on device (the trainer divides
    # by 255), minimizing host->device traffic
    return np.asarray(img, dtype=np.uint8)  # (H, W, 4)


class ShapeNetRenders:
    """Per-model multi-view sample: images (V,H,W,3), poses, masks (V,H,W).

    Parity: reference ``ShapeNet`` dataset (``shape_net_dataset.py:34-69``);
    ``use_camera=False`` returns the view images as the pose input (the
    unsupervised pipeline predicts poses from views).
    """

    def __init__(self, model_dirs: Sequence[Path], use_camera: bool = True,
                 image_size: int = 128, cache_in_ram: bool = True):
        self.model_dirs = list(model_dirs)
        self.use_camera = use_camera
        self.image_size = image_size
        # Decoded-model RAM cache: a 130k-step chairs run visits each of the
        # ~4.7k models ~660 times — re-decoding 120 PNGs per batch on the
        # prefetch thread caps sustained throughput far below the device
        # step.  uint8 keeps it to ~325 KB/model at 128**2 (~1.5 GB for the
        # chairs train split); pass cache_in_ram=False to stream from disk.
        self._cache: dict | None = {} if cache_in_ram else None

    def __len__(self) -> int:
        return len(self.model_dirs)

    def __getitem__(self, idx: int):
        if self._cache is not None:
            hit = self._cache.get(idx)
            if hit is not None:
                return hit
        model = self.model_dirs[idx]
        images, masks, cameras = [], [], []
        for name in sorted(os.listdir(model)):
            if name.startswith("render"):
                o = _load_image_rgba(model / name, self.image_size)
                images.append(o[..., :3])
                masks.append(o[..., 3])
            elif name.startswith("camera"):
                from scipy.io import loadmat

                cam = loadmat(model / name)
                cameras.append(blender_camera_to_quaternion(cam["pos"]))
        images = np.stack(images)  # (V, H, W, 3) uint8
        masks = np.stack(masks)  # (V, H, W) uint8
        poses = np.stack(cameras) if self.use_camera else images
        out = (images, poses, masks)
        if self._cache is not None:
            self._cache[idx] = out  # dict assignment: thread-safe under GIL
        return out


def multi_view_collate(samples, rng: np.random.RandomState):
    """One random view image per model + all V poses/masks concatenated.

    Parity: reference ``multi_view_collate`` (``shape_net_dataset.py:72-90``).
    Returns dict(images (B,H,W,3), pose_input (B*V,...), masks (B*V,H,W)).
    """
    images, pose_input, masks = [], [], []
    for imgs, poses, msks in samples:
        v = rng.randint(imgs.shape[0])
        images.append(imgs[v])
        pose_input.append(poses)
        masks.append(msks)
    return dict(
        images=np.stack(images),
        pose_input=np.concatenate(pose_input, axis=0),
        masks=np.concatenate(masks, axis=0),
    )


# -- ground-truth point clouds (Chamfer / 3D-IoU eval) -----------------------
#
# The reference never computes Chamfer (its ShapeNet eval is projection-MSE
# only, ``code/models/unsupervised_part.py:110-111``); the paper reports it,
# so BASELINE requires a GT-cloud source.  Two layouts are accepted per model
# dir: a committed points file, or any OBJ mesh (ShapeNetCore layout), which
# is area-weighted surface sampled host-side.

GT_POINT_FILES = ("points.npy", "gt_points.npy", "pcl.npy", "points.npz")
GT_MESH_FILES = (
    "model.obj",
    "model_normalized.obj",
    os.path.join("models", "model_normalized.obj"),
)


def sample_mesh_points(vertices: np.ndarray, faces: np.ndarray, n_points: int,
                       rng: np.random.RandomState) -> np.ndarray:
    """Uniform surface sampling: triangles drawn by area, then uniform
    barycentric coordinates (host-side numpy; runs once per model at eval)."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    total = areas.sum()
    if not np.isfinite(total) or total <= 0:
        probs = np.full(len(areas), 1.0 / len(areas))
    else:
        probs = areas / total
    tri = rng.choice(len(faces), size=n_points, p=probs)
    r1 = np.sqrt(rng.rand(n_points, 1))
    r2 = rng.rand(n_points, 1)
    return ((1 - r1) * v0[tri] + r1 * (1 - r2) * v1[tri]
            + r1 * r2 * v2[tri]).astype(np.float32)


def normalize_cloud(points: np.ndarray) -> np.ndarray:
    """Shared eval frame: zero-mean, max radius 0.5 (the decoder's tanh/2
    output range), so predicted and GT clouds are directly comparable."""
    points = np.asarray(points, np.float32)
    center = points.mean(axis=-2, keepdims=True)
    points = points - center
    radius = np.max(np.linalg.norm(points, axis=-1), axis=-1, keepdims=True)
    return points / np.maximum(radius[..., None], 1e-8) * 0.5


def load_gt_points(model_dir, n_points: int = 2048,
                   rng: np.random.RandomState | None = None):
    """GT cloud (n_points, 3) for a model dir, or None when the dir has
    neither a points file nor a mesh.  Clouds are resampled to exactly
    ``n_points`` and normalized via :func:`normalize_cloud`."""
    model_dir = Path(model_dir)
    rng = rng if rng is not None else np.random.RandomState(0)
    pts = None
    for name in GT_POINT_FILES:
        path = model_dir / name
        if path.exists():
            raw = np.load(path)
            if hasattr(raw, "files"):  # npz
                raw = raw[raw.files[0]]
            pts = np.asarray(raw, np.float32).reshape(-1, 3)
            break
    if pts is None:
        for name in GT_MESH_FILES:
            path = model_dir / name
            if path.exists():
                from im23d_tpu.geometry.objio import load_obj

                mesh = load_obj(str(path))
                pts = sample_mesh_points(
                    np.asarray(mesh.vertices, np.float32),
                    np.asarray(mesh.faces), n_points, rng,
                )
                break
    if pts is None:
        return None
    if len(pts) != n_points:
        idx = rng.choice(len(pts), n_points, replace=len(pts) < n_points)
        pts = pts[idx]
    return normalize_cloud(pts)


class _PrefetchIterator:
    """Background-thread batch producer (replaces torch DataLoader workers)."""

    def __init__(self, make_batch, num_prefetch: int = 4):
        self._queue: queue_mod.Queue = queue_mod.Queue(maxsize=num_prefetch)
        self._make_batch = make_batch
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            batch = self._make_batch()
            self._queue.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        return self._queue.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue_mod.Empty:
            pass


class DataBunch:
    """Train/valid datasets + infinite shuffled train iterator.

    Parity: reference ``DataBunch`` (``shape_net_dataset.py:93-115``); train
    runs on train split with shuffling and drop-last; valid iterates in
    order at 2x batch.
    """

    def __init__(self, root: str, category: str = "chairs", batch_size: int = 10,
                 image_size: int = 128, use_camera: bool = True, seed: int = 0,
                 cache_in_ram: bool = True, num_workers: int = 8):
        from concurrent.futures import ThreadPoolExecutor

        synset = SYNSET_IDS[category]
        self.batch_size = batch_size
        self.train_ds = ShapeNetRenders(
            get_model_dirs(root, synset, "train"), use_camera, image_size,
            cache_in_ram=cache_in_ram,
        )
        self.valid_ds = ShapeNetRenders(
            get_model_dirs(root, synset, "valid"), use_camera, image_size,
            cache_in_ram=cache_in_ram,
        )
        self._rng = np.random.RandomState(seed)
        # PNG decode releases the GIL inside zlib: pooled item fetch keeps
        # cold-cache (and cache_in_ram=False) batch builds off the critical
        # path (the reference uses 4 DataLoader worker processes)
        self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def _train_batch(self):
        idx = self._rng.choice(len(self.train_ds), self.batch_size, replace=False)
        items = list(self._pool.map(self.train_ds.__getitem__, idx))
        return multi_view_collate(items, self._rng)

    def train_iter(self, num_prefetch: int = 4) -> Iterator[dict]:
        return _PrefetchIterator(self._train_batch, num_prefetch)

    def valid_batches(self) -> Iterator[dict]:
        bs = self.batch_size * 2
        rng = np.random.RandomState(0)
        for start in range(0, len(self.valid_ds) - bs + 1, bs):
            items = list(self._pool.map(
                self.valid_ds.__getitem__, range(start, start + bs)
            ))
            yield multi_view_collate(items, rng)
