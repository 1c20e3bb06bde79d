"""Synthetic multi-view silhouette data for smoke tests and benchmarks.

The real ShapeNet renders are large external assets; this generator produces
batches with identical shapes and statistics: random convex point clouds
(boxes/ellipsoids) projected to ground-truth silhouettes with the same
rendering-free projection pipeline, under random view quaternions.  Training
on it exercises every code path of Pipeline A end-to-end.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from im23d_tpu.ops.voxel import point_cloud_to_silhouette
from im23d_tpu.ops.sampling import resize_bilinear


def _random_unit_quats(rng: np.random.RandomState, n: int) -> np.ndarray:
    q = rng.randn(n, 4).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _random_shapes(rng: np.random.RandomState, batch: int, n_points: int) -> np.ndarray:
    """Random axis-aligned boxes or ellipsoid surfaces in [-0.35, 0.35]^3."""
    clouds = np.empty((batch, n_points, 3), np.float32)
    for b in range(batch):
        if rng.rand() < 0.5:
            half = rng.uniform(0.08, 0.3, size=3)
            pts = rng.uniform(-1, 1, size=(n_points, 3)) * half
            ax = rng.randint(3, size=n_points)
            pts[np.arange(n_points), ax] = (
                np.sign(pts[np.arange(n_points), ax] + 1e-9) * half[ax]
            )
        else:
            v = rng.randn(n_points, 3)
            v /= np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9
            pts = v * rng.uniform(0.1, 0.3, size=3)
        clouds[b] = pts
    return clouds


class SyntheticSilhouettes:
    """Infinite generator of ShapeNet-shaped batches.

    Yields dict(images (B,H,W,3), pose_input (B*V,H,W,3), masks (B*V,H,W)):
    'images' are silhouettes rendered at the image resolution broadcast to 3
    channels (stand-ins for RGB renders), pose_input are the V view
    silhouettes (camera-less mode), masks the V ground-truth masks.
    """

    def __init__(self, batch_size: int, image_size: int = 128, num_views: int = 5,
                 n_points: int = 512, seed: int = 0, sigma: float = 1.2,
                 uint8: bool = True):
        self.uint8 = uint8
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_views = num_views
        self.n_points = n_points
        self.sigma = sigma
        self._rng = np.random.RandomState(seed)
        # ground-truth rendering is host-side data generation: pin it to the
        # CPU backend — on a remote TPU the XLA-scatter splat plus the RPC
        # round trip costs seconds per batch and starves the train loop.
        # local_devices, not devices: under multi-process (jax.distributed)
        # global device 0 belongs to process 0 and is non-addressable
        # elsewhere — each process generates data on its own CPU device.
        cpu = jax.local_devices(backend="cpu")[0]

        def render(pc, q):
            # kernel 9 covers +-4.5 cells: exact to ~1e-4 at sigma <= 1.2,
            # and the host-side CPU blur is the batch-generation bottleneck
            sil = point_cloud_to_silhouette(
                pc, q, jnp.float32(self.sigma), voxel_size=self.image_size // 2,
                kernel_size=9,
            )
            sil = jnp.clip(sil, 0.0, 1.0)  # (B*V, S, S)
            # upsample to image resolution to mimic render inputs
            masks = resize_bilinear(sil, self.image_size, self.image_size)
            return masks

        self._render = jax.jit(render, device=cpu)

    def next_batch(self, return_gt: bool = False) -> dict:
        """One batch; ``return_gt`` adds the ground-truth clouds under
        'gt_cloud' (B, N, 3) for Chamfer evaluation (the synthetic generator
        knows the true geometry — real ShapeNet needs the model .obj files,
        which this environment lacks).  Callers must pop 'gt_cloud' before
        feeding the trainer."""
        rng = self._rng
        B, V = self.batch_size, self.num_views
        clouds = _random_shapes(rng, B, self.n_points)
        quats = _random_unit_quats(rng, B * V)
        pc = np.repeat(clouds, V, axis=0)
        masks = np.asarray(self._render(jnp.asarray(pc), jnp.asarray(quats)))
        imgs3 = np.repeat(masks[..., None], 3, axis=-1).astype(
            np.float32
        )  # (B*V, H, W, 3)
        view_pick = self._rng.randint(V, size=B)
        images = imgs3.reshape(B, V, self.image_size, self.image_size, 3)[
            np.arange(B), view_pick
        ]
        masks = masks.astype(np.float32)
        if self.uint8:
            # PNG-native uint8: the trainer normalizes on device (4x less
            # host->device traffic)
            q = lambda a: np.clip(a * 255.0, 0, 255).astype(np.uint8)
            batch = dict(images=q(images), pose_input=q(imgs3), masks=q(masks))
        else:
            batch = dict(images=images, pose_input=imgs3, masks=masks)
        if return_gt:
            batch["gt_cloud"] = clouds
        return batch

    def __iter__(self):
        while True:
            yield self.next_batch()
