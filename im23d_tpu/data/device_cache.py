"""Device-resident pseudo-gt cache: batches assembled ON the accelerator.

The reference feeds the GAN from host DataLoader workers every iteration
(``code/main.py:140-141,669-777``).  On a TPU whose host link is slow or
remote (the axon tunnel here: a 512² bs-32 fp16 batch is ~134 MB/step,
which round 4 measured at ~9 s/iteration — 30× the device step), per-step
host feeding is the wrong layout.  For caches that fit in HBM this module
uploads the WHOLE dataset once and assembles every batch on device: a
jitted gather over the staged arrays plus the UV-mirror augmentation
(``data/pseudogt.py:mirror_tex_nhwc`` = flip-u + half-period roll) applied
under a per-item mask.  Epoch semantics (shuffle order, per-(epoch, idx)
seeded mirror draws) replicate ``gan_batch_iterator`` exactly — only the
place where bytes move changes.

Memory: N * (H*W*4 + h*w*3) * 2 bytes — e.g. 256 images at 512² ≈ 0.5 GB,
2k images at 256² ≈ 1.1 GB.  Callers gate on ``fits_in_hbm``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from im23d_tpu.data.pseudogt import PseudoGTDataset


def _mirror_nhwc_device(x):
    """jnp twin of ``mirror_tex_nhwc`` for (B, H, W, C): flip u (the texture
    width axis), then roll half a period — same pixels as the host version
    (flip + self-concat + center crop == roll(flip(x), -W/2))."""
    import jax.numpy as jnp

    W = x.shape[2]
    return jnp.roll(x[:, :, ::-1], -(W // 2), axis=2)


class DeviceGANCache:
    """Stage a ``PseudoGTDataset`` in device memory; yield device batches."""

    def __init__(self, dataset: PseudoGTDataset, batch_size: int,
                 mesh=None):
        import jax
        import jax.numpy as jnp

        from im23d_tpu.parallel.mesh import (
            batch_sharded,
            make_mesh,
            replicated,
        )

        assert dataset.caption_tokens is None, (
            "--device_cache does not support --conditional_text (per-epoch "
            "caption draws would need the token cache on device)"
        )
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.mesh = mesh or make_mesh()
        n = len(dataset)

        items = [dataset.load_pseudo_ground_truth(i, with_image=False)
                 for i in range(n)]
        tex = np.stack([it["texture"] for it in items])        # (N,H,W,3) f16
        alpha = np.stack([it["texture_alpha"] for it in items])
        mesh_maps = np.stack([it["mesh"] for it in items])
        self.classes = (
            np.stack([np.atleast_1d(dataset.classes[i]) for i in range(n)])
            .astype(np.int32)
            if dataset.conditional_class else None
        )

        repl = replicated(self.mesh)
        self._tex = jax.device_put(tex, repl)
        self._alpha = jax.device_put(alpha, repl)
        self._mesh = jax.device_put(mesh_maps, repl)

        batch_shd = batch_sharded(self.mesh)

        def assemble(tex_all, alpha_all, mesh_all, idx, mirror):
            out = {}
            for key, arr in (("texture", tex_all), ("alpha", alpha_all),
                             ("mesh", mesh_all)):
                g = jnp.take(arr, idx, axis=0)
                m = _mirror_nhwc_device(g)
                out[key] = jnp.where(mirror[:, None, None, None], m, g)
            return out

        self._assemble = jax.jit(
            assemble,
            in_shardings=(repl, repl, repl, batch_shd, batch_shd),
            out_shardings=batch_shd,
        )

    @staticmethod
    def fits_in_hbm(dataset: PseudoGTDataset, budget_bytes: int = 2 << 30
                    ) -> bool:
        r = dataset.texture_resolution
        per_item = r * r * 4 * 2 + 32 * 32 * 3 * 2
        return len(dataset) * per_item <= budget_bytes

    def nbytes(self) -> int:
        return int(self._tex.nbytes + self._alpha.nbytes + self._mesh.nbytes)

    def epoch_batches(self, epoch: int, shuffle: bool = True
                      ) -> Iterator[dict]:
        """Device batches for one epoch — same order/augmentation draws as
        ``gan_batch_iterator(ds, bs, seed=epoch)``: RandomState(epoch)
        shuffle, per-(epoch, idx) mirror bits, drop_last."""
        import jax.numpy as jnp

        ds = self.ds
        rng = np.random.RandomState(epoch)
        order = np.arange(len(ds))
        if shuffle:
            rng.shuffle(order)
        end = len(order) - (len(order) % self.batch_size)
        augment = ds.augment and not ds.evaluate
        for start in range(0, end, self.batch_size):
            idx = order[start:start + self.batch_size]
            mirror = np.array(
                [augment and ds._item_rng(int(i), epoch).integers(2) == 1
                 for i in idx],
                bool,
            )
            batch = dict(
                self._assemble(
                    self._tex, self._alpha, self._mesh,
                    jnp.asarray(idx, jnp.int32), jnp.asarray(mirror),
                )
            )
            if self.classes is not None:
                batch["c"] = self.classes[idx]
            yield batch
