"""GAN-side datasets: pseudo-ground-truth cache readers (CUB / Pascal3D+).

Parity: reference ``code/data/abstract_dataset.py`` /
``cub_200_2011_dataset.py`` / ``pascal3d_plus_dataset.py``: read
``cache/<ds>/poses_metadata.npz`` + per-index pseudo-gt npz, UV-space mirror
augmentation, class labels, per-dataset hyperparameter suggestions.  Batches
come out NHWC for the GAN trainer.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

import numpy as np


def mirror_tex_nhwc(tr: np.ndarray) -> np.ndarray:
    """Mirror a texture/displacement map in UV space (NHWC single image).

    Parity: ``AbstractDataset.mirror_tex`` (``abstract_dataset.py:99-107``):
    flip along u, then roll by half a period (flip + self-concat + center
    crop).
    """
    tr = tr[:, ::-1]
    tr = np.concatenate([tr, tr], axis=1)
    w = tr.shape[1]
    return tr[:, w // 4 : -(w // 4)]


class PseudoGTDataset:
    """Abstract pseudo-gt dataset (reference ``AbstractDataset``)."""

    def __init__(self, cache_dir: str, texture_resolution: int = 512,
                 augment: bool = True, evaluate: bool = False,
                 conditional_class: bool = False,
                 conditional_text: bool = False, seed: int = 0):
        self.cache_dir = cache_dir
        self.texture_resolution = texture_resolution
        self.augment = augment
        self.evaluate = evaluate
        self.conditional_class = conditional_class
        self.conditional_text = conditional_text
        # __getitem__ runs on prefetch threads, so augmentation draws are a
        # pure function of (seed, epoch, idx): thread completion order cannot
        # perturb seeded reproducibility (set_epoch advances the stream)
        self._seed = seed
        self._epoch = 0

        self.caption_tokens = None
        self.n_words = 0
        if conditional_text:
            # tokenized caption cache: tokens (N, E, L) int32 (E captions per
            # image, 0-padded) + n_words (the reference reads its equivalent
            # through a pickled text_processor in cache/, main.py:539 path)
            cap = np.load(os.path.join(cache_dir, "captions_tokens.npz"))
            self.caption_tokens = cap["tokens"].astype(np.int32)
            self.n_words = int(cap["n_words"])
            # index -> word table when the cache carries one (written by
            # data/captions.py; used to log captions beside sample grids
            # like the reference's render/caption text, main.py:389-401)
            self.caption_vocab = (
                [str(w) for w in cap["vocab"]] if "vocab" in cap else None
            )

        meta = np.load(os.path.join(cache_dir, "poses_metadata.npz"),
                       allow_pickle=True)
        self.data = meta["data"].item()
        n = len(self.data["path"])

        pg_files = glob.glob(
            os.path.join(cache_dir,
                         f"pseudogt_{texture_resolution}x{texture_resolution}",
                         "*.npz")
        )
        if len(pg_files) == 0:
            self.has_pseudo_ground_truth = False
        elif len(pg_files) == n:
            self.has_pseudo_ground_truth = True
        else:
            raise ValueError(
                "Found pseudo-ground-truth directory, but number of files does "
                f"not match! Expected {n}, got {len(pg_files)}."
            )
        if not self.has_pseudo_ground_truth and not evaluate:
            raise ValueError(
                "Training a model requires the pseudo-ground-truth to be set "
                "up beforehand."
            )

    # per-dataset suggestions -------------------------------------------------
    def name(self) -> str:
        raise NotImplementedError

    def suggest_truncation_sigma(self) -> float:
        raise NotImplementedError

    def suggest_num_discriminators(self) -> int:
        raise NotImplementedError

    def suggest_mesh_template(self):
        """(segments, rings) of the procedural template for this dataset."""
        raise NotImplementedError

    # data access --------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.data["path"])

    _npz_pool = None

    @classmethod
    def _load_npz(cls, path: str) -> dict:
        """Native multithreaded decoder when built (native/fastloader.cpp),
        numpy otherwise."""
        if cls._npz_pool is None:
            from im23d_tpu.data.fastloader import NpzPool

            cls._npz_pool = NpzPool(n_threads=4)
        pool = cls._npz_pool
        return pool.get(pool.submit(path), path)

    def load_pseudo_ground_truth(self, idx: int, with_image: bool = True) -> dict:
        res = self.texture_resolution
        raw = self._load_npz(
            os.path.join(self.cache_dir, f"pseudogt_{res}x{res}", f"{idx}.npz")
        )["data"].item()
        # cache layout is NCHW fp16 -> NHWC; textures stay fp16 on the host
        # (half the host->device traffic; the trainer casts on device)
        to_nhwc = lambda a: np.ascontiguousarray(np.asarray(a).transpose(1, 2, 0))
        out = {
            "texture": to_nhwc(raw["texture"]),
            "texture_alpha": to_nhwc(raw["texture_alpha"]),
            "mesh": to_nhwc(raw["mesh"]),
        }
        if with_image:
            # float32 view of the photo — only eval/viz consumers need it
            # (the GAN train path drops it, so skip the ~3 MB convert there)
            out["image"] = to_nhwc(raw["image"][:3]).astype(np.float32) / 2.0 + 0.5
        return out

    def set_epoch(self, epoch: int) -> None:
        """Advance the per-item augmentation streams (one call per epoch).

        Iterators that prefetch across epoch boundaries should instead pass
        ``epoch`` to :meth:`item` — that form has no shared mutable state.
        """
        self._epoch = int(epoch)

    def _item_rng(self, idx: int, epoch: int | None = None) -> np.random.Generator:
        e = self._epoch if epoch is None else int(epoch)
        return np.random.default_rng(
            np.random.SeedSequence([self._seed, e, int(idx)])
        )

    def __getitem__(self, idx: int) -> dict:
        return self.item(idx, None)

    def item(self, idx: int, epoch: int | None) -> dict:
        """Like ``__getitem__`` but with the augmentation epoch passed
        explicitly — a pure function of (seed, epoch, idx), safe for
        concurrent iterators over the same dataset object."""
        item = self.load_pseudo_ground_truth(idx, with_image=False)
        rng = self._item_rng(idx, epoch)
        mirror = self.augment and not self.evaluate and rng.integers(2) == 1
        e = (
            int(rng.integers(self.caption_tokens.shape[1]))
            if self.caption_tokens is not None else 0
        )
        if mirror:
            item = {k: mirror_tex_nhwc(v) for k, v in item.items()}
        if self.conditional_class:
            item["c"] = np.asarray(self.classes[idx], np.int32)
        if self.caption_tokens is not None:
            item["caption"] = self.caption_tokens[idx, e]
        item["idx"] = np.int32(idx)
        return item


class CubGANDataset(PseudoGTDataset):
    """CUB with 200-class labels (reference ``CubDataset``)."""

    def __init__(self, cache_dir: str, cub_path: str | None = None, **kw):
        super().__init__(cache_dir, **kw)
        self.n_classes = (200,)
        if cub_path is None:
            cub_path = os.path.join(
                os.path.dirname(os.path.dirname(cache_dir)), "datasets", "cub",
                "CUB_200_2011",
            )
        with open(os.path.join(cub_path, "images.txt")) as fh:
            ids = {k: v.strip() for k, v in (line.split(" ") for line in fh)}
        with open(os.path.join(cub_path, "image_class_labels.txt")) as fh:
            cls = {k: int(v.strip()) - 1 for k, v in (line.split(" ") for line in fh)}
        fname_to_class = {ids[k]: c for k, c in cls.items()}
        self.classes = [
            np.array([fname_to_class[str(p)]]) for p in self.data["path"]
        ]

    def name(self):
        return "cub"

    def suggest_truncation_sigma(self):
        if self.conditional_class:
            return 0.25
        return 1.0

    def suggest_num_discriminators(self):
        return 3 if self.texture_resolution >= 512 else 2

    def suggest_mesh_template(self):
        return (32, 16)  # uvsphere_16rings


class Pascal3DGANDataset(PseudoGTDataset):
    """Pascal3D+ cars, ImageNet subset, shape/color labels
    (reference ``Pascal3DPlusDataset``)."""

    def __init__(self, cache_dir: str, labels_csv: str | None = None,
                 conditional_color: bool = False, **kw):
        super().__init__(cache_dir, **kw)
        self.conditional_color = conditional_color
        paths = [str(p) for p in self.data["path"]]
        self.imagenet_indices = [
            i for i, p in enumerate(paths) if p.startswith("car_imagenet")
        ]
        self.data = dict(self.data)
        self.data["path"] = [paths[i] for i in self.imagenet_indices]
        for key in ("scale", "translation", "rotation"):
            self.data[key] = np.asarray(self.data[key])[self.imagenet_indices]

        if labels_csv is None:
            labels_csv = os.path.join(
                os.path.dirname(os.path.dirname(cache_dir)), "datasets", "p3d",
                "p3d_labels.csv",
            )
        mapping, self.n_classes = self._load_labels(labels_csv)
        filenames = [p.split("/")[-1] for p in self.data["path"]]
        self.classes = [mapping[f] for f in filenames]

    @staticmethod
    def _load_labels(path: str):
        with open(path) as fh:
            lines = fh.readlines()[1:]
        filenames, colors1, colors2, shapes = [], [], [], []
        for line in lines:
            filename, col1, col2, shape, _ = line.strip().split(",")
            filenames.append(filename)
            colors1.append(col1)
            colors2.append(col2)
            shapes.append(shape)
        c1 = {x: i for i, x in enumerate(sorted(set(colors1)))}
        c2 = {x: i for i, x in enumerate(sorted(set(colors2)))}
        sh = {x: i for i, x in enumerate(sorted(set(shapes)))}
        mapping = {
            f: np.array([sh[s], c1[a], c2[b]])
            for f, s, a, b in zip(filenames, shapes, colors1, colors2)
        }
        return mapping, (len(sh), len(c1), len(c2))

    def load_pseudo_ground_truth(self, idx: int, with_image: bool = True) -> dict:
        return super().load_pseudo_ground_truth(
            self.imagenet_indices[idx], with_image
        )

    def name(self):
        return "p3d"

    def suggest_truncation_sigma(self):
        if self.conditional_class and self.conditional_color:
            return 0.5
        if self.conditional_class:
            return 0.75
        return 1.0

    def suggest_num_discriminators(self):
        return 2

    def suggest_mesh_template(self):
        return (32, 31)  # uvsphere_31rings


class EvalDataset:
    """Pose + class + pseudo-gt view for FID evaluation
    (reference ``AbstractDatasetForEvaluation``)."""

    def __init__(self, dataset: PseudoGTDataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx: int) -> dict:
        d = self.dataset.data
        item = dict(
            scale=np.asarray(d["scale"][idx], np.float32),
            translation=np.asarray(d["translation"][idx], np.float32),
            rotation=np.asarray(d["rotation"][idx], np.float32),
            idx=np.int32(idx),
        )
        if self.dataset.conditional_class:
            item["c"] = np.asarray(self.dataset.classes[idx], np.int32)
        if self.dataset.has_pseudo_ground_truth:
            item.update(self.dataset.load_pseudo_ground_truth(idx))
        return item


def gan_batch_iterator(dataset: PseudoGTDataset, batch_size: int,
                       shuffle: bool = True, seed: int = 0,
                       num_workers: int = 4) -> Iterator[dict]:
    """Epoch iterator producing GANTrainer batches:
    texture (B,H,W,3), alpha (B,H,W,1), mesh (B,h,w,3), optional c.

    ``num_workers`` threads decode the per-item npz caches and assemble
    batches ahead of the consumer (the reference uses 4 DataLoader worker
    processes, ``main.py:140-141``)."""
    from im23d_tpu.data.prefetch import prefetched_batches

    rng = np.random.RandomState(seed)
    epoch = seed  # captured locally: concurrent iterators cannot clobber it
    set_epoch = getattr(dataset, "set_epoch", None)
    if set_epoch is not None:
        set_epoch(epoch)  # keep direct dataset[i] consumers in sync
    item_at = getattr(dataset, "item", None)
    order = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(order)
    end = len(order) - (len(order) % batch_size)
    index_batches = [
        order[start : start + batch_size] for start in range(0, end, batch_size)
    ]

    def build(idx):
        items = [
            item_at(int(i), epoch) if item_at is not None else dataset[int(i)]
            for i in idx
        ]
        batch = dict(
            texture=np.stack([it["texture"] for it in items]),
            alpha=np.stack([it["texture_alpha"] for it in items]),
            mesh=np.stack([it["mesh"] for it in items]),
        )
        if "c" in items[0]:
            batch["c"] = np.stack([it["c"] for it in items])
        if "caption" in items[0]:
            batch["caption"] = np.stack([it["caption"] for it in items])
        return batch

    yield from prefetched_batches(index_batches, build, num_workers)
