"""GAN evaluation: FID of rendered generated meshes + sample export.

Parity: reference ``evaluate_fid`` (``code/main.py:188-412``) and the
``--save_results`` export path (``main.py:836-896``):

* truncation-trick sampling of z,
* EMA-generator inference,
* render each generated (mesh, texture) under a dataset pose at 299²,
* InceptionV3 activations -> FID vs precomputed real stats,
* three variants: combined, real-mesh + fake-texture, fake-mesh +
  real-texture (``main.py:295-314``),
* mesh/.obj/.mtl/.png export for ``--save_results``.
"""

from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.metrics.fid import calculate_stats, frechet_distance
from im23d_tpu.ops.quaternion import qrot
from im23d_tpu.render.renderer import render_mesh


def render_generated(template, renderer_res, mesh_map, texture, scale,
                     translation, rotation):
    """Pose + render a generated UV mesh/texture (``main.py:283-293``)."""
    vtx = template.get_vertex_positions(mesh_map)
    rot = rotation / jnp.maximum(
        jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
    )
    vtx = qrot(rot, scale.reshape(-1, 1, 1) * vtx) + translation[:, None, :]
    vtx = vtx * jnp.asarray([1.0, -1.0, -1.0], vtx.dtype)
    tex01 = texture / 2.0 + 0.5  # generator outputs [-1, 1]
    uvs, tex_adj = template.adjust_uv_and_texture(tex01)
    image, alpha, _ = render_mesh(
        vtx, template.faces_j, uvs, template.face_uvs_j, tex_adj,
        renderer_res, renderer_res,
    )
    return image, alpha


class FIDEvaluator:
    """Renders generated samples and scores FID against real statistics."""

    def __init__(self, gan_trainer, template, evaluation_res: int = 299,
                 inception_variables=None):
        from im23d_tpu.metrics.inception import InceptionV3Features, init_inception

        self.trainer = gan_trainer
        self.template = template
        self.res = evaluation_res
        if inception_variables is not None:
            # skip the ~24M-param init when pretrained weights are supplied
            self.model = InceptionV3Features()
            self.variables = inception_variables
            self.calibrated = True
        else:
            self.model, self.variables = init_inception()
            # deterministic random-init extractor: FID numbers are self-
            # consistent for regression tracking but NOT comparable to
            # published scores — metric names must say so
            self.calibrated = False
        self._render = jax.jit(
            lambda mesh_map, tex, s, t, r: render_generated(
                template, evaluation_res, mesh_map, tex, s, t, r
            )
        )
        self._act = jax.jit(lambda img: self.model.apply(self.variables, img))

    def activations_for_batches(self, eval_batches: Iterable[dict],
                                truncation_sigma: float = 1e9,
                                variants: bool = False, rng=None):
        """Generate + render + embed. Returns activations dict with keys
        'combined' (+ 'mesh_only', 'texture_only' when variants and pseudo-gt
        textures/meshes are present in the batches)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        acts: dict[str, list] = {"combined": []}
        if variants:
            acts["texture_only"] = []
            acts["mesh_only"] = []
        i = 0
        full_n = None
        for batch in eval_batches:
            n = batch["rotation"].shape[0]
            if full_n is None:
                full_n = n
            elif n < full_n:
                # pad the tail batch to the compiled shape and slice the
                # activations back to n below — every dataset image scores
                # (the reference pads to a GPU multiple, main.py:256-281)
                # without compiling a second executable for the tail shape
                batch = {
                    k: np.concatenate([v, np.repeat(v[:1], full_n - n, 0)])
                    for k, v in batch.items()
                }
            rng_i = jax.random.fold_in(rng, i)
            z = self.trainer.truncation_sample(
                rng_i, batch["rotation"].shape[0], truncation_sigma
            )
            c = jnp.asarray(batch["c"]) if "c" in batch else None
            tex, mesh_map = self.trainer.generate(z, c)
            s = jnp.asarray(batch["scale"]).reshape(-1)
            t = jnp.asarray(batch["translation"])
            r = jnp.asarray(batch["rotation"])
            img, _ = self._render(mesh_map, tex, s, t, r)
            acts["combined"].append(np.asarray(self._act(img))[:n])
            if variants and "texture" in batch and "mesh" in batch:
                # cache tensors are fp16; the render path (Pallas sampler)
                # takes f32/bf16 only — upcast at the eval boundary
                real_tex = jnp.asarray(batch["texture"], jnp.float32)
                real_mesh = jnp.asarray(batch["mesh"], jnp.float32)
                img_t, _ = self._render(real_mesh, tex, s, t, r)
                acts["texture_only"].append(np.asarray(self._act(img_t))[:n])
                img_m, _ = self._render(mesh_map, real_tex, s, t, r)
                acts["mesh_only"].append(np.asarray(self._act(img_m))[:n])
            i += 1
        return {k: np.concatenate(v, axis=0) for k, v in acts.items() if v}

    @property
    def metric_prefix(self) -> str:
        """'fid' with real pretrained weights, 'fid_uncalibrated' with the
        deterministic random-init extractor (regression-only numbers)."""
        return "fid" if self.calibrated else "fid_uncalibrated"

    @staticmethod
    def fid_against_stats(activations: np.ndarray, m_real, s_real) -> float:
        if activations.shape[-1] != len(m_real):
            raise ValueError(
                f"feature dim {activations.shape[-1]} != precomputed stats "
                f"dim {len(m_real)}: the cache stats were computed with a "
                "different extractor (uncalibrated runs use 288-d Mixed_5d "
                "features, pretrained-weight runs 2048-d pool3) — "
                "regenerate the cache's precomputed_fid_*.npz"
            )
        m, s = calculate_stats(activations)
        return frechet_distance(m, s, m_real, s_real)


def load_precomputed_stats(path: str):
    """Load reference-format FID stats npz (tril-packed covariance,
    ``main.py:170-184``)."""
    stats = np.load(path, allow_pickle=True)
    m = stats["stats_m"]
    s = stats["stats_s"]
    s = s + np.triu(s.T, 1)
    return m, s, int(stats["num_images"]), int(stats["resolution"])


def load_val_stats(cache_dir: str, evaluation_res: int = 299):
    """(m, s, num_images) from the testval stats cache, or None when the
    dataset ships no validation split (reference loads these for CUB only,
    ``main.py:177-184``)."""
    path = os.path.join(
        cache_dir,
        f"precomputed_fid_{evaluation_res}x{evaluation_res}_testval.npz",
    )
    if not os.path.exists(path):
        return None
    m, s, n, _ = load_precomputed_stats(path)
    return m, s, n


def val_fids(acts: dict, val_stats, rng: np.random.RandomState) -> dict:
    """Validation-split FIDs: subsample the fake activations down to the
    val set's size (the same indices across variants) and score against the
    testval stats (reference ``main.py:359-376``)."""
    m_v, s_v, n_v = val_stats
    n = len(acts["combined"])
    sel = rng.choice(n, size=min(n_v, n), replace=False)
    return {
        f"{key}_val": FIDEvaluator.fid_against_stats(act[sel], m_v, s_v)
        for key, act in acts.items()
    }


def export_results(gan_trainer, template, out_dir: str, n_samples: int = 16,
                   truncation_sigma: float = 1.0, classes=None,
                   poses=None, caption_tokens=None, render_res: int = 512,
                   grid_path: str | None = None, rng=None) -> list[str]:
    """--save_results path (reference ``main.py:836-896``): export
    obj/mtl/png per sample (Y-up, like the reference's Y/Z swap) and, when
    ``poses`` (dict of scale/translation/rotation arrays) are given, render
    the batch under those dataset poses on a white background, 2x average-
    pooled for anti-aliasing, into a single grid PNG.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    z = gan_trainer.truncation_sample(rng, n_samples, truncation_sigma)
    c = None
    if classes is not None:
        c = jnp.asarray(classes, jnp.int32)
        if c.ndim == 1:
            c = c[:, None]
    tex, mesh_map = gan_trainer.generate(z, c, caption_tokens=caption_tokens)
    vtx = template.get_vertex_positions(mesh_map)
    files = []
    tex01 = np.asarray(tex / 2.0 + 0.5)
    vtx_obj = np.asarray(vtx)[:, :, [0, 2, 1]]  # swap Y/Z: result is Y-up
    for i in range(n_samples):
        prefix = os.path.join(out_dir, f"mesh_{i}")
        template.export_obj(prefix, vtx_obj[i], tex01[i])
        files.append(prefix + ".obj")

    if poses is not None:
        img, alpha = jax.jit(
            lambda m, t, s, tr, r: render_generated(
                template, render_res, m, t, s, tr, r
            )
        )(
            mesh_map, tex,
            jnp.asarray(poses["scale"], jnp.float32).reshape(-1),
            jnp.asarray(poses["translation"], jnp.float32),
            jnp.asarray(poses["rotation"], jnp.float32),
        )
        img = np.asarray(img)
        alpha = np.asarray(alpha)
        img = np.where(alpha > 0, img, 1.0)  # white background
        # 2x average-pool anti-aliasing (reference avg_pool2d(image, 2))
        H = img.shape[1] // 2 * 2
        img = img[:, :H, :H]
        img = img.reshape(img.shape[0], H // 2, 2, H // 2, 2, -1).mean((2, 4))
        from im23d_tpu.core.metrics_logger import tile_grid

        grid = tile_grid(img, ncol=min(8, img.shape[0]), fill=1.0)
        from PIL import Image

        grid_path = grid_path or (out_dir.rstrip("/\\") + ".png")
        Image.fromarray(
            (np.clip(grid, 0, 1) * 255).astype(np.uint8)
        ).save(grid_path)
        files.append(grid_path)
    return files
