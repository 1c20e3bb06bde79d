"""Mesh-estimation trainer: renderer-in-the-loop reconstruction.

Functional re-design of the reference driver (``code/run_reconstruction.py``):

* joint Adam over the network and per-image ``DatasetParams``
  (translation/scale deltas, optional z0 perspective; ``:338-345``)
* ``transform_vertices`` (``:237-252``): pose the predicted mesh with
  ground-truth scale/translation/rotation + learnable deltas, flip (y, z),
  optional z0 perspective factor
* loss = MSE/L1 on RGBA + flatness with warm-up coefficient 10 -> 1
  decaying 0.1/iteration (``:356,438-440``)
* LR halving every ``lr_decay_every`` epochs (``:468-470``)
* evaluation: recon loss, flat loss, mIoU (``evaluate_all``, ``:255-319``)
* pseudo-ground-truth generation (``:499-658``): inverse-render photos into
  UV space, visibility from ``jax.grad`` w.r.t. the texture, per-image npz
  caches + poses metadata + precomputed FID stats, byte-layout compatible
  with the reference cache files.
"""

from __future__ import annotations

import dataclasses
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import optax

from im23d_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.losses.gan_losses import flatness_loss
from im23d_tpu.metrics.iou import mean_iou
from im23d_tpu.models.reconstruction import DatasetParams, ReconstructionNetwork
from im23d_tpu.ops.quaternion import qrot
from im23d_tpu.ops.sampling import resize_bilinear
from im23d_tpu.parallel.mesh import (
    make_data_mesh,
    batch_sharded,
    make_mesh,
    replicated,
    shard_batch_pytree,
)
from im23d_tpu.render.renderer import render_mesh


@dataclasses.dataclass(frozen=True)
class ReconConfig:
    """Defaults = reference argparse (``run_reconstruction.py:33-67``)."""

    image_resolution: int = 256
    texture_resolution: int = 128
    mesh_resolution: int = 32
    symmetric: bool = True
    loss: str = "mse"  # mse | l1
    mesh_regularization: float = 5e-5
    optimize_deltas: bool = True
    optimize_z0: bool = False
    lr: float = 1e-4
    lr_dataset: float = 1e-4
    lr_decay_every: int = 250
    epochs: int = 1000
    batch_size: int = 50
    seed: int = 0
    # conv/dense compute dtype of the reconstruction network (see
    # ReconstructionNetwork.compute_dtype); losses, DatasetParams, the
    # renderer inputs and both network outputs stay float32
    compute_dtype: str = "float32"


def transform_vertices(vtx, scale, translation, rotation,
                       translation_delta=0.0, scale_delta=0.0, z0=None):
    """Pose predicted vertices into screen space (reference ``:237-252``)."""
    s = (scale + scale_delta).reshape(-1, 1, 1)
    v = qrot(rotation / jnp.maximum(
        jnp.linalg.norm(rotation, axis=-1, keepdims=True), 1e-12
    ), s * vtx)
    if not isinstance(translation_delta, (int, float)):
        translation = translation + translation_delta
    v = v + translation[:, None, :]
    v = v * jnp.asarray([1.0, -1.0, -1.0], v.dtype)
    if z0 is not None:
        z = v[..., 2:]
        factor = (z0[:, None] + z / 2.0) / (z0[:, None] - z / 2.0)
        v = jnp.concatenate([v[..., :2] * factor, z], axis=-1)
    return v


class ReconTrainer:
    def __init__(self, config: ReconConfig, dataset_size: int,
                 template: MeshTemplate | None = None, mesh=None,
                 workdir: str | None = None):
        self.cfg = config
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else make_data_mesh(config.batch_size)
        self.template = template if template is not None else MeshTemplate()
        self.dataset_size = dataset_size

        self.model = ReconstructionNetwork(
            symmetric=config.symmetric,
            texture_res=config.texture_resolution,
            mesh_res=config.mesh_resolution,
            compute_dtype=config.compute_dtype,
        )
        self.use_dp = config.optimize_deltas or config.optimize_z0
        self.dp_model = (
            DatasetParams(dataset_size, config.optimize_deltas, config.optimize_z0)
            if self.use_dp else None
        )
        self._rng = jax.random.PRNGKey(config.seed)
        self._init_state()
        self._build_steps()
        self.total_it = 0
        self.epoch = 0
        self.flat_warmup = 10.0

    # -- init ---------------------------------------------------------------

    def _init_state(self):
        cfg = self.cfg
        x = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 4))
        variables = jax.jit(
            lambda r, x_: self.model.init(r, x_, train=False)
        )(self._rng, x)
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
        self.opt = self.tx.init(self.params)

        if self.use_dp:
            # flax creates params per executed branch: when both deltas and
            # z0 refinement are on, init both modes and merge the (disjoint)
            # param dicts
            idx0 = jnp.zeros((1,), jnp.int32)
            self.dp_params = {}
            for mode, on in (("deltas", cfg.optimize_deltas),
                             ("z0", cfg.optimize_z0)):
                if on:
                    dpv = jax.jit(
                        lambda r, i, m=mode: self.dp_model.init(r, i, m)
                    )(self._rng, idx0)
                    self.dp_params.update(dpv["params"])
            self.tx_dp = optax.adam(cfg.lr_dataset)
            self.opt_dp = self.tx_dp.init(self.dp_params)
        else:
            self.dp_params = {}
            self.opt_dp = None

        repl = replicated(self.mesh)
        for name in ("params", "batch_stats", "opt", "dp_params", "opt_dp"):
            v = getattr(self, name)
            if v is not None:
                setattr(self, name, jax.device_put(v, repl))

    # -- core forward ---------------------------------------------------------

    def _pose_and_render(self, mesh_map, tex, batch, dp_params, train):
        cfg = self.cfg
        raw_vtx = self.template.get_vertex_positions(mesh_map)
        t_delta, s_delta, z0 = 0.0, 0.0, None
        if self.use_dp and batch.get("idx") is not None:
            if cfg.optimize_deltas:
                t_delta, s_delta = self.dp_model.apply(
                    {"params": dp_params}, batch["idx"], "deltas"
                )
                s_delta = s_delta[:, 0]
            if cfg.optimize_z0:
                z0 = self.dp_model.apply({"params": dp_params}, batch["idx"], "z0")
        vtx = transform_vertices(
            raw_vtx, batch["scale"], batch["translation"], batch["rotation"],
            t_delta, s_delta, z0,
        )
        uvs, tex_adj = self.template.adjust_uv_and_texture(tex)
        res = cfg.image_resolution
        image, alpha, _ = render_mesh(
            vtx, self.template.faces_j, uvs, self.template.face_uvs_j,
            tex_adj, res, res,
            # training renders take the fast bf16 sampling path; eval and
            # pseudo-gt renders keep exact f32 sampling
            fast_sampling=train,
        )
        return raw_vtx, vtx, image, alpha

    def _recon_loss(self, x_fake, x_real, per_sample: bool = False):
        err = x_fake - x_real
        per = jnp.mean(
            jnp.abs(err) if self.cfg.loss == "l1" else err ** 2,
            axis=(1, 2, 3),
        )
        return per if per_sample else jnp.mean(per)

    # -- compiled steps -------------------------------------------------------

    def _build_steps(self):
        cfg = self.cfg
        repl = replicated(self.mesh)
        batch_shd = batch_sharded(self.mesh)

        def step(params, batch_stats, opt, dp_params, opt_dp, batch,
                 flat_coeff, lr_factor):
            def loss_fn(p, dpp):
                (tex, mesh_map), new_vars = self.model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["image"], train=True, mutable=["batch_stats"],
                )
                raw_vtx, _, image, alpha = self._pose_and_render(
                    mesh_map, tex, batch, dpp, True
                )
                x_fake = jnp.concatenate([image, alpha], axis=-1)
                recon = self._recon_loss(x_fake, batch["image"])
                flat = flatness_loss(
                    self.template.compute_normals(raw_vtx), self.template.ff_j
                )
                loss = recon + flat_coeff * flat
                miou = mean_iou(x_fake[..., 3], batch["image"][..., 3])
                return loss, (recon, flat, miou, new_vars["batch_stats"])

            (grads, dp_grads), (recon, flat, miou, new_stats) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, dp_params)
            opt.hyperparams["learning_rate"] = cfg.lr * lr_factor
            updates, new_opt = self.tx.update(grads, opt, params)
            new_params = optax.apply_updates(params, updates)
            if self.use_dp:
                dp_updates, new_opt_dp = self.tx_dp.update(dp_grads, opt_dp, dp_params)
                new_dp = optax.apply_updates(dp_params, dp_updates)
            else:
                new_dp, new_opt_dp = dp_params, opt_dp
            losses = dict(recon_loss=recon, flat_loss=flat, iou=miou)
            return new_params, new_stats, new_opt, new_dp, new_opt_dp, losses

        self._train_step = jax.jit(
            step,
            in_shardings=(repl, repl, repl, repl, repl, batch_shd, None, None),
            donate_argnums=(0, 1, 2, 3, 4),
        )

        def eval_step(params, batch_stats, dp_params, batch, w):
            # w (B,): per-sample validity weights — tail batches of the val
            # set are padded up to the compiled batch shape (static shapes
            # keep one executable; the reference keeps the tail too, its
            # DataLoader does not drop_last on eval)
            tex, mesh_map = self.model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["image"], train=False,
            )
            raw_vtx, _, image, alpha = self._pose_and_render(
                mesh_map, tex, batch, dp_params, False
            )
            x_fake = jnp.concatenate([image, alpha], axis=-1)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            wmean = lambda per_sample: jnp.sum(per_sample * w) / wsum
            recon = wmean(
                self._recon_loss(x_fake, batch["image"], per_sample=True)
            )
            flat = wmean(flatness_loss(
                self.template.compute_normals(raw_vtx), self.template.ff_j,
                per_sample=True,
            ))
            miou = wmean(mean_iou(
                x_fake[..., 3], batch["image"][..., 3], per_sample=True
            ))
            return dict(recon_loss=recon, flat_loss=flat, iou=miou), x_fake

        self._eval_step = jax.jit(
            eval_step, in_shardings=(repl, repl, repl, batch_shd, batch_shd)
        )

        def infer(params, batch_stats, images):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images, train=False
            )

        self._infer = jax.jit(infer, in_shardings=(repl, repl, batch_shd))

    # -- public API -----------------------------------------------------------

    def _lr_factor(self) -> float:
        return 0.5 ** (self.epoch // self.cfg.lr_decay_every)

    def train_step(self, batch: dict) -> dict:
        """batch: image (B,H,W,4), scale (B,), translation (B,3),
        rotation (B,4), idx (B,) int or absent."""
        batch = shard_batch_pytree(batch, self.mesh)
        flat_coeff = jnp.float32(self.cfg.mesh_regularization * self.flat_warmup)
        self.flat_warmup = max(self.flat_warmup - 0.1, 1.0)
        (self.params, self.batch_stats, self.opt, self.dp_params,
         self.opt_dp, losses) = self._train_step(
            self.params, self.batch_stats, self.opt, self.dp_params,
            self.opt_dp, batch, flat_coeff, jnp.float32(self._lr_factor()),
        )
        self.total_it += 1
        return losses

    def eval_step(self, batch: dict, w=None):
        import numpy as np

        if w is None:
            w = np.ones((batch["image"].shape[0],), np.float32)
        batch = shard_batch_pytree(batch, self.mesh)
        w = shard_batch_pytree(w, self.mesh)
        return self._eval_step(self.params, self.batch_stats, self.dp_params,
                               batch, w)

    def predict(self, images):
        """images (B,H,W,4) -> (texture, mesh_map)."""
        return self._infer(self.params, self.batch_stats, jnp.asarray(images))

    def render_multiview(self, raw_vtx, pred_tex, idx: int = 0,
                         angles=(0, 45, 90, 135, 180, 225, 270, 315)):
        """Render one reconstructed mesh from 8 canonical viewpoints and
        arrange a 2x4 grid (reference ``render_multiview``,
        ``run_reconstruction.py:188-221``). Returns (2H, 4W, 3) in [0, 1]."""
        import math

        import numpy as np

        from im23d_tpu.ops.quaternion import qmul

        rad = -90 / 180 * math.pi
        q0 = jnp.asarray([math.cos(-rad / 2), 0.0, 0.0, math.sin(-rad / 2)])
        rad = 110 / 180 * math.pi
        q1 = jnp.asarray([math.cos(-rad / 2), 0.0, math.sin(-rad / 2), 0.0])
        q0 = qmul(q0, q1)
        rots = []
        for angle in angles:
            rad = angle / 180 * math.pi * 0.8
            q = jnp.asarray([math.cos(-rad / 2), 0.0, 0.0, math.sin(-rad / 2)])
            rots.append(qmul(q0, q))
        rot = jnp.stack(rots)  # (8, 4)

        n = rot.shape[0]
        vtx = jnp.broadcast_to(raw_vtx[idx][None], (n, *raw_vtx.shape[1:]))
        tex = jnp.broadcast_to(pred_tex[idx][None], (n, *pred_tex.shape[1:]))
        from im23d_tpu.ops.quaternion import qrot as _qrot

        v = _qrot(rot, vtx) * 0.9
        v = v * jnp.asarray([1.0, -1.0, -1.0])
        uvs, tex_adj = self.template.adjust_uv_and_texture(tex / 2.0 + 0.5)
        res = self.cfg.image_resolution
        image, _, _ = render_mesh(
            v, self.template.faces_j, uvs, self.template.face_uvs_j,
            tex_adj, res, res,
        )
        img = np.asarray(jnp.clip(image, 0.0, 1.0))
        rows = [np.concatenate(list(img[i * 4:(i + 1) * 4]), axis=1)
                for i in range(n // 4)]
        return np.concatenate(rows, axis=0)

    def evaluate(self, batches) -> dict:
        """Weighted means over ALL validation images: a tail batch smaller
        than the compiled batch shape is padded (pads weigh 0), so nothing
        is dropped and no second executable is compiled."""
        import numpy as np

        totals: dict[str, float] = {}
        n = 0
        B = self.cfg.batch_size
        for batch in batches:
            bs = batch["image"].shape[0]
            w = np.ones((bs,), np.float32)
            if 0 < bs % B:
                pad = B - bs % B
                batch = {
                    k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)])
                    for k, v in batch.items()
                }
                w = np.concatenate([w, np.zeros((pad,), np.float32)])
            losses, _ = self.eval_step(batch, w)
            for k, v in losses.items():
                totals[k] = totals.get(k, 0.0) + float(v) * bs
            n += bs
        return {k: v / max(n, 1) for k, v in totals.items()}

    # -- checkpointing ----------------------------------------------------------

    def _state_tree(self):
        return dict(
            params=self.params, batch_stats=self.batch_stats, opt=self.opt,
            dp_params=self.dp_params, opt_dp=self.opt_dp,
            epoch=self.epoch, total_it=self.total_it,
        )

    def save(self, workdir: str | None = None, tag=None) -> str:
        """tag=None -> permanent numbered checkpoint; tag='latest' -> rolling
        overwrite (reference two-tier save scheme, run_reconstruction.py)."""
        step = self.total_it if tag is None else tag
        return save_checkpoint(workdir or self.workdir, step,
                               self._state_tree(), block=tag is None)

    def restore(self, workdir: str | None = None, step: int | None = None):
        from im23d_tpu.core.checkpoint import resolve_step

        workdir = workdir or self.workdir
        step = resolve_step(workdir, step)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {workdir}")
        tree = restore_checkpoint(workdir, step, self._state_tree())
        repl = replicated(self.mesh)
        for k in ("params", "batch_stats", "opt", "dp_params", "opt_dp"):
            if tree[k] is not None:
                setattr(self, k, jax.device_put(tree[k], repl))
        self.epoch = int(tree["epoch"])
        self.total_it = int(tree["total_it"])

    # -- pseudo-ground-truth generation ------------------------------------------

    def generate_pseudogt(self, loader, cache_dir: str, dataset_name: str,
                          pseudogt_resolution: int = 512,
                          inception_resolution: int = 299,
                          paths: list | None = None,
                          val_loader=None,
                          renderer_resolution: int | None = None) -> None:
        """Write the pseudo-gt cache (reference ``:499-658``): per-image npz
        {mesh, texture, texture_alpha, image} fp16 in NCHW layout +
        poses_metadata.npz + precomputed FID stats, matching the reference
        file format so caches interoperate.

        ``renderer_resolution`` overrides the visibility/inverse render
        resolution (reference pins ``max(1024, 2 * pseudogt_res)``,
        ``run_reconstruction.py:506-529``); small CI configs pass a lower
        value to keep the CPU rasterizer cheap."""
        from im23d_tpu.metrics.fid import calculate_stats
        from im23d_tpu.metrics.inception import init_inception
        from im23d_tpu.render.inverse import inverse_render

        cfg = self.cfg
        renderer_res = renderer_resolution or max(1024, 2 * pseudogt_resolution)
        pseudogt_dir = os.path.join(
            cache_dir, f"pseudogt_{pseudogt_resolution}x{pseudogt_resolution}"
        )
        pathlib.Path(pseudogt_dir).mkdir(parents=True, exist_ok=True)

        inception_model, inception_vars = init_inception()

        all_scale, all_translation, all_rotation, all_act, all_path = [], [], [], [], []

        template = self.template

        def render_for_vis(vtx, tex):
            uvs, tex_adj = template.adjust_uv_and_texture(tex)
            image, _, _ = render_mesh(
                vtx, template.faces_j, uvs, template.face_uvs_j, tex_adj,
                renderer_res, renderer_res,
            )
            return image

        vis_fn = jax.jit(
            lambda vtx, tex: jax.grad(
                lambda t: jnp.sum(render_for_vis(vtx, t))
            )(tex)
        )
        inv_fn = jax.jit(
            lambda vtx, hd: inverse_render(template, vtx, hd, pseudogt_resolution)
        )
        act_fn = jax.jit(lambda img: inception_model.apply(inception_vars, img))

        for batch in loader:
            net_image = jnp.asarray(batch["image"])
            tex, mesh_map = self.predict(net_image)
            raw_vtx = template.get_vertex_positions(mesh_map)
            t_delta, s_delta, z0 = 0.0, 0.0, None
            if self.use_dp and batch.get("idx") is not None:
                idx = jnp.asarray(batch["idx"])
                if cfg.optimize_deltas:
                    t_delta, s_delta = self.dp_model.apply(
                        {"params": self.dp_params}, idx, "deltas"
                    )
                    s_delta = s_delta[:, 0]
                if cfg.optimize_z0:
                    z0 = self.dp_model.apply({"params": self.dp_params}, idx, "z0")
            vtx = transform_vertices(
                raw_vtx, jnp.asarray(batch["scale"]),
                jnp.asarray(batch["translation"]), jnp.asarray(batch["rotation"]),
                t_delta, s_delta, z0,
            )
            # texture down-resized so render_res >= 8 * texture_res (:558-565)
            if tex.shape[1] > renderer_res // 8:
                tex = resize_bilinear(
                    tex, renderer_res // 8, renderer_res // 8, align_corners=False
                )
            visibility = vis_fn(vtx, tex)  # (B, th, tw, 3)
            hd = jnp.asarray(batch["hd_image"])
            inv_tex, inv_alpha = inv_fn(vtx, hd)

            mask = resize_bilinear(
                visibility, pseudogt_resolution, pseudogt_resolution,
                align_corners=False,
            )
            mask = jnp.any(mask > 0, axis=-1, keepdims=True).astype(inv_tex.dtype)
            inv_tex = inv_tex * mask
            inv_alpha = inv_alpha * mask

            inception_image = jnp.asarray(batch["inception_image"])
            all_act.append(np.asarray(act_fn(inception_image / 2.0 + 0.5)))
            all_scale.append(np.asarray(batch["scale"]))
            all_translation.append(np.asarray(batch["translation"]))
            all_rotation.append(np.asarray(batch["rotation"]))

            mesh_np = np.asarray(mesh_map)
            tex_np = np.asarray(inv_tex, np.float16)
            alpha_np = np.asarray(inv_alpha, np.float16)
            img_np = np.asarray(inception_image, np.float16)
            for i, idx in enumerate(np.asarray(batch["idx"]).reshape(-1)):
                idx = int(idx)
                if paths is not None:
                    all_path.append(paths[idx])
                pseudogt = {
                    # stored NCHW to match the reference cache layout
                    "mesh": mesh_np[i].transpose(2, 0, 1),
                    "texture": tex_np[i].transpose(2, 0, 1),
                    "texture_alpha": alpha_np[i].transpose(2, 0, 1),
                    "image": img_np[i].transpose(2, 0, 1),
                }
                np.savez_compressed(
                    os.path.join(pseudogt_dir, f"{idx}"), data=pseudogt
                )

        poses_metadata = {
            "scale": np.concatenate(all_scale, axis=0)[:, None],
            "translation": np.concatenate(all_translation, axis=0),
            "rotation": np.concatenate(all_rotation, axis=0),
            "path": all_path,
        }
        np.savez_compressed(
            os.path.join(cache_dir, "poses_metadata"), data=poses_metadata
        )

        act = np.concatenate(all_act, axis=0)
        if dataset_name == "p3d" and all_path:
            keep = [i for i, p in enumerate(all_path) if str(p).startswith("car_imagenet")]
            act = act[keep]
        m_real, s_real = calculate_stats(act)
        np.savez_compressed(
            os.path.join(
                cache_dir,
                f"precomputed_fid_{inception_resolution}x{inception_resolution}_train",
            ),
            stats_m=m_real,
            stats_s=np.tril(s_real.astype(np.float32)),
            num_images=len(act),
            resolution=inception_resolution,
        )
        if dataset_name == "cub" and val_loader is not None:
            val_act = []
            for batch in val_loader:
                img = jnp.asarray(batch["inception_image"])[..., :3]
                val_act.append(np.asarray(act_fn(img / 2.0 + 0.5)))
            val_act = np.concatenate(val_act, axis=0)
            m_real, s_real = calculate_stats(val_act)
            np.savez_compressed(
                os.path.join(
                    cache_dir,
                    f"precomputed_fid_{inception_resolution}x{inception_resolution}_testval",
                ),
                stats_m=m_real,
                stats_s=np.tril(s_real.astype(np.float32)),
                num_images=len(val_act),
                resolution=inception_resolution,
            )
