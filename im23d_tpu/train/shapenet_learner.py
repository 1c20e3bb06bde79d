"""ShapeNet unsupervised trainer: jitted SPMD train/eval steps + loop.

Functional re-design of the reference ``Learner``
(``code/training_test_shape_net.py:32-179``):

* AdamW with the same hyperparameters (``:59-60``), linear p/sigma schedules
  (``parameter_adjustment``, ``:21-29``) — but the schedule values are traced
  scalars derived from the step counter inside the compiled step, so the
  whole 130k-step run is ONE XLA executable (the reference mutates module
  attributes from Python each step).
* Data parallel over a jax.sharding mesh: batch axis sharded, params
  replicated; XLA inserts the ICI gradient all-reduce.
* Checkpoints {params, opt_state, step} via orbax
  (reference: ``torch.save`` dict, ``:168-171``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from im23d_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from im23d_tpu.core.metrics_logger import MetricsLogger
from im23d_tpu.losses.effective import unsupervised_loss
from im23d_tpu.models.pointcloud_nets import UnsupervisedPart
from im23d_tpu.ops.pointcloud import keep_mask
from im23d_tpu.parallel.mesh import (
    make_data_mesh,
    batch_sharded,
    make_mesh,
    replicated,
    shard_batch_pytree,
)


@dataclasses.dataclass(frozen=True)
class ShapeNetConfig:
    """Per-category run config (reference ``__main__`` blocks, ``:182-237``)."""

    image_size: int = 128
    voxel_size: int = 64
    num_points: int = 8000
    num_views: int = 5
    num_candidates: int = 4
    batch_size: int = 24
    learning_rate: float = 1e-3
    weight_decay: float = 1e-3
    total_steps: int = 130_000
    p_schedule: tuple[float, float] = (0.07, 1.0)
    sigma_schedule: tuple[float, float] = (3.0, 0.2)
    student_weight: float = 20.0
    eval_every: int = 13_000
    log_every: int = 50
    seed: int = 100
    # encoder / pose-trunk compute dtype ("auto" = bfloat16 on TPU); the
    # point-cloud, scale and quaternion heads and the whole projection loss
    # stay float32 (see models/pointcloud_nets.py)
    compute_dtype: str = "auto"

    @staticmethod
    def chairs() -> "ShapeNetConfig":
        return ShapeNetConfig()

    @staticmethod
    def planes() -> "ShapeNetConfig":
        return ShapeNetConfig(
            image_size=64, voxel_size=32, num_points=4000, batch_size=16,
            learning_rate=1e-4, total_steps=30_000,
            p_schedule=(0.256, 1.0), sigma_schedule=(2.44, 0.2),
            eval_every=10_000,
        )

    @staticmethod
    def cars() -> "ShapeNetConfig":
        return ShapeNetConfig(
            image_size=64, voxel_size=32, num_points=4000, batch_size=16,
            learning_rate=1e-4, total_steps=50_000,
            p_schedule=(0.2095, 1.0), sigma_schedule=(2.58, 0.2),
            eval_every=10_000,
        )


def _interp(schedule: tuple[float, float], frac: jnp.ndarray) -> jnp.ndarray:
    lo, hi = schedule
    return lo * (1.0 - frac) + hi * frac


class ShapeNetLearner:
    """param_shardings: optional callable (path_str, leaf) -> PartitionSpec
    for tensor-parallel parameter layouts; None leaves a param replicated."""

    def __init__(self, config: ShapeNetConfig, workdir: str | None = None,
                 mesh=None, param_shardings=None):
        self.cfg = config
        self.workdir = workdir
        self.param_shardings = param_shardings
        self.mesh = mesh if mesh is not None else make_data_mesh(config.batch_size)
        dt = config.compute_dtype
        if dt == "auto":
            dt = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.model = UnsupervisedPart(
            num_points=config.num_points,
            num_candidates=config.num_candidates,
            num_views=config.num_views,
            compute_dtype=dt,
        )
        self._base_rng = jax.random.PRNGKey(config.seed)
        self.state = self._init_state()
        self._train_step = self._build_step(training=True)
        self._eval_step = self._build_step(training=False)
        self.logger = MetricsLogger(workdir, "shapenet") if workdir else None

    # -- state ------------------------------------------------------------

    def _init_state(self) -> train_state.TrainState:
        cfg = self.cfg
        imgs = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        pose_imgs = jnp.zeros(
            (cfg.num_views, cfg.image_size, cfg.image_size, 3), jnp.float32
        )
        params = jax.jit(self.model.init)(self._base_rng, imgs, pose_imgs)
        tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
        state = train_state.TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx
        )
        state = jax.device_put(state, replicated(self.mesh))
        if self.param_shardings is not None:
            from jax.sharding import NamedSharding

            def place(path, leaf):
                spec = self.param_shardings(jax.tree_util.keystr(path), leaf)
                if spec is None:
                    return leaf
                return jax.device_put(leaf, NamedSharding(self.mesh, spec))

            state = state.replace(
                params=jax.tree_util.tree_map_with_path(place, state.params)
            )
        return state

    # -- compiled steps ----------------------------------------------------

    def _schedules(self, step: jnp.ndarray):
        frac = jnp.clip(
            step.astype(jnp.float32) / float(self.cfg.total_steps), 0.0, 1.0
        )
        return _interp(self.cfg.p_schedule, frac), _interp(
            self.cfg.sigma_schedule, frac
        )

    @staticmethod
    def _normalize(batch):
        """uint8 batches (PNG-native) are normalized on device: 4x less
        host->device traffic, which dominates the step over a remote tunnel."""
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) / 255.0
            if x.dtype == jnp.uint8 else x,
            batch,
        )

    def _loss_fn(self, params, batch, rng, p, sigma, training):
        cfg = self.cfg
        batch = self._normalize(batch)
        outputs = self.model.apply(params, batch["images"], batch["pose_input"])
        B = batch["images"].shape[0]
        keep_w = keep_mask(rng, B, cfg.num_points, p)
        losses, aux = unsupervised_loss(
            outputs,
            batch["masks"],
            sigma,
            keep_w,
            cfg.num_views,
            voxel_size=cfg.voxel_size,
            student_weight=cfg.student_weight,
            training=training,
        )
        return losses["total_loss"], (losses, aux)

    def _build_step(self, training: bool):
        mesh = self.mesh
        batch_shd = batch_sharded(mesh)
        repl = replicated(mesh)

        base_rng = self._base_rng

        if training:

            def step_fn(state, batch):
                # rng derived from the traced step counter: no host-side
                # int(state.step) fetch (a full device sync per step on the
                # remote-TPU path) and the whole run stays one executable
                rng = jax.random.fold_in(base_rng, state.step)
                p, sigma = self._schedules(state.step)
                grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
                (_, (losses, aux)), grads = grad_fn(
                    state.params, batch, rng, p, sigma, True
                )
                new_state = state.apply_gradients(grads=grads)
                return new_state, losses, aux["min_indexes"]

            # state sharding is inferred from the actual arrays so tensor-
            # parallel parameter layouts (param_shardings) are respected
            return jax.jit(
                step_fn,
                in_shardings=(None, batch_shd),
                donate_argnums=(0,),
            )

        def eval_fn(state, batch):
            rng = jax.random.fold_in(base_rng, 2**30 + state.step)
            p, sigma = self._schedules(state.step)
            _, (losses, _) = self._loss_fn(
                state.params, batch, rng, p, sigma, False
            )
            return losses

        return jax.jit(eval_fn, in_shardings=(None, batch_shd))

    # -- public API ---------------------------------------------------------

    def train_step(self, batch: dict, already_on_device: bool = False) -> dict:
        if not already_on_device:
            batch = shard_batch_pytree(batch, self.mesh)
        self.state, losses, min_idx = self._train_step(self.state, batch)
        self._last_min_idx = min_idx
        return losses

    def eval_step(self, batch: dict) -> dict:
        batch = shard_batch_pytree(batch, self.mesh)
        return self._eval_step(self.state, batch)

    def save(self, workdir: str | None = None, tag=None) -> str:
        """tag=None -> permanent numbered checkpoint; tag='latest' -> rolling
        overwrite (two-tier save scheme)."""
        workdir = workdir or self.workdir
        tree = dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            step=int(self.state.step),
        )
        step = int(self.state.step) if tag is None else tag
        return save_checkpoint(workdir, step, tree, block=tag is None)

    def restore(self, workdir: str | None = None, step: int | None = None):
        from im23d_tpu.core.checkpoint import resolve_step

        workdir = workdir or self.workdir
        step = resolve_step(workdir, step)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {workdir}")
        target = dict(
            params=self.state.params,
            opt_state=self.state.opt_state,
            step=0,
        )
        tree = restore_checkpoint(workdir, step, target)
        self.state = self.state.replace(
            params=tree["params"],
            opt_state=tree["opt_state"],
            step=jnp.asarray(tree["step"], jnp.int32),
        )
        self.state = jax.device_put(self.state, replicated(self.mesh))

    def put_batch(self, batch: dict):
        """Async host->device transfer (overlaps with the running step)."""
        return shard_batch_pytree(batch, self.mesh)

    def fit(self, train_iter: Iterator[dict], num_steps: int | None = None,
            valid_batches=None) -> dict:
        """Run the training loop; returns the final loss dict.

        The next batch's host->device transfer is dispatched before the
        current step is consumed, hiding transfer latency behind compute.
        """
        cfg = self.cfg
        num_steps = num_steps or cfg.total_steps
        losses: dict[str, Any] = {}
        t0 = time.time()
        pending = self.put_batch(next(train_iter))
        # host-side step mirror: int(self.state.step) would force a device
        # sync (a full RPC round trip on remote TPU) every iteration
        step0 = int(self.state.step)
        for i in range(num_steps):
            batch_dev = pending
            if i + 1 < num_steps:
                pending = self.put_batch(next(train_iter))
            losses = self.train_step(batch_dev, already_on_device=True)
            step = step0 + i + 1
            if self.logger and step % cfg.log_every == 0:
                host = {k: float(v) for k, v in losses.items()}
                host["steps_per_sec"] = cfg.log_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                self.logger.log(step, host)
                self.logger.log_histogram(step, "other/predictors", self._last_min_idx)
            if step % cfg.eval_every == 0:
                if valid_batches is not None:
                    self.evaluate(valid_batches)
                if self.logger:
                    self.log_projection_grid(batch_dev, step)
                if self.workdir:
                    self.save()
        return {k: float(v) for k, v in losses.items()}

    def _grid_fn(self):
        """Jitted projection-grid renderer, built once and cached.

        An unjitted model apply runs op-by-op (hundreds of RPC round trips
        on a remote TPU — measured ~3 min for one grid at the chairs
        config); jitting makes the periodic grid a single executable.
        """
        if getattr(self, "_grid_jit", None) is not None:
            return self._grid_jit

        from im23d_tpu.losses.effective import unsupervised_loss
        from im23d_tpu.ops.sampling import resize_bilinear

        def grid(state, batch):
            nb = self._normalize(batch)
            out = self.model.apply(
                state.params, nb["images"], nb["pose_input"]
            )
            _, sigma = self._schedules(state.step)
            _, aux = unsupervised_loss(
                out, nb["masks"], sigma, None, self.cfg.num_views,
                voxel_size=self.cfg.voxel_size, training=False,
            )
            proj = aux["projection"][:8]
            masks_s = resize_bilinear(
                nb["masks"][:8], proj.shape[1], proj.shape[2]
            )
            return proj, masks_s

        self._grid_jit = jax.jit(grid)
        return self._grid_jit

    def log_projection_grid(self, batch, step: int) -> None:
        """Render the current student projections next to the target masks
        (reference ``generate_image_projections``, ``:115-134``)."""
        import numpy as np

        proj, masks_s = jax.device_get(self._grid_fn()(self.state, batch))
        # target masks on the top row, projections below
        self.logger.log_images(
            step, "renders",
            np.concatenate([np.asarray(masks_s), np.asarray(proj)], axis=0),
            nrow=8,
        )

    def evaluate(self, valid_batches) -> dict:
        import numpy as np

        all_losses = []
        for batch in valid_batches() if callable(valid_batches) else valid_batches:
            out = self.eval_step(batch)
            all_losses.append({k: float(v) for k, v in out.items()})
        if not all_losses:
            return {}
        means = {
            k: float(np.mean([d[k] for d in all_losses])) for k in all_losses[0]
        }
        if self.logger:
            self.logger.log(int(self.state.step), {f"valid/{k}": v for k, v in means.items()})
        return means
