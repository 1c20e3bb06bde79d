"""UV-space mesh+texture GAN trainer: alternating jitted G/D steps, EMA
generator, hinge loss with critic masking, SPMD data parallelism.

Functional re-design of the reference training driver (``code/main.py``):

* G step every (1 + d_steps_per_g) iterations (``main.py:63,691-728``),
  Adam(lr, betas=(0, 0.9)) (``main.py:587-589``), flat-loss regularization
  (``main.py:696-704``), critic weighting [2, 1] at 512² with 2 critics
  (``main.py:487-490``).
* Fake textures are masked by the real alpha before discrimination
  (``main.py:492-495``).
* EMA generator with the reference's epoch-dependent warm-up alpha
  (``update_generator_running_avg``, ``main.py:428-444``); EMA covers all
  float state (params + norm running stats), like the state_dict loop there.
* Linear LR decay after ``lr_decay_after`` epochs (``main.py:742-747``) via a
  traced lr factor — no recompilation.
* The reference's DataParallel scatter/gather + SyncBN machinery is replaced
  by batch sharding over the mesh; BatchNorm means are global automatically.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import optax

from im23d_tpu.core.checkpoint import restore_checkpoint, save_checkpoint
from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.losses.gan_losses import flatness_loss, gan_loss
from im23d_tpu.models.gan import GANConfig, Generator, MultiScaleDiscriminator
from im23d_tpu.parallel.mesh import (
    make_data_mesh,
    batch_sharded,
    make_mesh,
    replicated,
    shard_batch_pytree,
)


@dataclasses.dataclass(frozen=True)
class GANTrainConfig:
    model: GANConfig = dataclasses.field(default_factory=GANConfig)
    lr_g: float = 1e-4
    lr_d: float = 4e-4
    d_steps_per_g: int = 2
    g_ema_alpha: float = 0.999
    mesh_regularization: float = 1e-4
    loss: str = "hinge"
    epochs: int = 600
    lr_decay_after: int = 1000
    batch_size: int = 32
    seed: int = 0
    # text conditioning (reference --conditional_text path, main.py:51-55;
    # the encoder here is frozen, matching the reference's default
    # pretrained/no-finetune mode, main.py:560-568)
    text_vocab_size: int = 5450
    text_max_length: int = 18


@functools.partial(jax.jit, static_argnums=(1, 2))
def _truncation_sample(rng, n: int, dim: int, sigma):
    z = jax.random.normal(rng, (n, dim))

    def cond(state):
        i, _, z = state
        return (i < 100) & jnp.any(jnp.abs(z) > sigma)

    def body(state):
        i, rng, z = state
        rng, k = jax.random.split(rng)
        znew = jax.random.normal(k, z.shape)
        return i + 1, rng, jnp.where(jnp.abs(z) > sigma, znew, z)

    _, _, z = jax.lax.while_loop(cond, body, (jnp.int32(0), rng, z))
    return z


def _to_compute(batch, dtype):
    """Device-side cast of the fp16 cache-native batch to the compute dtype
    (f32, or bf16 under mixed precision — keeping the 512^2 real textures in
    bf16 halves the HBM traffic of the critic input path)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if x.dtype in (jnp.float16, jnp.bfloat16, jnp.float32) else x,
        batch,
    )


def _tree_ema(avg, new, alpha):
    return jax.tree_util.tree_map(
        lambda a, n: a * alpha + n * (1.0 - alpha), avg, new
    )


class GANTrainer:
    def __init__(self, config: GANTrainConfig, template: MeshTemplate | None = None,
                 mesh=None, workdir: str | None = None):
        self.cfg = config
        self.mcfg = config.model
        self.workdir = workdir
        self.mesh = mesh if mesh is not None else make_data_mesh(config.batch_size)
        self.template = template
        self.use_mesh = not self.mcfg.texture_only
        if self.use_mesh and template is None:
            self.template = MeshTemplate()

        self.generator = Generator(self.mcfg, mesh_head=self.use_mesh)
        self.discriminator = MultiScaleDiscriminator(self.mcfg)
        self.text_encoder = None
        if self.mcfg.conditional_text:
            from im23d_tpu.models.text_encoder import TextEncoder

            self.text_encoder = TextEncoder(
                vocab_size=config.text_vocab_size,
                embedding_dim=self.mcfg.text_embedding_dim,
                hidden_dim=self.mcfg.text_embedding_dim // 2,
            )

        self._rng = jax.random.PRNGKey(config.seed)
        self._init_states()
        self._build_steps()
        self.total_it = 0
        self.epoch = 0
        # loss curves persisted with checkpoints (reference stores g/d_fake/
        # d_real/flat curves in every checkpoint dict, main.py:749-775);
        # appended from the host log points, saved as npz beside the orbax dir
        self.curves: dict[str, list] = {
            "g_loss": [], "flat_loss": [], "d_fake": [], "d_real": [],
        }

    # -- init -------------------------------------------------------------

    def _example_inputs(self):
        B = 2
        cfg = self.mcfg
        z = jnp.zeros((B, cfg.latent_dim))
        c = jnp.zeros((B, 2), jnp.int32) if cfg.conditional_class else None
        self._example_caption = (
            jnp.zeros((B, self.cfg.text_max_length), jnp.int32)
            if cfg.conditional_text else None
        )
        tex_res = cfg.texture_resolution
        x = jnp.zeros((B, tex_res, tex_res, 4))
        mesh_map = (
            jnp.zeros((B, cfg.mesh_resolution, cfg.mesh_resolution, 3))
            if self.use_mesh
            else None
        )
        return z, c, x, mesh_map

    def _init_states(self):
        cfg = self.cfg
        z, c, x, mesh_map = self._example_inputs()
        # jit the inits: eager init dispatches op-by-op, which is minutes of
        # round-trips on a remote TPU tunnel
        caption = None
        if self.text_encoder is not None:
            te_vars = jax.jit(self.text_encoder.init)(
                jax.random.fold_in(self._rng, 7), self._example_caption
            )
            self.te_params = te_vars["params"]
            words, _ = self.text_encoder.apply(te_vars, self._example_caption)
            caption = (words, self._example_caption == 0)
        else:
            self.te_params = {}
        g_vars = jax.jit(
            lambda r, z_, c_, cap: self.generator.init(r, z_, c_, cap, train=False)
        )(self._rng, z, c, caption)
        d_vars = jax.jit(
            lambda r, x_, m_, c_, cap: self.discriminator.init(
                r, x_, m_, c_, train=False, caption=cap
            )
        )(jax.random.fold_in(self._rng, 1), x, mesh_map, c, caption)
        self.g_params = g_vars["params"]
        self.g_stats = g_vars.get("batch_stats", {})
        self.d_params = d_vars["params"]
        self.d_stats = d_vars.get("batch_stats", {})
        # EMA covers params + norm stats (all float state); deep-copied so
        # the EMA tree never aliases the live buffers (both are donated)
        self.g_ema = jax.tree_util.tree_map(
            jnp.array, dict(params=self.g_params, batch_stats=self.g_stats)
        )

        self.tx_g = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr_g, b1=0.0, b2=0.9
        )
        self.tx_d = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lr_d, b1=0.0, b2=0.9
        )
        self.opt_g = self.tx_g.init(self.g_params)
        self.opt_d = self.tx_d.init(self.d_params)

        repl = replicated(self.mesh)
        for name in ("g_params", "g_stats", "d_params", "d_stats", "g_ema",
                     "opt_g", "opt_d", "te_params"):
            setattr(self, name, jax.device_put(getattr(self, name), repl))

    def _d_weights(self):
        cfg = self.mcfg
        if cfg.num_discriminators == 2 and cfg.texture_resolution >= 512:
            return [2.0, 1.0]
        return None

    # -- compiled steps ----------------------------------------------------

    def _build_steps(self):
        cfg = self.cfg
        mcfg = self.mcfg
        use_mesh = self.use_mesh
        template = self.template
        d_weight = self._d_weights()
        batch_shd = batch_sharded(self.mesh)
        repl = replicated(self.mesh)

        def encode_caption(te_params, batch):
            """Frozen text encoder -> (word features, padding mask)."""
            tokens = batch.get("caption")
            if tokens is None or self.text_encoder is None:
                return None
            words, _ = self.text_encoder.apply({"params": te_params}, tokens)
            return (jax.lax.stop_gradient(words), tokens == 0)

        def gen_apply(g_params, g_stats, z, c, caption, train):
            out, new = self.generator.apply(
                {"params": g_params, "batch_stats": g_stats},
                z, c, caption, train=train, mutable=["batch_stats"],
            )
            return out, new["batch_stats"]

        def disc_apply(d_params, d_stats, x, mesh_map, c, caption, train,
                       alpha=None):
            # alpha is channel 3 of x, passed separately so the critics pool
            # it for their masks without a full-res slice of the tiled input
            (preds, masks), new = self.discriminator.apply(
                {"params": d_params, "batch_stats": d_stats},
                x, mesh_map, c, train=train, caption=caption, alpha=alpha,
                mutable=["batch_stats"],
            )
            return preds, masks, new["batch_stats"]

        compute_dtype = mcfg.dtype

        def g_step(g_params, g_stats, d_params, d_stats, opt_g, g_ema,
                   alpha, lr_factor, batch, rng, te_params):
            batch = _to_compute(batch, compute_dtype)
            z = jax.random.normal(rng, (batch["alpha"].shape[0], mcfg.latent_dim))
            c = batch.get("c")
            caption = encode_caption(te_params, batch)
            alpha_real = batch["alpha"]

            def loss_fn(params):
                (tex, mesh_map), new_gstats = gen_apply(
                    params, g_stats, z, c, caption, True
                )
                x_fake = jnp.concatenate([tex * alpha_real, alpha_real], axis=-1)
                preds, masks, new_dstats = disc_apply(
                    d_params, d_stats, x_fake, mesh_map, c, caption, True,
                    alpha=alpha_real,
                )
                loss_gan = gan_loss(preds, True, for_discriminator=False,
                                    masks=masks, weights=d_weight, mode=cfg.loss)
                if use_mesh:
                    vtx = template.get_vertex_positions(mesh_map)
                    flat = flatness_loss(template.compute_normals(vtx), template.ff_j)
                else:
                    flat = 0.0
                loss = loss_gan + cfg.mesh_regularization * flat
                return loss, (loss_gan, flat, new_gstats, new_dstats)

            grads, (loss_gan, flat, new_gstats, new_dstats) = jax.grad(
                loss_fn, has_aux=True
            )(g_params)
            opt_g.hyperparams["learning_rate"] = cfg.lr_g * lr_factor
            updates, new_opt = self.tx_g.update(grads, opt_g, g_params)
            new_params = optax.apply_updates(g_params, updates)
            new_ema = _tree_ema(
                g_ema, dict(params=new_params, batch_stats=new_gstats), alpha
            )
            return (new_params, new_gstats, new_dstats, new_opt, new_ema,
                    dict(g_loss=loss_gan, flat_loss=flat))

        def d_step(g_params, g_stats, d_params, d_stats, opt_d,
                   lr_factor, batch, rng, te_params):
            batch = _to_compute(batch, compute_dtype)
            z = jax.random.normal(rng, (batch["alpha"].shape[0], mcfg.latent_dim))
            c = batch.get("c")
            caption = encode_caption(te_params, batch)
            alpha_real = batch["alpha"]
            # generator runs in train mode but without G gradients
            (tex, mesh_map), new_gstats = gen_apply(
                g_params, g_stats, z, c, caption, True
            )
            tex = jax.lax.stop_gradient(tex)
            mesh_map = jax.lax.stop_gradient(mesh_map) if mesh_map is not None else None
            x_fake = jnp.concatenate([tex * alpha_real, alpha_real], axis=-1)
            x_real = jnp.concatenate([batch["texture"], alpha_real], axis=-1)
            # fake/real ride one concatenated batch (reference divide_pred,
            # main.py:416-427): two half-batch critic passes were measured
            # slower on v5e — the B=32 convs win more than the concat
            # relayout costs
            x_comb = jnp.concatenate([x_fake, x_real], axis=0)
            c_comb = jnp.concatenate([c, c], axis=0) if c is not None else None
            if mesh_map is not None:
                mesh_comb = jnp.concatenate([mesh_map, batch["mesh"]], axis=0)
            else:
                mesh_comb = None

            caption_comb = None
            if caption is not None:
                caption_comb = (
                    jnp.concatenate([caption[0], caption[0]], axis=0),
                    jnp.concatenate([caption[1], caption[1]], axis=0),
                )

            alpha_comb = jnp.concatenate([alpha_real, alpha_real], axis=0)

            def loss_fn(params):
                preds, masks, new_dstats = disc_apply(
                    params, d_stats, x_comb, mesh_comb, c_comb, caption_comb,
                    True, alpha=alpha_comb,
                )
                B = x_fake.shape[0]
                fake_preds = [p[:B] for p in preds]
                real_preds = [p[B:] for p in preds]
                fake_masks = [m[:B] if m is not None else None for m in masks]
                real_masks = [m[B:] if m is not None else None for m in masks]
                loss_fake = gan_loss(fake_preds, False, True, fake_masks,
                                     d_weight, cfg.loss)
                loss_real = gan_loss(real_preds, True, True, real_masks,
                                     d_weight, cfg.loss)
                return loss_fake + loss_real, (loss_fake, loss_real, new_dstats)

            grads, (loss_fake, loss_real, new_dstats) = jax.grad(
                loss_fn, has_aux=True
            )(d_params)
            opt_d.hyperparams["learning_rate"] = cfg.lr_d * lr_factor
            updates, new_opt = self.tx_d.update(grads, opt_d, d_params)
            new_params = optax.apply_updates(d_params, updates)
            return (new_params, new_dstats, new_gstats, new_opt,
                    dict(d_fake=loss_fake, d_real=loss_real))

        # donate only the buffers each step returns updated versions of
        self._g_step = jax.jit(
            g_step,
            in_shardings=(repl,) * 6 + (None, None, batch_shd, repl, repl),
            donate_argnums=(0, 1, 3, 4, 5),
        )
        self._d_step = jax.jit(
            d_step,
            in_shardings=(repl,) * 5 + (None, batch_shd, repl, repl),
            donate_argnums=(1, 2, 3, 4),
        )

        def inference(g_ema, z, c, caption):
            (tex, mesh_map), _ = self.generator.apply(
                {"params": g_ema["params"], "batch_stats": g_ema["batch_stats"]},
                z, c, caption, train=False, mutable=["batch_stats"],
            )
            # export/render consumers take full precision
            tex = tex.astype(jnp.float32)
            if mesh_map is not None:
                mesh_map = mesh_map.astype(jnp.float32)
            return tex, mesh_map

        self._inference = jax.jit(inference)

    # -- public API --------------------------------------------------------

    def _ema_alpha(self) -> float:
        a = self.cfg.g_ema_alpha
        if self.epoch < 10:
            return math.pow(a, 100)
        if self.epoch < 100:
            return math.pow(a, 10)
        return a

    def _lr_factor(self) -> float:
        cfg = self.cfg
        if self.epoch < cfg.lr_decay_after or cfg.epochs <= cfg.lr_decay_after:
            return 1.0
        return 1.0 - min(
            max((self.epoch - cfg.lr_decay_after) / (cfg.epochs - cfg.lr_decay_after), 0.0),
            1.0,
        )

    def train_step(self, batch: dict) -> dict:
        """One iteration: G step every (1 + d_steps_per_g) its, else D step."""
        batch = shard_batch_pytree(batch, self.mesh)
        rng = jax.random.fold_in(self._rng, self.total_it)
        lr_factor = jnp.float32(self._lr_factor())
        if self.total_it % (1 + self.cfg.d_steps_per_g) == 0:
            (self.g_params, self.g_stats, self.d_stats, self.opt_g,
             self.g_ema, losses) = self._g_step(
                self.g_params, self.g_stats, self.d_params, self.d_stats,
                self.opt_g, self.g_ema, jnp.float32(self._ema_alpha()),
                lr_factor, batch, rng, self.te_params,
            )
        else:
            (self.d_params, self.d_stats, self.g_stats, self.opt_d, losses) = (
                self._d_step(
                    self.g_params, self.g_stats, self.d_params, self.d_stats,
                    self.opt_d, lr_factor, batch, rng, self.te_params,
                )
            )
        self.total_it += 1
        return losses

    def set_text_encoder(self, params, vocab_size: int, embedding_dim: int,
                         hidden_dim: int) -> None:
        """Swap in converted pretrained text-encoder weights (reference
        ``main.py:560-568`` loads text_encoder200.pth frozen).  Must run
        before the first train/inference step; the word-feature width
        2*hidden_dim has to match the conditioning dim G/D were built with."""
        from im23d_tpu.models.text_encoder import TextEncoder

        assert self.mcfg.conditional_text, "model is not text-conditional"
        assert 2 * hidden_dim == self.mcfg.text_embedding_dim, (
            f"pretrained encoder emits {2 * hidden_dim}-dim word features "
            f"but the GAN was configured for {self.mcfg.text_embedding_dim}"
        )
        self.text_encoder = TextEncoder(
            vocab_size=vocab_size, embedding_dim=embedding_dim,
            hidden_dim=hidden_dim,
        )
        self.te_params = jax.device_put(params, replicated(self.mesh))

    def generate(self, z, c=None, caption_tokens=None):
        """EMA-generator inference (reference 'inference' mode)."""
        caption = None
        if caption_tokens is not None and self.text_encoder is not None:
            words, _ = self.text_encoder.apply(
                {"params": self.te_params}, jnp.asarray(caption_tokens)
            )
            caption = (words, jnp.asarray(caption_tokens) == 0)
        return self._inference(self.g_ema, z, c, caption)

    def truncation_sample(self, rng, n: int, sigma: float):
        """Truncation-trick rejection sampling (``main.py:245-253``):
        resample any |z| component above sigma.  Runs as one jitted
        bounded while_loop — the naive host loop costs a device round trip
        per rejection round."""
        return _truncation_sample(rng, n, self.mcfg.latent_dim,
                                  jnp.float32(sigma))

    # -- checkpointing -----------------------------------------------------

    def _state_tree(self) -> dict:
        return dict(
            g_params=self.g_params, g_stats=self.g_stats,
            d_params=self.d_params, d_stats=self.d_stats,
            g_ema=self.g_ema, opt_g=self.opt_g, opt_d=self.opt_d,
            te_params=self.te_params,
            total_it=self.total_it, epoch=self.epoch,
        )

    def record_curves(self, losses: dict) -> None:
        """Append host-side scalar losses to the persisted curves."""
        for k, v in losses.items():
            if k in self.curves:
                self.curves[k].append(float(v))

    def _curves_path(self, workdir: str, step) -> str:
        import os

        return os.path.join(
            os.path.abspath(workdir), "checkpoints", f"curves_{step}.npz"
        )

    def save(self, workdir: str | None = None, tag=None) -> str:
        """Save a checkpoint.  ``tag=None`` -> permanent numbered checkpoint
        at the current iteration; ``tag='latest'`` -> rolling overwrite
        (reference two-tier --save_freq / --checkpoint_freq scheme,
        ``main.py:770-775``)."""
        import numpy as np

        workdir = workdir or self.workdir
        step = self.total_it if tag is None else tag
        # rolling 'latest' saves overlap training (async write thread);
        # numbered checkpoints block so their directories are always whole
        path = save_checkpoint(workdir, step, self._state_tree(),
                               block=tag is None)
        np.savez(
            self._curves_path(workdir, step),
            **{k: np.asarray(v, np.float32) for k, v in self.curves.items()},
        )
        return path

    def restore(self, workdir: str | None = None, step=None):
        import os

        import numpy as np

        from im23d_tpu.core.checkpoint import resolve_step

        workdir = workdir or self.workdir
        step = resolve_step(workdir, step)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {workdir}")
        tree = restore_checkpoint(workdir, step, self._state_tree())
        cpath = self._curves_path(workdir, step)
        if os.path.exists(cpath):
            with np.load(cpath) as curves:
                self.curves = {k: list(curves[k]) for k in curves.files}
        for k in ("g_params", "g_stats", "d_params", "d_stats", "g_ema",
                  "opt_g", "opt_d", "te_params"):
            setattr(self, k, jax.device_put(tree[k], replicated(self.mesh)))
        self.total_it = int(tree["total_it"])
        self.epoch = int(tree["epoch"])
