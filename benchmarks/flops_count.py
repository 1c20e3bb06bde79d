"""Analytic per-step FLOPs for the two bench.py workloads (one-time, CPU).

Counts HLO FLOPs via XLA's cost analysis on the LOWERED (pre-backend
-compile) modules of the exact jitted step functions bench.py measures:

* chairs: the full ShapeNet-chairs train step (fwd + 480-way candidate
  projection + bwd + AdamW) at the production config — on the CPU backend
  the projection lowers to the dense XLA splat path, i.e. the analytic
  model is the p = 1.0 full workload (the Pallas windowed kernel does
  strictly less arithmetic at p < 1).
* gan: one 1G + 2D iteration group of the 512² conditional GAN at batch 32
  bf16 (the ``gan_512_cond_iter_ms`` workload).

Results are cached to ``benchmarks/flops_cache.json`` (committed); bench.py
reads the cache and divides by the measured step time to report ``mfu_pct``
against the v5e bf16 peak (VERDICT r4 item 5).  Re-run this script whenever
the model architecture or the bench configs change:

    python benchmarks/flops_count.py            # both workloads
    python benchmarks/flops_count.py --only chairs
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "flops_cache.json")


def _lowered_flops(lowered) -> float:
    cost = lowered.cost_analysis()
    # jax returns either a dict or a 1-element list of dicts depending on
    # version; "flops" is XLA's HLO-level count (2*M*N*K per matmul etc.)
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def chairs_flops() -> float:
    import jax

    from im23d_tpu.data.synthetic import SyntheticSilhouettes
    from im23d_tpu.parallel.mesh import make_mesh, shard_batch_pytree
    from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

    cfg = ShapeNetConfig.chairs()
    mesh = make_mesh(jax.devices()[:1])
    learner = ShapeNetLearner(cfg, mesh=mesh)
    data = SyntheticSilhouettes(
        cfg.batch_size, cfg.image_size, cfg.num_views, n_points=256, seed=0
    )
    batch = shard_batch_pytree(data.next_batch(), mesh)
    lowered = learner._train_step.lower(learner.state, batch)
    return _lowered_flops(lowered)


def gan_flops() -> float:
    import jax
    import numpy as np

    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    B, R = 32, 512
    template = MeshTemplate(segments=32, rings=16)
    rng = np.random.default_rng(0)
    batch = dict(
        texture=rng.standard_normal((B, R, R, 3)).astype(np.float16),
        alpha=rng.random((B, R, R, 1)).astype(np.float16),
        mesh=(rng.standard_normal((B, 32, 32, 3)) * 0.01).astype(np.float16),
        c=np.stack([rng.integers(0, 200, B), np.zeros(B)], 1).astype(np.int32),
    )
    cfg = GANTrainConfig(
        model=GANConfig(
            texture_resolution=R, conditional_class=True,
            compute_dtype="bfloat16",
        ),
        batch_size=B,
    )
    import jax.numpy as jnp

    from im23d_tpu.parallel.mesh import shard_batch_pytree

    trainer = GANTrainer(cfg, template=template,
                         mesh=make_mesh(jax.devices()[:1]))
    # mirror GANTrainer.train_step's argument plumbing (gan_trainer.py:390-409)
    sharded = shard_batch_pytree(batch, trainer.mesh)
    rng_key = jax.random.fold_in(trainer._rng, 0)
    lr_factor = jnp.float32(1.0)
    g_fl = _lowered_flops(trainer._g_step.lower(
        trainer.g_params, trainer.g_stats, trainer.d_params, trainer.d_stats,
        trainer.opt_g, trainer.g_ema, jnp.float32(trainer._ema_alpha()),
        lr_factor, sharded, rng_key, trainer.te_params,
    ))
    d_fl = _lowered_flops(trainer._d_step.lower(
        trainer.g_params, trainer.g_stats, trainer.d_params, trainer.d_stats,
        trainer.opt_d, lr_factor, sharded, rng_key, trainer.te_params,
    ))
    return g_fl + trainer.cfg.d_steps_per_g * d_fl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=("chairs", "gan"), default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as fh:
            cache = json.load(fh)

    if args.only in (None, "chairs"):
        cache["chairs_train_step_flops"] = chairs_flops()
        print(f"chairs train step: {cache['chairs_train_step_flops']:.3e} FLOPs",
              flush=True)
    if args.only in (None, "gan"):
        cache["gan_1g2d_group_flops_bs32"] = gan_flops()
        print(f"gan 1G+2D group (bs32): "
              f"{cache['gan_1g2d_group_flops_bs32']:.3e} FLOPs", flush=True)

    cache["method"] = (
        "XLA HLO cost analysis of the lowered jitted step (CPU backend: "
        "dense projection path = p=1.0 workload); see flops_count.py"
    )
    with open(CACHE, "w") as fh:
        json.dump(cache, fh, indent=1)
    print(f"wrote {CACHE}", flush=True)


if __name__ == "__main__":
    main()
