"""Reference-checkpoint import: torch.save dicts -> restorable framework
checkpoints (``im23d_tpu.cli.import_torch``)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_torch_convert import make_generator_state_dict, make_recon_state_dict  # noqa: E402


def _save_pth(path, obj):
    import torch

    torch.save(obj, path)


def test_kind_autodetect_and_parser():
    from im23d_tpu.cli.import_torch import build_parser

    args = build_parser().parse_args(
        ["--checkpoint", "x.pth", "--weights", "w"]
    )
    assert args.name == "w" and args.kind == "auto"


@pytest.mark.slow
def test_import_gan_checkpoint_roundtrip(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from im23d_tpu.cli.import_torch import main
    from im23d_tpu.core.torch_convert import convert_generator
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    monkeypatch.chdir(tmp_path)
    gen_sd = make_generator_state_dict(np.random.RandomState(0))
    ema_sd = make_generator_state_dict(np.random.RandomState(1))
    chk = dict(
        generator=gen_sd,
        generator_running_avg=ema_sd,
        discriminator={},  # critics start fresh by design
        epoch=7, iteration=123,
        g_curve=[1.0, 0.5], d_fake_curve=[0.1], d_real_curve=[0.2],
        flat_curve=[3.0],
        args=dict(texture_resolution=128, mesh_resolution=32,
                  symmetric_g=True, texture_only=False, latent_dim=64,
                  # the reference's truthy-string default bug: must NOT
                  # flip conditioning on its own (weights decide)
                  conditional_class="--conditional_class",
                  dataset="cub"),
    )
    _save_pth(tmp_path / "checkpoint_latest.pth", chk)

    rc = main(["--checkpoint", str(tmp_path / "checkpoint_latest.pth"),
               "--weights", "imported"])
    assert rc == 0

    trainer = GANTrainer(
        GANTrainConfig(
            model=GANConfig(texture_resolution=128, conditional_class=True,
                            n_classes=(5,)),
            batch_size=2,
        ),
        workdir=str(tmp_path / "gan_weights" / "imported"),
    )
    trainer.restore()
    assert trainer.epoch == 7 and trainer.total_it == 123
    assert trainer.curves["g_loss"] == [1.0, 0.5]

    # the EMA tree equals the direct conversion of generator_running_avg
    conv_ema = convert_generator(ema_sd)
    np.testing.assert_allclose(
        np.asarray(trainer.g_ema["params"]["fc"]["kernel"]),
        conv_ema["params"]["fc"]["kernel"], rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(trainer.g_params["blk1"]["Conv_0"]["kernel"]),
        convert_generator(gen_sd)["params"]["blk1"]["Conv_0"]["kernel"],
        rtol=1e-6,
    )
    # and the imported EMA generator runs
    tex, mesh = trainer.generate(
        jnp.zeros((2, 64)), jnp.asarray([[0], [3]], jnp.int32)
    )
    assert np.isfinite(np.asarray(tex)).all()
    assert tex.shape == (2, 128, 128, 3)


@pytest.mark.slow
def test_import_recon_checkpoint_roundtrip(tmp_path, monkeypatch):
    from im23d_tpu.cli.import_torch import main
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer
    from im23d_tpu.geometry.mesh_template import MeshTemplate

    monkeypatch.chdir(tmp_path)
    N = 6
    gen_sd = make_recon_state_dict(np.random.RandomState(2))
    chk = dict(
        generator=gen_sd,
        dataset_params=dict(
            ds_translation=np.random.RandomState(3).randn(N, 2).astype(np.float32),
            ds_scale=np.zeros((N, 1), np.float32),
            ds_z0=np.ones((N, 1), np.float32),
        ),
        optimizer=None, optimizer_dataset_params=None,
        epoch=3, iteration=60,
        args=dict(texture_resolution=64, mesh_resolution=32, symmetric=True,
                  dataset="cub"),
    )
    _save_pth(tmp_path / "checkpoint_latest.pth", chk)

    rc = main(["--checkpoint", str(tmp_path / "checkpoint_latest.pth"),
               "--name", "imported_recon"])
    assert rc == 0

    trainer = ReconTrainer(
        ReconConfig(texture_resolution=64, optimize_deltas=True,
                    optimize_z0=True, batch_size=2),
        dataset_size=N,
        template=MeshTemplate(segments=32, rings=16),
        workdir=str(tmp_path / "checkpoints_recon" / "imported_recon"),
    )
    trainer.restore()
    assert trainer.epoch == 3 and trainer.total_it == 60
    np.testing.assert_allclose(
        np.asarray(trainer.dp_params["ds_translation"]),
        chk["dataset_params"]["ds_translation"], rtol=1e-6,
    )
    # imported conv weights landed in the network
    from im23d_tpu.core.torch_convert import convert_reconstruction

    np.testing.assert_allclose(
        np.asarray(trainer.params["Conv_0"]["kernel"]),
        convert_reconstruction(gen_sd)["params"]["Conv_0"]["kernel"],
        rtol=1e-6,
    )


@pytest.mark.slow
def test_import_recon_without_dataset_params_is_restorable(tmp_path, monkeypatch):
    """A .pth lacking dataset_params must not bake the ReconConfig defaults
    (optimize_deltas=True) into the checkpoint: that would save a size-1
    dp_params tree that a later full-dataset restore cannot load."""
    from im23d_tpu.cli.import_torch import main
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    monkeypatch.chdir(tmp_path)
    gen_sd = make_recon_state_dict(np.random.RandomState(4))
    chk = dict(
        generator=gen_sd, epoch=1, iteration=10,
        args=dict(texture_resolution=64, mesh_resolution=32, symmetric=True,
                  dataset="cub"),
    )
    _save_pth(tmp_path / "checkpoint_latest.pth", chk)
    rc = main(["--checkpoint", str(tmp_path / "checkpoint_latest.pth"),
               "--name", "imported_nodp"])
    assert rc == 0

    # restoring with a real (larger) dataset size must work: the import
    # forced optimize_deltas/optimize_z0 off, so no dp tree was saved
    trainer = ReconTrainer(
        ReconConfig(texture_resolution=64, optimize_deltas=False,
                    optimize_z0=False, batch_size=2),
        dataset_size=20,
        template=MeshTemplate(segments=32, rings=16),
        workdir=str(tmp_path / "checkpoints_recon" / "imported_nodp"),
    )
    trainer.restore()
    assert trainer.epoch == 1 and trainer.total_it == 10
