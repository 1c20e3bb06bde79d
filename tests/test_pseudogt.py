import os

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from im23d_tpu.geometry.mesh_template import MeshTemplate
from im23d_tpu.parallel.mesh import make_mesh
from im23d_tpu.render.inverse import inverse_render
from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer


def test_inverse_render_projects_photo_to_uv():
    t = MeshTemplate(segments=16, rings=8)
    B, R = 1, 64
    # identity-ish mesh: vertices = sphere in NDC
    vtx = jnp.asarray(t.mesh.vertices)[None] * 0.8
    # photo: horizontal gradient
    photo = jnp.broadcast_to(
        jnp.linspace(0, 1, 128)[None, None, :, None], (B, 128, 128, 3)
    ).astype(jnp.float32)
    inv_tex, inv_alpha = inverse_render(t, vtx, photo, R)
    inv_tex = np.asarray(inv_tex)
    inv_alpha = np.asarray(inv_alpha)
    assert inv_tex.shape == (B, R, R, 3)
    assert inv_alpha.shape == (B, R, R, 1)
    # most of the UV chart is covered (the chart tiles [0,1]^2)
    assert (inv_alpha > 0.5).mean() > 0.7
    assert np.isfinite(inv_tex).all()
    # values come from the photo's range
    assert inv_tex.max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_generate_pseudogt_writes_reference_format(tmp_path):
    cfg = ReconConfig(image_resolution=64, texture_resolution=64, batch_size=2)
    trainer = ReconTrainer(
        cfg, dataset_size=4, template=MeshTemplate(segments=8, rings=4),
        mesh=make_mesh(jax.devices()[:1]),
    )

    rng = np.random.RandomState(0)

    def loader():
        for start in range(0, 4, 2):
            rot = rng.randn(2, 4).astype(np.float32)
            rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
            yield dict(
                image=rng.rand(2, 64, 64, 4).astype(np.float32),
                hd_image=rng.rand(2, 128, 128, 3).astype(np.float32),
                inception_image=rng.rand(2, 75, 75, 3).astype(np.float32) * 2 - 1,
                scale=np.full((2,), 0.7, np.float32),
                translation=np.zeros((2, 3), np.float32),
                rotation=rot,
                idx=np.arange(start, start + 2, dtype=np.int32),
            )

    cache_dir = str(tmp_path / "cache" / "cub")
    os.makedirs(cache_dir, exist_ok=True)
    trainer.generate_pseudogt(
        loader(), cache_dir, "cub",
        pseudogt_resolution=32, inception_resolution=75,
        paths=[f"img_{i}.jpg" for i in range(4)],
    )

    # per-image npz in the reference layout
    pg_dir = os.path.join(cache_dir, "pseudogt_32x32")
    files = sorted(os.listdir(pg_dir))
    assert files == ["0.npz", "1.npz", "2.npz", "3.npz"]
    data = np.load(os.path.join(pg_dir, "0.npz"), allow_pickle=True)["data"].item()
    assert set(data) == {"mesh", "texture", "texture_alpha", "image"}
    assert data["texture"].dtype == np.float16
    assert data["texture"].shape == (3, 32, 32)  # NCHW like the reference
    assert data["texture_alpha"].shape == (1, 32, 32)
    assert data["mesh"].shape[0] == 3

    # poses metadata
    meta = np.load(os.path.join(cache_dir, "poses_metadata.npz"),
                   allow_pickle=True)["data"].item()
    assert meta["scale"].shape == (4, 1)
    assert meta["translation"].shape == (4, 3)
    assert meta["rotation"].shape == (4, 4)
    assert len(meta["path"]) == 4

    # FID stats with tril-packed covariance
    stats = np.load(os.path.join(cache_dir, "precomputed_fid_75x75_train.npz"))
    # uncalibrated extractor = 288-d calibrated Mixed_5d features (round 5;
    # with pretrained weights the exporter would emit 2048-d pool3 stats)
    assert stats["stats_m"].shape == (288,)
    s = stats["stats_s"]
    assert s.shape == (288, 288)
    assert np.allclose(s, np.tril(s))  # upper triangle zeroed
    assert int(stats["num_images"]) == 4
    assert int(stats["resolution"]) == 75


def test_pseudogt_item_epoch_is_pure(tmp_path):
    """item(idx, epoch) draws are a pure function of (seed, epoch, idx):
    set_epoch on the shared dataset cannot perturb an explicit-epoch call."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_cli_main import make_synthetic_cub_cache

    from im23d_tpu.data.pseudogt import CubGANDataset

    cache = make_synthetic_cub_cache(str(tmp_path))
    ds = CubGANDataset(cache_dir=cache, texture_resolution=128)
    a = ds.item(0, 5)
    ds.set_epoch(99)
    b = ds.item(0, 5)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
