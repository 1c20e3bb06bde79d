"""Structured pseudo-gt fabricator + device-resident cache tests."""

import os

import numpy as np
import pytest

from im23d_tpu.data.fabricate import StructuredPseudoGT, build_structured_cache


def test_maps_deterministic_and_shaped():
    fab = StructuredPseudoGT(6, resolution=32, n_classes=2, seed=3)
    a, b = fab.maps(4), fab.maps(4)
    for k in ("texture", "texture_alpha", "mesh"):
        assert np.array_equal(a[k], b[k]), k
    assert a["texture"].shape == (3, 32, 32)
    assert a["texture"].dtype == np.float16
    assert a["texture_alpha"].shape == (1, 32, 32)
    assert a["mesh"].shape == (3, 32, 32)
    assert float(a["texture"].min()) >= -1.0 and float(a["texture"].max()) <= 1.0
    # visibility band: poles (first/last v rows) unobserved, middle observed
    alpha = a["texture_alpha"][0]
    assert float(alpha[0].max()) == 0.0 and float(alpha[-1].max()) == 0.0
    assert float(alpha[16].min()) > 0.9
    # displacement tapers at the v poles (watertight-looking sphere)
    assert abs(float(a["mesh"][:, 0].max())) < 0.01


def test_class_structure_is_learnable_signal():
    """Same-class textures share palette structure; the class spread is
    larger than the in-class spread (the 'actual signal' property)."""
    fab = StructuredPseudoGT(40, resolution=32, n_classes=4, seed=0)
    means = np.stack([
        np.asarray(fab.maps(i)["texture"], np.float32).mean(axis=(1, 2))
        for i in range(40)
    ])  # (40, 3)
    classes = np.array([fab.class_of(i) for i in range(40)])
    centroids = np.stack([means[classes == k].mean(0) for k in range(4)])
    within = np.mean([
        np.linalg.norm(means[classes == k] - centroids[k], axis=1).mean()
        for k in range(4)
    ])
    across = np.mean([
        np.linalg.norm(centroids[k] - centroids[j])
        for k in range(4) for j in range(4) if j != k
    ])
    assert across > 2.0 * within, (across, within)


@pytest.fixture(scope="module")
def tiny_cache(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("structured"))
    from im23d_tpu.geometry.mesh_template import MeshTemplate

    cache = build_structured_cache(
        root, 8, resolution=32, n_classes=2, seed=0, fid_resolution=75,
        batch=4, mesh_template=MeshTemplate(segments=8, rings=4),
    )
    return root, cache


def test_cache_layout_readable(tiny_cache):
    root, cache = tiny_cache
    from im23d_tpu.data.pseudogt import CubGANDataset, gan_batch_iterator

    ds = CubGANDataset(cache, texture_resolution=32, conditional_class=True)
    assert len(ds) == 8 and ds.has_pseudo_ground_truth
    batch = next(gan_batch_iterator(ds, 4, seed=0, num_workers=1))
    assert batch["texture"].shape == (4, 32, 32, 3)
    assert batch["alpha"].shape == (4, 32, 32, 1)
    assert batch["mesh"].shape == (4, 32, 32, 3)
    assert batch["c"].shape == (4, 1)
    for suffix in ("train", "testval"):
        st = np.load(os.path.join(cache, f"precomputed_fid_75x75_{suffix}.npz"))
        assert st["stats_m"].shape == (288,)  # calibrated Mixed_5d features
    # the rendered photo channel rides in the per-item npz
    d = np.load(os.path.join(cache, "pseudogt_32x32", "0.npz"),
                allow_pickle=True)["data"].item()
    assert d["image"].shape == (4, 32, 32) and d["image"].dtype == np.float16


def test_device_cache_matches_host_iterator(tiny_cache):
    """DeviceGANCache batches == gan_batch_iterator batches bit-for-bit:
    same epoch order, same per-(epoch, idx) mirror draws, same pixels."""
    root, cache = tiny_cache
    import jax

    from im23d_tpu.data.device_cache import DeviceGANCache
    from im23d_tpu.data.pseudogt import CubGANDataset, gan_batch_iterator
    from im23d_tpu.parallel.mesh import make_mesh

    ds = CubGANDataset(cache, texture_resolution=32, conditional_class=True)
    dev = DeviceGANCache(ds, 4, mesh=make_mesh(jax.devices()[:1]))
    for epoch in (0, 1):
        host_batches = list(gan_batch_iterator(ds, 4, seed=epoch,
                                               num_workers=1))
        dev_batches = list(dev.epoch_batches(epoch))
        assert len(host_batches) == len(dev_batches) == 2
        for hb, db in zip(host_batches, dev_batches):
            for key in ("texture", "alpha", "mesh", "c"):
                np.testing.assert_array_equal(
                    np.asarray(hb[key]), np.asarray(db[key]), err_msg=key
                )


def test_device_cache_trains_one_step(tmp_path):
    """Device-cache batches drive GANTrainer.train_step end to end (the
    generator's base resolution is 128, so this uses its own mini cache)."""
    import jax

    from im23d_tpu.data.device_cache import DeviceGANCache
    from im23d_tpu.data.pseudogt import CubGANDataset
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.models.gan import GANConfig
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.gan_trainer import GANTrainConfig, GANTrainer

    cache = build_structured_cache(
        str(tmp_path), 4, resolution=128, n_classes=2, seed=0,
        render_images=False, fid_stats=False,
    )
    ds = CubGANDataset(cache, texture_resolution=128, conditional_class=True)
    mesh = make_mesh(jax.devices()[:1])
    dev = DeviceGANCache(ds, 2, mesh=mesh)
    trainer = GANTrainer(
        GANTrainConfig(
            model=GANConfig(texture_resolution=128, mesh_resolution=32,
                            conditional_class=True, n_classes=(2,)),
            batch_size=2,
        ),
        template=MeshTemplate(segments=8, rings=4),
        mesh=mesh,
    )
    for batch in dev.epoch_batches(0):
        losses = trainer.train_step(batch)
    val = float(list(losses.values())[0])
    assert val == val


def test_structured_cmr_tree_pose_consistent(tmp_path):
    """The fabricated photos are renders under the sfm poses: re-rendering
    the SAME geometry with the loader's post-crop pose must reproduce the
    loader's mask (the property that gives the recon driver real signal)."""
    import jax
    import jax.numpy as jnp

    from im23d_tpu.data.cmr import CUBDataset
    from im23d_tpu.data.fabricate import StructuredPseudoGT, build_structured_cmr_tree
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.train.gan_eval import render_generated

    root = str(tmp_path)
    ds_root = build_structured_cmr_tree(root, 3, photo_res=64, batch=3)
    ds = CUBDataset(ds_root, "train", is_train=False, img_size=64)
    fab = StructuredPseudoGT(3, 128, n_classes=4, seed=0)
    template = MeshTemplate(segments=32, rings=16)
    for i in range(3):
        item = ds[i]
        maps = fab.maps(i)
        img, alpha = render_generated(
            template, 64,
            jnp.asarray(maps["mesh"].transpose(1, 2, 0), jnp.float32)[None],
            jnp.asarray(maps["texture"].transpose(1, 2, 0), jnp.float32)[None],
            jnp.asarray([item["scale"]]),
            jnp.asarray(item["translation"])[None],
            jnp.asarray(item["rotation"])[None],
        )
        pred = np.asarray(alpha[0, ..., 0]) > 0.5
        gt = np.asarray(item["image"][..., 3]) > 0.5
        inter = np.logical_and(pred, gt).sum()
        union = np.logical_or(pred, gt).sum()
        assert inter / max(union, 1) > 0.75, (i, inter / max(union, 1))
