import jax
import jax.numpy as jnp
import pytest
import numpy as np

from im23d_tpu.metrics.chamfer import chamfer_distance, nn_dist2_pallas, nn_dist2_xla
from im23d_tpu.metrics.fid import calculate_stats, fid_from_activations, frechet_distance
from im23d_tpu.metrics.iou import iou_3d, mean_iou


def brute_nn(x, y):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    return d.min(-1)


def test_nn_dist2_xla_matches_brute():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 70, 3).astype(np.float32)
    y = rng.randn(2, 50, 3).astype(np.float32)
    ref = brute_nn(x, y)
    out = np.asarray(nn_dist2_xla(jnp.asarray(x), jnp.asarray(y), m_chunk=16))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_nn_dist2_pallas_matches_brute():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 130, 3).astype(np.float32)
    y = rng.randn(2, 520, 3).astype(np.float32)
    ref = brute_nn(x, y)
    out = np.asarray(nn_dist2_pallas(jnp.asarray(x), jnp.asarray(y), m_tile=256))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_chamfer_zero_for_identical_clouds():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.randn(3, 40, 3).astype(np.float32))
    total, t1, t2 = chamfer_distance(a, a)
    np.testing.assert_allclose(np.asarray(total), 0.0, atol=1e-5)


def test_chamfer_symmetric_and_positive():
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 30, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 45, 3).astype(np.float32))
    tot_ab, _, _ = chamfer_distance(a, b)
    tot_ba, _, _ = chamfer_distance(b, a)
    np.testing.assert_allclose(np.asarray(tot_ab), np.asarray(tot_ba), rtol=1e-5)
    assert np.all(np.asarray(tot_ab) > 0)


def test_mean_iou_matches_reference_semantics():
    import torch

    rng = np.random.RandomState(4)
    p = rng.rand(3, 16, 16).astype(np.float32)
    r = rng.rand(3, 16, 16).astype(np.float32)
    # reference mean_iou (run_reconstruction.py:225-231)
    tp = torch.tensor(p) > 0.5
    tr = torch.tensor(r) > 0.5
    inter = (tp & tr).float().sum(dim=[1, 2])
    union = (tp | tr).float().sum(dim=[1, 2])
    expected = float(torch.mean(inter / union))
    ours = float(mean_iou(jnp.asarray(p), jnp.asarray(r)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_iou_3d_identity_and_disjoint():
    rng = np.random.RandomState(5)
    a = jnp.asarray((rng.rand(1, 200, 3) * 0.3 - 0.4).astype(np.float32))
    b = jnp.asarray((rng.rand(1, 200, 3) * 0.3 + 0.1).astype(np.float32))
    same = np.asarray(iou_3d(a, a, voxel_size=16))
    np.testing.assert_allclose(same, 1.0, atol=1e-6)
    disj = np.asarray(iou_3d(a, b, voxel_size=16))
    assert disj[0] < 0.2


def test_frechet_distance_properties():
    rng = np.random.RandomState(6)
    act1 = rng.randn(100, 8).astype(np.float64)
    act2 = act1 + 5.0
    m1, s1 = calculate_stats(act1)
    m2, s2 = calculate_stats(act2)
    # identical distributions -> 0
    np.testing.assert_allclose(frechet_distance(m1, s1, m1, s1), 0.0, atol=1e-6)
    # mean shift of 5 in 8 dims -> ||diff||^2 = 200
    np.testing.assert_allclose(frechet_distance(m1, s1, m2, s2), 200.0, atol=1e-6)


def test_frechet_matches_scipy_reference():
    from scipy import linalg

    rng = np.random.RandomState(7)
    a1 = rng.randn(50, 6)
    a2 = rng.randn(60, 6) * 1.5 + 0.3
    m1, s1 = calculate_stats(a1)
    m2, s2 = calculate_stats(a2)
    diff = m1 - m2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    expected = diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean.real)
    np.testing.assert_allclose(frechet_distance(m1, s1, m2, s2), expected, rtol=1e-6)

    # rank-deficient covariance (fewer samples than dims, like tiny eval
    # sets): the eigen route's clipping matches scipy's real-part trace
    a3 = rng.randn(4, 6)
    m3, s3 = calculate_stats(a3)
    diff = m3 - m2
    covmean, _ = linalg.sqrtm(s3.dot(s2), disp=False)
    expected = diff.dot(diff) + np.trace(s3) + np.trace(s2) - 2 * np.trace(covmean.real)
    np.testing.assert_allclose(frechet_distance(m3, s3, m2, s2), expected,
                               rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_inception_features_shape_and_determinism():
    """Random-weight extractor: deterministic, finite, and DISCRIMINATIVE
    (round-5 fix: the raw pool3 head collapses to constant features under
    random weights — ~2e-8 batch std — so the uncalibrated path taps
    BN-calibrated Mixed_5d features instead)."""
    from im23d_tpu.metrics.inception import init_inception

    model, variables = init_inception()
    x = jnp.asarray(np.random.RandomState(8).rand(2, 64, 64, 3), jnp.float32)
    f1 = model.apply(variables, x)
    f2 = model.apply(variables, x)
    assert f1.shape == (2, 288)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert np.all(np.isfinite(np.asarray(f1)))
    # different inputs -> different features (the property fid_uncalibrated
    # needs to track training at all)
    y = jnp.zeros((2, 64, 64, 3), jnp.float32)
    fy = model.apply(variables, y)
    assert float(jnp.abs(f1 - fy).mean()) > 1e-2


def test_fid_from_activations_sanity():
    rng = np.random.RandomState(9)
    a = rng.randn(200, 16)
    b = rng.randn(200, 16)
    near = fid_from_activations(a, a[:100])
    far = fid_from_activations(a, b + 10)
    assert near < far


def test_load_torch_state_dict_key_mapping():
    from im23d_tpu.metrics.inception import load_torch_state_dict

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),  # ignored
    }
    v = load_torch_state_dict(sd)
    conv = v["params"]["Conv2d_1a_3x3"]["conv"]["kernel"]
    assert conv.shape == (3, 3, 3, 32)  # OIHW -> HWIO
    assert v["params"]["Conv2d_1a_3x3"]["bn"]["scale"].shape == (32,)
    assert v["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
    assert "fc" not in v["params"]


def test_cli_load_inception_variables_npz(tmp_path):
    from im23d_tpu.cli.main import load_inception_variables

    assert load_inception_variables(None) is None
    path = tmp_path / "w.npz"
    np.savez(path, **{
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros(32, np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones(32, np.float32),
    })
    v = load_inception_variables(str(path))
    assert v["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)


def test_frechet_distance_nan_inputs_warn_not_crash():
    """Non-finite activations (diverged generator mid-training) must yield a
    NaN FID with a warning — never a LinAlgError that kills the run."""
    import warnings

    from im23d_tpu.metrics.fid import frechet_distance

    rng = np.random.RandomState(0)
    mu = rng.randn(8).astype(np.float64)
    sigma = np.eye(8)
    bad = sigma.copy()
    bad[0, 0] = np.nan
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = frechet_distance(mu, bad, mu, sigma)
    assert np.isnan(out)
    assert any("non-finite" in str(x.message) for x in w)
