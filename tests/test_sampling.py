import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops import (
    adjust_poles,
    circpad,
    grid_sample_bilinear,
    resize_bilinear_half,
    symmetrize_texture,
)
from im23d_tpu.ops.sampling import resize_bilinear


def test_grid_sample_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 7, 9).astype(np.float32)  # NCHW for torch
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) - 0.5) * 2.4  # some OOB

    expected = F.grid_sample(
        torch.tensor(img), torch.tensor(grid), mode="bilinear", align_corners=True
    ).numpy()  # (2, 3, 5, 6)

    ours = np.asarray(
        grid_sample_bilinear(jnp.array(img.transpose(0, 2, 3, 1)), jnp.array(grid))
    )  # NHWC out (2, 5, 6, 3)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), expected, atol=1e-5)


def test_circpad_matches_reference():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 6, 2).astype(np.float32)
    out = np.asarray(circpad(jnp.array(x), 2))
    assert out.shape == (1, 3, 10, 2)
    np.testing.assert_allclose(out[:, :, :2], x[:, :, -2:])
    np.testing.assert_allclose(out[:, :, 2:8], x)
    np.testing.assert_allclose(out[:, :, 8:], x[:, :, :2])


def test_symmetrize_texture_matches_torch_reference():
    import torch

    rng = np.random.RandomState(2)
    x = rng.rand(2, 3, 4, 5).astype(np.float32)  # NCHW: W=5... use even W
    x = rng.rand(2, 3, 4, 6).astype(np.float32)

    xt = torch.tensor(x)
    x_flip = torch.flip(xt, (3,))
    expected = torch.cat(
        (x_flip[:, :, :, x_flip.shape[3] // 2 :], xt, x_flip[:, :, :, : x_flip.shape[3] // 2]),
        dim=-1,
    ).numpy()

    ours = np.asarray(symmetrize_texture(jnp.array(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), expected, atol=1e-6)


def test_adjust_poles_matches_torch_reference():
    import torch

    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 5, 8).astype(np.float32)
    xt = torch.tensor(x)
    top = xt[:, :, :1].mean(dim=3, keepdim=True).expand(-1, -1, -1, xt.shape[3])
    middle = xt[:, :, 1:-1]
    bottom = xt[:, :, -1:].mean(dim=3, keepdim=True).expand(-1, -1, -1, xt.shape[3])
    expected = torch.cat((top, middle, bottom), dim=2).numpy()

    ours = np.asarray(adjust_poles(jnp.array(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), expected, atol=1e-6)


def test_resize_half_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    x = rng.rand(3, 16, 16).astype(np.float32)
    expected = (
        F.interpolate(
            torch.tensor(x).unsqueeze(0),
            scale_factor=0.5,
            mode="bilinear",
            align_corners=True,
        )
        .squeeze(0)
        .numpy()
    )
    ours = np.asarray(resize_bilinear_half(jnp.array(x)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_resize_upsample():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(5)
    x = rng.rand(1, 4, 4, 2).astype(np.float32)
    expected = F.interpolate(
        torch.tensor(x.transpose(0, 3, 1, 2)),
        size=(9, 7),
        mode="bilinear",
        align_corners=True,
    ).numpy()
    ours = np.asarray(resize_bilinear(jnp.array(x), 9, 7))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), expected, atol=1e-5)
