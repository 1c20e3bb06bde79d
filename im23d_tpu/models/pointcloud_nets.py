"""Pipeline A networks: image encoder, point-cloud decoder, pose ensemble.

Capability parity with the reference models (``code/models/encoder.py``,
``code/models/decoder.py``, ``code/models/pose_decoder.py``,
``code/models/unsupervised_part.py``, ``code/models/supervised_part.py``),
re-designed for TPU:

* NHWC layout, flax.linen modules, Kaiming(He) initialization like the
  reference's ``kaiming_initialization`` (``unsupervised_part.py:47-51``).
* The point decoder's linear heads are proper parameters (the reference
  constructs ``nn.Linear`` inside ``forward`` — ``decoder.py:22-31`` — which
  re-randomizes weights every call; we implement the intent).
* The projection itself lives in ``im23d_tpu/losses/effective.py`` as a pure
  function so the training step controls dropout rng and the p/sigma
  schedules without mutating module state.
* Mixed precision: ``compute_dtype`` sets the conv/dense compute dtype
  (params stay float32).  The point-cloud / scale / quaternion heads always
  run and return float32 — bf16 tanh outputs would quantize point positions
  by ~1/4 voxel at grid 64, and the projection kernels expect f32 poses.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_normal_(a=0) == variance_scaling(2.0, fan_in, normal)
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ConvEncoder(nn.Module):
    """9-conv / 2-FC image encoder -> 1024-d feature.

    Parity: reference ``Encoder`` (``encoder.py:12-49``): 16-channel convs
    with strides (2,2,1,2,1,2,1,2,1), bias + ReLU (no norm since bias=True
    per ``basic_blocks.py:22-27``), then Flatten -> 1024 -> ReLU -> 1024.
    """

    features: int = 1024
    channels: int = 16
    strides: Sequence[int] = (2, 2, 1, 2, 1, 2, 1, 2, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, s in enumerate(self.strides):
            k = 5 if i == 0 else 3
            x = nn.Conv(
                self.channels,
                (k, k),
                strides=(s, s),
                # symmetric k//2 padding (torch semantics; flax SAME is
                # asymmetric under stride 2)
                padding=((k // 2, k // 2), (k // 2, k // 2)),
                use_bias=True,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.features, kernel_init=kaiming_normal,
                     dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.features, kernel_init=kaiming_normal,
                     dtype=self.dtype)(x)
        return x


class PointCloudDecoder(nn.Module):
    """Latent -> (point cloud in [-0.5, 0.5]^3, sigmoid scale).

    Parity (intent): reference ``Decoder`` (``decoder.py:15-34``) —
    Linear(z -> N*3), tanh/2; optional Linear(z -> 1), sigmoid.
    """

    num_points: int = 8000
    predict_scale: bool = True

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        z = z.astype(jnp.float32)
        pc = nn.Dense(self.num_points * 3, kernel_init=kaiming_normal)(z)
        pc = jnp.tanh(pc.reshape(-1, self.num_points, 3)) / 2.0
        scale = None
        if self.predict_scale:
            scale = nn.sigmoid(nn.Dense(1, kernel_init=kaiming_normal)(z))
        return pc, scale


class _PoseHead(nn.Module):
    """3-layer quaternion regression head (``basic_blocks.py:36-49``)."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Dense(self.hidden, kernel_init=kaiming_normal,
                             dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, kernel_init=kaiming_normal,
                             dtype=self.dtype)(x))
        # quaternion head in f32: the ensemble argmin + student angle loss
        # compare candidates whose bf16 gap can round to zero
        return nn.Dense(4, kernel_init=kaiming_normal)(x.astype(jnp.float32))


class PoseDecoder(nn.Module):
    """Ensemble-of-pose-regressors + student head.

    Parity: reference ``PoseDecoder`` (``pose_decoder.py:17-66``). Each of the
    K ensemble heads shares one Linear+ReLU trunk; the student has its own
    trunk + head (>= 3 non-shared layers, per the reference's design note).

    Returns ``(ensemble, student)`` with shapes (B, K, 4) and (B, 4); at
    inference the caller simply uses ``student``.  (The reference returns a
    flattened concatenation; we keep the candidate axis explicit — better for
    vectorized projection and argmin selection.)
    """

    hidden: int = 128
    num_candidates: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        student = _PoseHead(self.hidden, dtype=self.dtype, name="student_head")(
            nn.relu(nn.Dense(self.hidden, kernel_init=kaiming_normal,
                             dtype=self.dtype, name="student_trunk")(z))
        )
        shared = nn.relu(
            nn.Dense(self.hidden, kernel_init=kaiming_normal,
                     dtype=self.dtype, name="ensemble_trunk")(z)
        )
        ensemble = jnp.stack(
            [
                _PoseHead(self.hidden, dtype=self.dtype, name=f"head_{k}")(shared)
                for k in range(self.num_candidates)
            ],
            axis=1,
        )
        return ensemble, student


class UnsupervisedPart(nn.Module):
    """Single-image point cloud + ensemble pose prediction.

    Parity: reference ``UnsupervisedPart`` (``unsupervised_part.py:15-87``)
    minus the projection, which is a pure function in
    ``im23d_tpu.losses.effective`` (the training step owns dropout rng and
    the p/sigma schedules).

    ``__call__(images, pose_images)`` -> dict with:
      * ``point_cloud``: (B, N, 3) in (z, y, x) order
      * ``scale``: (B, 1)
      * ``ensemble_q``: (P, K, 4)  — P = number of pose images (B*V)
      * ``student_q``: (P, 4)
    """

    num_points: int = 8000
    z_dim: int = 1024
    pose_hidden: int = 128
    num_candidates: int = 4
    num_views: int = 5
    compute_dtype: str = "float32"

    def setup(self):
        dt = jnp.dtype(self.compute_dtype)
        self.encoder = ConvEncoder(features=self.z_dim, dtype=dt)
        self.decoder = PointCloudDecoder(num_points=self.num_points)
        self.pose_decoder = PoseDecoder(
            hidden=self.pose_hidden, num_candidates=self.num_candidates,
            dtype=dt,
        )

    def __call__(self, images: jnp.ndarray, pose_images: jnp.ndarray):
        img_feat = self.encoder(images)
        # Same encoder weights consume both the target image and the view
        # images used for pose prediction (``unsupervised_part.py:60-61``).
        pose_feat = self.encoder(pose_images)
        point_cloud, scale = self.decoder(img_feat)
        ensemble_q, student_q = self.pose_decoder(pose_feat)
        return dict(
            point_cloud=point_cloud,
            scale=scale,
            ensemble_q=ensemble_q,
            student_q=student_q,
        )


class SupervisedPart(nn.Module):
    """Point-cloud prediction with ground-truth camera poses (no ensemble).

    Parity (intent): reference ``SupervisedPart`` (``supervised_part.py:13-72``,
    fixing its ``self.decoder``/``point_cloud_decoder`` attribute bug).
    """

    num_points: int = 8000
    z_dim: int = 1024
    compute_dtype: str = "float32"

    def setup(self):
        self.encoder = ConvEncoder(features=self.z_dim,
                                   dtype=jnp.dtype(self.compute_dtype))
        self.decoder = PointCloudDecoder(num_points=self.num_points)

    def __call__(self, images: jnp.ndarray):
        feat = self.encoder(images)
        point_cloud, scale = self.decoder(feat)
        return dict(point_cloud=point_cloud, scale=scale)
