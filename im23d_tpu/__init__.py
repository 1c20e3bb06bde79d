"""im23d_tpu — TPU-native single-image-to-3D framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``NikolaZubic/2dimageto3dmodel`` (AIAI 2021, arXiv:2103.03390):

* Pipeline A — unsupervised single-image point-cloud reconstruction with a
  rendering-free projection ("effective") loss and an ensemble of pose
  predictors (reference: ``code/models/unsupervised_part.py``,
  ``code/utils/effective_loss_function.py``).
* Pipeline B — textured-mesh estimation + pseudo-ground-truth generation +
  a convolutional texture/mesh GAN in UV space (reference: ``code/main.py``,
  ``code/run_reconstruction.py``, ``code/models/gan.py``).

The package name is ``im23d_tpu`` ("2D image to 3D model, TPU") because a
Python package identifier cannot begin with a digit.

Design notes (TPU-first, not a port):

* All compute-path code is functional JAX under ``jax.jit``; static shapes
  everywhere (point-cloud dropout is a weight mask, not a gather of a
  dynamic subset).
* Parallelism is SPMD over a ``jax.sharding.Mesh`` — data-parallel batch
  sharding with XLA-inserted collectives replaces the reference's
  ``nn.DataParallel`` + 740-LoC thread/queue sync-batchnorm machinery
  (reference ``code/sync_batchnorm/``); cross-replica norm is a single
  ``pmean`` of batch moments.
* Hot kernels (point splatting, rasterization, UV sampling, Chamfer) have
  XLA reference implementations and Pallas TPU kernels where the MXU/VPU
  mapping pays off.
"""

__version__ = "0.1.0"
