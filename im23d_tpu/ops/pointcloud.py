"""Point-cloud utilities: shape-static dropout and batch repetition.

The reference drops points by gathering a dynamic subset of size
``ceil(N * p)`` (``code/utils/dropout.py:20-37``), which is shape-dynamic and
hostile to XLA.  TPU-first equivalent: keep all N points and zero the splat
*weights* of dropped ones — exactly ``ceil(N*p)`` survivors per cloud, chosen
uniformly at random, with p a traced scalar so the keep-prob schedule never
recompiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_mask(rng: jax.Array, batch: int, n_points: int, p: jnp.ndarray) -> jnp.ndarray:
    """(B, N) float mask with exactly ceil(N*p) ones per row, uniform at random.

    Equivalent in distribution to the reference ``PointCloudDropOut``
    (randperm + take-first-ceil(N*p)); implemented as a rank threshold over
    i.i.d. uniforms so shapes stay static under jit while p is traced.
    """
    u = jax.random.uniform(rng, (batch, n_points))
    # rank of each element within its row (0 = smallest)
    order = jnp.argsort(u, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    m = jnp.ceil(n_points * p)
    return (ranks < m).astype(jnp.float32)


def repeat_interleave_batch(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat each batch row n times, interleaved: [a, b] -> [a, a, b, b].

    Parity: ``repeat_tensor_for_each_element_in_batch``
    (``code/utils/batch_repetition.py:6-19``).
    """
    return jnp.repeat(x, n, axis=0)
