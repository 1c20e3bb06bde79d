import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.ops import keep_mask, repeat_interleave_batch


def test_keep_mask_exact_count():
    rng = jax.random.PRNGKey(0)
    for p in [0.07, 0.25, 0.5, 0.999, 1.0]:
        m = np.asarray(keep_mask(rng, 4, 100, jnp.float32(p)))
        # count is computed at float32 precision on device (the reference's
        # math.ceil runs in float64; schedule behavior is identical)
        expected = int(np.ceil(np.float32(100) * np.float32(p)))
        np.testing.assert_array_equal(m.sum(axis=-1), expected)
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_keep_mask_traced_p_no_recompile():
    traces = []

    def f(rng, p):
        traces.append(1)
        return keep_mask(rng, 2, 50, p)

    jf = jax.jit(f)
    rng = jax.random.PRNGKey(1)
    jf(rng, jnp.float32(0.1))
    jf(rng, jnp.float32(0.9))
    assert len(traces) == 1  # p is traced, schedule does not retrigger compile


def test_keep_mask_randomness():
    m1 = np.asarray(keep_mask(jax.random.PRNGKey(0), 1, 100, jnp.float32(0.5)))
    m2 = np.asarray(keep_mask(jax.random.PRNGKey(1), 1, 100, jnp.float32(0.5)))
    assert not np.array_equal(m1, m2)


def test_repeat_interleave_matches_reference():
    import torch

    x = np.arange(12, dtype=np.float32).reshape(3, 2, 2)
    ours = np.asarray(repeat_interleave_batch(jnp.array(x), 3))

    # reference repeat_tensor_for_each_element_in_batch (batch_repetition.py:6-19)
    t = torch.tensor(x)
    data_shape = t.shape[1:]
    expanded = t.unsqueeze(1).repeat(1, 3, 1, 1)
    expected = expanded.view(-1, *data_shape).numpy()
    np.testing.assert_array_equal(ours, expected)
