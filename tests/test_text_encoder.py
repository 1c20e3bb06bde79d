import jax
import jax.numpy as jnp
import numpy as np

from im23d_tpu.models.gan import GANConfig, Generator, SpatialAttention
from im23d_tpu.models.text_encoder import TextEncoder, caption_mask


def test_text_encoder_shapes_and_masking():
    enc = TextEncoder(vocab_size=50, embedding_dim=32, hidden_dim=16)
    tokens = jnp.asarray([[3, 7, 2, 0, 0], [1, 0, 0, 0, 0]], jnp.int32)
    variables = enc.init(jax.random.PRNGKey(0), tokens)
    words, sent = enc.apply(variables, tokens)
    assert words.shape == (2, 5, 32)
    assert sent.shape == (2, 32)
    # padded positions produce zero word features
    np.testing.assert_allclose(np.asarray(words[0, 3:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(words[1, 1:]), 0.0, atol=1e-6)


def test_text_conditional_generator_runs():
    cfg = GANConfig(texture_resolution=128, conditional_text=True,
                    text_embedding_dim=32)
    gen = Generator(cfg, mesh_head=True)
    enc = TextEncoder(vocab_size=50, embedding_dim=32, hidden_dim=16)
    tokens = jnp.asarray([[3, 7, 2, 0, 0], [1, 4, 0, 0, 0]], jnp.int32)
    enc_vars = enc.init(jax.random.PRNGKey(0), tokens)
    words, _ = enc.apply(enc_vars, tokens)
    caption = (words, caption_mask(tokens))

    z = jnp.zeros((2, cfg.latent_dim))
    variables = gen.init(jax.random.PRNGKey(1), z, None, caption, train=False)
    (tex, mesh), _ = gen.apply(
        variables, z, None, caption, train=True, mutable=["batch_stats"]
    )
    assert tex.shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(tex)).all()


def test_spatial_attention_mask_blocks_padded_words():
    att = SpatialAttention()
    x = jnp.ones((1, 4, 4, 8))
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(1, 3, 8).astype(np.float32))
    variables = att.init(jax.random.PRNGKey(0), x, ctx)
    mask = jnp.asarray([[False, False, True]])
    out, attn = att.apply(variables, x, ctx, mask)
    attn = np.asarray(attn).reshape(1, 16, 3)
    np.testing.assert_allclose(attn[..., 2], 0.0, atol=1e-4)  # masked word
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
