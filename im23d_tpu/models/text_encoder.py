"""Caption encoder for text-conditional GAN training (AttnGAN-style).

The reference wires ``--conditional_text`` through a pretrained
``RNN_Encoder`` that is referenced but never defined or imported anywhere
(``code/main.py:539`` — the flag cannot actually run as shipped; SURVEY.md
§2.1 bug list).  This is a working equivalent: a bidirectional LSTM over
caption tokens producing per-word features for ``SpatialAttention``
(``models/gan.py``) and a sentence embedding, matching the AttnGAN text
encoder interface (words_emb (B, L, D), sent_emb (B, D)).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TextEncoder(nn.Module):
    """tokens (B, L) int32 (0 = pad) -> (words_emb (B, L, D), sent_emb (B, D))."""

    vocab_size: int
    embedding_dim: int = 256
    hidden_dim: int = 128  # per direction; 2 * hidden == embedding_dim default
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, lengths: jnp.ndarray | None = None,
                 train: bool = False):
        B, L = tokens.shape
        emb = nn.Embed(self.vocab_size, self.embedding_dim, name="embed")(tokens)
        if self.dropout_rate > 0:
            emb = nn.Dropout(self.dropout_rate, deterministic=not train)(emb)

        mask = (tokens != 0).astype(emb.dtype)  # (B, L)

        h_fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_dim), name="lstm_fwd"
        )(emb)
        h_bwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_dim), name="lstm_bwd"
        )(emb, reverse=True, keep_order=True)
        words = jnp.concatenate([h_fwd, h_bwd], axis=-1)  # (B, L, 2H)
        words = words * mask[..., None]

        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        sent = jnp.sum(words, axis=1) / denom  # masked mean pooling
        return words, sent


def caption_mask(tokens: jnp.ndarray) -> jnp.ndarray:
    """Padding mask for SpatialAttention (True where padded)."""
    return tokens == 0
