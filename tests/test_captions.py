"""Caption tokenization cache + pretrained text-encoder conversion.

The reference's text-conditional path is dead code (undefined
``RNN_Encoder``, no caption tokenizer — SURVEY.md §2.1); these tests pin the
working equivalents: the ``captions_tokens.npz`` producer consumed by
``PseudoGTDataset`` and the AttnGAN-state-dict -> flax converter, checked
for numerical parity against a real torch bidirectional LSTM.
"""

import os

import numpy as np

from im23d_tpu.data.captions import (
    build_caption_cache,
    build_vocab,
    encode,
    tokenize,
)


def test_tokenize():
    assert tokenize("This bird's wings are BLUE, really blue!") == [
        "this", "bird", "s", "wings", "are", "blue", "really", "blue",
    ]


def test_encode_pads_and_truncates():
    vocab = build_vocab([[["a", "b", "c"]]])
    ids, n = encode(["a", "b"], vocab, 4)
    assert ids == [vocab["a"], vocab["b"], 0, 0] and n == 2
    ids, n = encode(["a", "b", "c", "a", "b"], vocab, 3)
    assert len(ids) == 3 and n == 3


def test_build_caption_cache_roundtrip(tmp_path):
    cache = tmp_path / "cache" / "cub"
    cache.mkdir(parents=True)
    paths = ["001.A/b.jpg", "001.A/c.jpg", "002.B/d.jpg"]
    np.savez(cache / "poses_metadata.npz",
             data=dict(path=paths, scale=np.zeros((3, 1)),
                       translation=np.zeros((3, 3)),
                       rotation=np.zeros((3, 4))))
    text = tmp_path / "text"
    (text / "001.A").mkdir(parents=True)
    (text / "001.A" / "b.txt").write_text(
        "a small blue bird\nthe bird has blue wings\n")
    (text / "001.A" / "c.txt").write_text("a red bird\n")
    # 002.B/d.jpg has no caption file -> all-pad rows

    out = build_caption_cache(str(cache), str(text), embeddings_num=3,
                              max_length=5)
    cap = np.load(out)
    tokens = cap["tokens"]
    assert tokens.shape == (3, 3, 5)
    assert tokens.dtype == np.int32
    vocab = list(cap["vocab"])
    assert vocab[0] == "<pad>"
    assert int(cap["n_words"]) == len(vocab)
    # first caption of first image decodes back
    decoded = [vocab[t] for t in tokens[0, 0] if t != 0]
    assert decoded == ["a", "small", "blue", "bird"]
    # fewer captions than embeddings_num -> cycled, not empty
    assert tokens[1, 1].sum() > 0
    # captionless image -> all pad
    assert tokens[2].sum() == 0
    # lengths recorded
    assert cap["lengths"][0, 0] == 4

    # the GAN dataset consumes the cache directly
    from im23d_tpu.data.pseudogt import PseudoGTDataset

    pg = cache / "pseudogt_8x8"
    pg.mkdir()
    for i in range(3):
        np.savez(pg / f"{i}.npz", data=dict(
            image=np.zeros((4, 8, 8), np.float16),
            texture=np.zeros((3, 8, 8), np.float16),
            texture_alpha=np.zeros((1, 8, 8), np.float16),
            mesh=np.zeros((3, 8, 8), np.float16),
        ))
    ds = PseudoGTDataset(str(cache), texture_resolution=8,
                         conditional_text=True)
    assert ds.n_words == len(vocab)
    item = ds[0]
    assert item["caption"].shape == (5,)


def test_convert_text_encoder_matches_torch_lstm():
    torch = __import__("torch")
    import jax
    import jax.numpy as jnp

    from im23d_tpu.core.torch_convert import convert_text_encoder
    from im23d_tpu.models.text_encoder import TextEncoder

    V, E, H, B, L = 23, 12, 7, 3, 6
    torch.manual_seed(0)
    emb = torch.nn.Embedding(V, E)
    rnn = torch.nn.LSTM(E, H, batch_first=True, bidirectional=True)

    sd = {"encoder.weight": emb.weight.detach().numpy()}
    for key, val in rnn.state_dict().items():
        sd[f"rnn.{key}"] = val.numpy()

    params, cfg = convert_text_encoder(sd)
    assert cfg == dict(vocab_size=V, embedding_dim=E, hidden_dim=H)

    rng = np.random.RandomState(0)
    tokens = rng.randint(1, V, size=(B, L))  # no padding: torch runs dense

    with torch.no_grad():
        out_t, _ = rnn(emb(torch.tensor(tokens)))
    out_t = out_t.numpy()  # (B, L, 2H), [fwd, bwd] concat

    te = TextEncoder(vocab_size=V, embedding_dim=E, hidden_dim=H)
    words, sent = te.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                           jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(words), out_t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sent), out_t.mean(axis=1), atol=1e-5
    )
