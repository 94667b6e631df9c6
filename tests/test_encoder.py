"""Text-encoder parity: masked-scan RNN vs torch packed-sequence RNN, and the
SBERT pooling math vs a NumPy transliteration (SURVEY.md §4 parity tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.models.encoder import RNNEncoder, SBERTEncoder, words_pooling


def _torch_birnn_reference(rnn_type, caps, cap_lens, params, nhidden):
    """Ground truth via torch pack_padded/pad_packed (the reference's exact
    mechanism, encoder.py:120-153) using our converted parameter layout."""
    import torch

    B, T = caps.shape
    emb = torch.from_numpy(params["embedding"])
    cls = torch.nn.LSTM if rnn_type == "LSTM" else torch.nn.GRU
    rnn = cls(300, nhidden, 1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
            getattr(rnn, name).copy_(torch.from_numpy(params[name]))
            getattr(rnn, name + "_reverse").copy_(
                torch.from_numpy(params[name + "_reverse"])
            )
        x = emb[torch.from_numpy(caps)]
        lens = torch.from_numpy(cap_lens)
        order = torch.argsort(lens, descending=True)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x[order], lens[order].tolist(), batch_first=True
        )
        out, hidden = rnn(packed)
        out = torch.nn.utils.rnn.pad_packed_sequence(
            out, batch_first=True, total_length=T
        )[0]
        h_n = hidden[0] if rnn_type == "LSTM" else hidden
        sent = h_n.transpose(0, 1).reshape(B, 2 * nhidden)
        inv = torch.argsort(order)
        return out[inv].numpy(), sent[inv].numpy()


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_rnn_encoder_matches_torch_packed(rnn_type):
    cfg = cfg_from_dict(
        {"TEXT": {"EMBEDDING_DIM": 32, "MAX_LENGTH": 7, "VOCA_SIZE": 50,
                  "RNN_TYPE": rnn_type}}
    )
    model = RNNEncoder(cfg)
    rng = np.random.RandomState(0)
    B, T = 5, 7
    cap_lens = np.array([7, 3, 1, 5, 4], np.int64)
    caps = np.zeros((B, T), np.int64)
    for i, L in enumerate(cap_lens):
        caps[i, :L] = rng.randint(1, 50, L)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(caps))
    params = {k: np.asarray(v) for k, v in variables["params"].items()}

    want_words, want_sent = _torch_birnn_reference(
        rnn_type, caps, cap_lens, params, nhidden=16
    )
    words, sent, mask = model.apply(
        variables, jnp.asarray(caps), jnp.asarray(cap_lens)
    )
    np.testing.assert_allclose(np.asarray(words), want_words, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent), want_sent, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), caps == 0)


def test_rnn_encoder_infers_lengths_from_padding():
    cfg = cfg_from_dict({"TEXT": {"EMBEDDING_DIM": 16, "VOCA_SIZE": 30}})
    model = RNNEncoder(cfg)
    caps = np.zeros((2, 6), np.int64)
    caps[0, :4] = [3, 4, 5, 6]
    caps[1, :2] = [7, 8]
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(caps))
    w_auto, s_auto, _ = model.apply(variables, jnp.asarray(caps))
    w_len, s_len, _ = model.apply(
        variables, jnp.asarray(caps), jnp.asarray([4, 2])
    )
    np.testing.assert_allclose(np.asarray(w_auto), np.asarray(w_len))
    np.testing.assert_allclose(np.asarray(s_auto), np.asarray(s_len))


def test_sbert_pooling_matches_numpy_transliteration():
    """Reference SBERT_ENCODER.forward math (encoder.py:50-66): zero padding,
    sum/count mean pool, optional L2 norm, mask = attn==0."""
    cfg = cfg_from_dict({"TEXT": {"EMBEDDING_DIM": 12, "BERT_NORM": True}})
    model = SBERTEncoder(cfg)
    rng = np.random.RandomState(2)
    B, T, D = 4, 6, 12
    tok = rng.randn(B, T, D).astype(np.float32)
    attn = np.zeros((B, T), np.int32)
    for i, L in enumerate([6, 2, 4, 1]):
        attn[i, :L] = 1

    words, sent, mask = model.apply({}, jnp.asarray(tok), jnp.asarray(attn))

    want_words = tok * attn[..., None]
    want_sent = want_words.sum(1) / attn.sum(1, keepdims=True)
    want_sent = want_sent / np.linalg.norm(want_sent, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(words), want_words, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sent), want_sent, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), attn == 0)


def test_rnn_export_roundtrip():
    """Flax -> torch state_dict -> Flax identity for the text encoder."""
    from xmc_gan_tpu.utils.convert import rnn_encoder_params, rnn_encoder_state_dict

    cfg = cfg_from_dict({"TEXT": {"EMBEDDING_DIM": 16, "VOCA_SIZE": 30}})
    model = RNNEncoder(cfg)
    variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 5), jnp.int32))
    back = rnn_encoder_params(rnn_encoder_state_dict(variables["params"]))
    for k, v in variables["params"].items():
        np.testing.assert_array_equal(np.asarray(v), back[k], err_msg=k)


def test_rnn_converter_roundtrip(tmp_path):
    """state_dict saved by a torch module with the reference's names converts
    and loads into RNNEncoder (utils/convert.py)."""
    import torch

    from xmc_gan_tpu.utils.convert import load_rnn_encoder

    emb = torch.nn.Embedding(30, 300)
    rnn = torch.nn.LSTM(300, 8, 1, batch_first=True, bidirectional=True)
    sd = {f"encoder.{k}": v for k, v in emb.state_dict().items()}
    sd.update({f"rnn.{k}": v for k, v in rnn.state_dict().items()})
    path = tmp_path / "text_encoder100.pth"
    torch.save(sd, path)

    params = load_rnn_encoder(str(path))
    cfg = cfg_from_dict({"TEXT": {"EMBEDDING_DIM": 16, "VOCA_SIZE": 30}})
    model = RNNEncoder(cfg)
    caps = jnp.asarray(np.array([[1, 2, 3, 0, 0]]))
    words, sent, mask = model.apply({"params": params}, caps)
    assert words.shape == (1, 5, 16) and sent.shape == (1, 16)
    want_words, want_sent = _torch_birnn_reference(
        "LSTM", np.array([[1, 2, 3, 0, 0]]), np.array([3]), params, nhidden=8
    )
    np.testing.assert_allclose(np.asarray(words), want_words, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sent), want_sent, rtol=1e-5, atol=1e-5)
