"""Frozen text encoders: DAMSM bi-RNN and Sentence-BERT pooling.

TPU-native re-design of the reference encoders (``xmc_gan/model/encoder.py``):

* ``RNNEncoder`` — the DAMSM bi-LSTM/GRU (reference ``RNN_ENCODER:73-153``).
  The reference sorts the batch by length, packs, runs cuDNN RNN, unpacks and
  unsorts.  Packed sequences are a GPU-kernel artifact; on TPU a fixed-length
  masked ``lax.scan`` is the right shape: static shapes, no sorting, identical
  semantics (per-step outputs zeroed past each caption's length; final state
  taken at ``len-1`` for the forward direction and after index 0 for the
  backward direction — exactly what pack/pad_packed produce).
  Parameters use the PyTorch layout and naming (``weight_ih_l0`` = ``[4H, in]``
  with i,f,g,o gate order, ``..._reverse`` for the backward direction) so the
  pretrained ``text_encoder100.pth`` converts by direct copy
  (``xmc_gan_tpu.utils.convert.load_rnn_encoder``).

* ``SBERTEncoder`` — masked-mean pooling over RoBERTa token embeddings
  (reference ``SBERT_ENCODER:25-70``).  The reference tokenizes raw strings and
  runs SentenceTransformer *inside the train loop on the training device*; the
  TPU design moves tokenization + transformer encoding into the data pipeline
  (precompute-first, SURVEY.md §7 step 4) and keeps only the pure pooling math
  here, so the GAN step stays jittable and the 125M-parameter frozen RoBERTa
  never occupies HBM during training.  When HF Flax weights are available
  locally, ``xmc_gan_tpu.data.text_precompute`` uses this module's pooling on
  real token embeddings; otherwise embeddings come from a cache file.

Axis convention: this framework returns ``words_embs`` as ``[B, T, D]``
(time-major-last is what every attention einsum here consumes); the reference
returns ``[B, D, T]`` (``encoder.py:68,141``).  ``sent_embs`` is ``[B, D]``,
``mask`` is ``[B, T]`` with True = padding (matches reference ``caps == 0`` /
``attention_mask == 0``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import Config

Array = jax.Array

__all__ = ["RNNEncoder", "SBERTEncoder", "words_pooling"]


def words_pooling(words_embs: Array, mask: Array, mode: str = "MEAN") -> Array:
    """Masked mean-pool of token embeddings (reference ``words_pooling:16-23``).

    ``words_embs``: [B, T, D] already zeroed at padding positions;
    ``mask``: [B, T] True at padding.  Divides by the *token count*, exactly the
    reference's ``sum_embeddings / sum_mask``.
    """
    if mode != "MEAN":
        raise NotImplementedError(f"POOLING_MODE={mode!r} (reference parity)")
    counts = jnp.sum(~mask, axis=1, keepdims=True).astype(words_embs.dtype)
    return jnp.sum(words_embs, axis=1) / jnp.maximum(counts, 1.0)


def _lstm_step(carry, x_t, w_ih, w_hh, b_ih, b_hh):
    """PyTorch-layout LSTM cell: gate order i, f, g, o (torch.nn.LSTM docs)."""
    h, c = carry
    gates = x_t @ w_ih.T + b_ih + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return (h_new, c_new)


def _gru_step(carry, x_t, w_ih, w_hh, b_ih, b_hh):
    """PyTorch-layout GRU cell: gate order r, z, n."""
    (h,) = carry
    gi = x_t @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return ((1.0 - z) * n + z * h,)


class RNNEncoder(nn.Module):
    """DAMSM text encoder: Embedding(300) + dropout + bidirectional LSTM/GRU.

    Reference: ``encoder.py:73-153``.  Frozen during GAN training (the
    reference loads ``text_encoder100.pth``, sets ``requires_grad=False`` and
    ``.eval()``, ``train_gan.py:463-468``), so dropout defaults off.
    """

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, caps: Array, cap_lens: Array | None = None, *, deterministic: bool = True
    ) -> tuple[Array, Array, Array]:
        tc = self.cfg.TEXT
        ninput, drop_prob = 300, 0.5  # reference encoder.py:80-81
        nhidden = tc.EMBEDDING_DIM // 2  # bidirectional, encoder.py:90
        n_gates = 4 if tc.RNN_TYPE == "LSTM" else 3
        if tc.RNN_TYPE not in ("LSTM", "GRU"):
            raise NotImplementedError(f"RNN_TYPE={tc.RNN_TYPE!r} (reference parity)")
        step = _lstm_step if tc.RNN_TYPE == "LSTM" else _gru_step

        B, T = caps.shape
        if cap_lens is None:
            cap_lens = jnp.sum(caps != 0, axis=1)
        mask = caps == 0  # reference encoder.py:149

        # Embedding table init uniform(-0.1, 0.1) (reference _init_weights:110).
        embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.1, 0.1),
            (tc.VOCA_SIZE, ninput),
        )
        embs = jnp.take(embedding, caps, axis=0).astype(self.dtype)
        embs = nn.Dropout(drop_prob, deterministic=deterministic)(embs)

        # torch default RNN init: every weight/bias ~ U(-1/sqrt(H), 1/sqrt(H)).
        bound = 1.0 / jnp.sqrt(nhidden)

        def uni(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        def run_direction(suffix: str, reverse: bool):
            w_ih = self.param(f"weight_ih_l0{suffix}", uni, (n_gates * nhidden, ninput))
            w_hh = self.param(f"weight_hh_l0{suffix}", uni, (n_gates * nhidden, nhidden))
            b_ih = self.param(f"bias_ih_l0{suffix}", uni, (n_gates * nhidden,))
            b_hh = self.param(f"bias_hh_l0{suffix}", uni, (n_gates * nhidden,))

            h0 = jnp.zeros((B, nhidden), self.dtype)
            carry0 = (h0, jnp.zeros((B, nhidden), self.dtype)) if n_gates == 4 else (h0,)
            ts = jnp.arange(T - 1, -1, -1) if reverse else jnp.arange(T)

            def scan_body(carry, t):
                x_t = embs[:, t, :]
                valid = (t < cap_lens)[:, None]
                new_carry = step(carry, x_t, w_ih, w_hh, b_ih, b_hh)
                # Past each caption's length the packed RNN never ran: hold the
                # carry (=> final state is the state at len-1) and emit zeros
                # (pad_packed_sequence zero-fill, encoder.py:140).
                carry = tuple(
                    jnp.where(valid, n, o) for n, o in zip(new_carry, carry)
                )
                return carry, jnp.where(valid, carry[0], 0.0)

            carry, outs = jax.lax.scan(scan_body, carry0, ts)
            outs = jnp.moveaxis(outs, 0, 1)  # [B, T, H] in scan order
            if reverse:
                outs = outs[:, ::-1, :]
            return outs, carry[0]

        out_f, h_f = run_direction("", reverse=False)
        out_b, h_b = run_direction("_reverse", reverse=True)

        # words: per-step [fwd; bwd] states; sent: final hidden of both
        # directions, fwd first (torch h_n layout, encoder.py:144-147).
        words_embs = jnp.concatenate([out_f, out_b], axis=-1)  # [B, T, D]
        sent_embs = jnp.concatenate([h_f, h_b], axis=-1)  # [B, D]
        return words_embs, sent_embs, mask


class SBERTEncoder(nn.Module):
    """Pooling head over (precomputed) Sentence-BERT token embeddings.

    Reference ``SBERT_ENCODER.forward`` (``encoder.py:41-70``) minus the
    tokenizer/transformer, which the TPU design runs in the data pipeline.
    Input: ``token_embs`` [B, T, D] raw transformer outputs, ``attn_mask``
    [B, T] with 1 = real token.  Output matches the reference: token embeddings
    zeroed at padding, masked mean-pooled sentence embedding (optionally
    L2-normalized per ``TEXT.BERT_NORM``), and ``mask = attn_mask == 0``.
    """

    cfg: Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, token_embs: Array, attn_mask: Array) -> tuple[Array, Array, Array]:
        tc = self.cfg.TEXT
        mask = attn_mask == 0
        words_embs = token_embs.astype(self.dtype) * (~mask)[..., None].astype(self.dtype)
        sent_embs = words_pooling(words_embs, mask, tc.POOLING_MODE)
        if tc.BERT_NORM:  # reference encoder.py:65-66
            sent_embs = sent_embs / jnp.maximum(
                jnp.linalg.norm(sent_embs, axis=1, keepdims=True), 1e-12
            )
        return words_embs, sent_embs, mask
