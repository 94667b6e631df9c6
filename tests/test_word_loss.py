"""Word-region contrastive loss: golden test vs a NumPy transliteration of the
AttnGAN/DAMSM attentional score, mask invariance, and a full train step with
ENCODER_LOSS.WORD enabled."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu import losses
from xmc_gan_tpu.config import cfg_from_dict


def _np_word_score(regions, words, mask, g1=4.0, g2=5.0, g3=10.0):
    """NumPy reference of the attentional matching score matrix [B_img, B_cap]."""
    def norm(x, axis):
        return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)

    r = norm(regions.astype(np.float64), -1)  # [B, R, D]
    w = norm(words.astype(np.float64), -1)  # [B, T, D]
    B, T, _ = w.shape
    R = r.shape[1]
    score = np.zeros((B, B))
    for i in range(B):  # image
        for j in range(B):  # caption
            sim = w[j] @ r[i].T  # [T, R]
            e = np.exp(g1 * sim)
            attn = e / e.sum(axis=1, keepdims=True)
            ctx = attn @ r[i]  # [T, D]
            ctx = norm(ctx, -1)
            rel = (ctx * w[j]).sum(-1)  # [T]
            valid = ~mask[j]
            score[i, j] = np.log(np.exp(g2 * rel[valid]).sum()) / g2
    return g3 * score


def test_word_loss_matches_numpy_golden():
    rng = np.random.RandomState(0)
    B, R, T, D = 5, 9, 6, 12
    regions = rng.randn(B, R, D).astype(np.float32)
    words = rng.randn(B, T, D).astype(np.float32)
    mask = np.zeros((B, T), bool)
    for i, L in enumerate([6, 3, 5, 2, 4]):
        mask[i, L:] = True
    labels = np.eye(B, dtype=np.float32)

    want_scores = _np_word_score(regions, words, mask)
    # InfoNCE on the golden scores (num_pos = 1 when b_global off)
    def logsm(x, axis):
        m = x.max(axis=axis, keepdims=True)
        return x - m - np.log(np.exp(x - m).sum(axis=axis, keepdims=True))

    want = (-(logsm(want_scores, 0) * labels).sum(0)).mean() + \
           (-(logsm(want_scores, 1) * labels).sum(1)).mean()

    got = losses.word_loss(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(mask),
        jnp.asarray(labels), False, 0.5,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_word_loss_ignores_padded_words():
    rng = np.random.RandomState(1)
    B, R, T, D = 4, 8, 5, 10
    regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    words = rng.randn(B, T, D).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[:, 3:] = True
    labels = jnp.eye(B)
    a = losses.word_loss(regions, jnp.asarray(words), jnp.asarray(mask),
                         labels, False, 0.5)
    words2 = words.copy()
    words2[:, 3:, :] += 37.0
    b = losses.word_loss(regions, jnp.asarray(words2), jnp.asarray(mask),
                         labels, False, 0.5)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_word_region_scores_blockwise_matches_single_shot():
    """The LN-scale streaming path (lax.map over caption blocks + checkpoint)
    must agree with the single fused einsum — values and gradients — including
    when the caption count does not divide the block size (padding path)."""
    rng = np.random.RandomState(2)
    B, R, T, D = 5, 7, 11, 8
    regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    words = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, T) > 0.6)

    single = losses.word_region_scores(regions, words, mask, block_elems=None)
    # force caption blocks of 2 -> nb=3 with one padded caption
    blocked = losses.word_region_scores(
        regions, words, mask, block_elems=B * T * R * 2 // B
    )
    np.testing.assert_allclose(np.asarray(single), np.asarray(blocked), rtol=1e-5)

    labels = jnp.eye(B)

    def loss_fn(block_elems):
        def f(r, w):
            return losses.word_loss(r, w, mask, labels, False, 0.5,
                                    block_elems=block_elems)
        return f

    v1, (gr1, gw1) = jax.value_and_grad(loss_fn(None), argnums=(0, 1))(regions, words)
    v2, (gr2, gw2) = jax.value_and_grad(loss_fn(2 * T * R), argnums=(0, 1))(
        regions, words
    )
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gr1), np.asarray(gr2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-6)


def test_word_loss_streams_at_long_caption_shapes():
    """T=200 (LN-COCO MAX_LENGTH) exercises the streaming path end-to-end with
    gradients; block budget forces ~B/4-caption blocks as at the real config."""
    rng = np.random.RandomState(3)
    B, R, T, D = 8, 16, 200, 32
    regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    words = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = np.zeros((B, T), bool)
    for i in range(B):
        mask[i, 40 + 20 * i :] = True
    labels = jnp.eye(B)

    def f(r, w):
        return losses.word_loss(r, w, jnp.asarray(mask), labels, False, 0.5,
                                block_elems=2 * B * T * R // B)

    val, grads = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))(regions, words)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_word_score_matches_torch_damsm_oracle():
    """Cross-framework oracle: the DAMSM paper matching score (eqs. 7-10)
    written independently in torch — per-pair loops, torch's own
    softmax/cosine_similarity/logsumexp primitives, variable-length caption
    slicing instead of masks.  Catches normalization-axis, masking, and
    temperature bugs the vectorized NumPy transliteration could share."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    g1, g2, g3 = 4.0, 5.0, 10.0
    rng = np.random.RandomState(7)
    B, R, T, D = 6, 10, 9, 14
    regions = rng.randn(B, R, D).astype(np.float32)
    words = rng.randn(B, T, D).astype(np.float32)
    lens = [9, 4, 7, 2, 5, 8]
    mask = np.zeros((B, T), bool)
    for i, L in enumerate(lens):
        mask[i, L:] = True

    score = torch.zeros(B, B)
    tr = F.normalize(torch.from_numpy(regions), p=2, dim=-1)
    tw = F.normalize(torch.from_numpy(words), p=2, dim=-1)
    for i in range(B):  # image
        for j in range(B):  # caption
            e = tw[j, : lens[j]]  # [Tj, D]
            v = tr[i]  # [R, D]
            alpha = torch.softmax(g1 * (e @ v.T), dim=-1)  # attend regions
            c = F.normalize(alpha @ v, p=2, dim=-1)
            r = F.cosine_similarity(c, e, dim=-1)  # [Tj]
            score[i, j] = torch.logsumexp(g2 * r, dim=0) / g2

    got = losses.word_region_scores(
        jnp.asarray(regions), jnp.asarray(words), jnp.asarray(mask), g1, g2
    )
    np.testing.assert_allclose(np.asarray(got), score.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_train_step_with_word_loss():
    from xmc_gan_tpu.train import create_train_state, make_train_step

    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "WORD": True,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0, "WORD": 0.5},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # the region head exists only when WORD is on
    assert "region_proj" in state.d_params
    rng = np.random.RandomState(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(8, 48), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(8, 8, 48), jnp.float32),
        "mask": jnp.asarray(rng.rand(8, 8) > 0.7),
    }
    step = jax.jit(make_train_step(cfg))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "ds_word" in metrics and "gs_word" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["ds_word"]) > 0 and float(metrics["gs_word"]) > 0


def test_word_scores_bf16_compute_close_to_f32():
    """compute_dtype=bf16 runs the pairwise einsums at the MXU bf16 rate with
    f32 accumulation; scores must stay close to the f32 path (inputs are
    l2-normalized, so bf16 operand rounding is benign)."""
    rng = np.random.RandomState(11)
    B, R, T, D = 6, 12, 17, 24
    regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    words = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, T) > 0.6)

    f32 = losses.word_region_scores(regions, words, mask)
    bf16 = losses.word_region_scores(
        regions, words, mask, compute_dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=2e-2)

    # and through the loss + blocking path
    labels = jnp.eye(B)
    a = losses.word_loss(regions, words, mask, labels, False, 0.5,
                         compute_dtype=jnp.bfloat16, block_elems=2 * T * R)
    b = losses.word_loss(regions, words, mask, labels, False, 0.5)
    np.testing.assert_allclose(float(a), float(b), atol=5e-2)


def test_word_loss_with_concept_netd_raises_clearly():
    from xmc_gan_tpu.train import make_train_step

    cfg = cfg_from_dict({
        "TRAIN": {"NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
                  "ENCODER_LOSS": {"WORD": True}},
        "GEN": {"ENCODER_NAME": "CONCEPT_OUT_DF_GEN"},
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
        "DISC": {"ENCODER_NAME": "CONCEPT_NETD", "SENT_MATCH": True,
                 "IMG_MATCH": False},
    })
    with pytest.raises(NotImplementedError, match="region head"):
        make_train_step(cfg)


def test_word_scores_backend_seam():
    """The explicit backend seam (ADVICE r2): Pallas only fires at blocking
    scale on TPU, and only when the per-device program is explicit — single
    device or inside the shard_map row-block body."""
    big = (64, 64, 200, 256)   # > WORD_LOSS_BLOCK_ELEMS pairs x T x R
    small = (8, 8, 8, 16)
    # On the CPU test backend, never Pallas
    assert losses.word_scores_backend(*big, losses.WORD_LOSS_BLOCK_ELEMS) == "xla"
    # Force the TPU branch to exercise the gating logic
    import unittest.mock as mock

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        with mock.patch.object(jax, "device_count", return_value=1):
            assert losses.word_scores_backend(
                *big, losses.WORD_LOSS_BLOCK_ELEMS) == "pallas"
            assert losses.word_scores_backend(
                *small, losses.WORD_LOSS_BLOCK_ELEMS) == "xla"  # not big
        with mock.patch.object(jax, "device_count", return_value=8):
            # multi-device GSPMD context: pallas would replicate — refuse
            assert losses.word_scores_backend(
                *big, losses.WORD_LOSS_BLOCK_ELEMS) == "xla"
            # ... unless inside the shard_map row-block formulation
            assert losses.word_scores_backend(
                *big, losses.WORD_LOSS_BLOCK_ELEMS, in_shard_map=True
            ) == "pallas"


def test_word_region_scores_rejects_unsupported_compute_dtype():
    rng = np.random.RandomState(0)
    regions = jnp.asarray(rng.randn(2, 4, 8), jnp.float32)
    words = jnp.asarray(rng.randn(2, 3, 8), jnp.float32)
    mask = jnp.zeros((2, 3), bool)
    with pytest.raises(ValueError, match="compute_dtype"):
        losses.word_region_scores(regions, words, mask, compute_dtype=jnp.float16)
    # direct kernel entrypoint rejects it too (not just the losses seam)
    from xmc_gan_tpu.ops.pallas.damsm_score import damsm_scores

    with pytest.raises(ValueError, match="compute_dtype"):
        damsm_scores(regions, words, mask, compute_dtype=jnp.float16)
