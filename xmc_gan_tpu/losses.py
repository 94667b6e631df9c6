"""Loss functions for XMC-GAN training, as pure JAX functions.

Reimplements (TPU-first, functionally) the loss suite of the reference trainer:

* soft pseudo-positive label matrix   — reference ``train_gan.py:72-83``
* cosine similarity scores            — reference ``train_gan.py:85-91``
* symmetric sentence-image InfoNCE    — reference ``train_gan.py:93-115``
* symmetric real-fake image InfoNCE   — reference ``train_gan.py:117-139``
* hinge D losses / non-saturating G   — reference ``train_gan.py:195,204,209,261``
* MAGP gradient penalty               — reference ``train_gan.py:231-252``
  (here as a function of a D-apply closure, using ``jax.grad`` on the scalar sum
  of D outputs w.r.t. *inputs*; the reference's two separate Adam steps are
  reproduced in ``train.py``)

All functions are written over the *global* batch.  Under ``jax.jit`` with a
``Mesh`` and batch arrays sharded over the ``data`` axis, XLA inserts the
``all_gather`` of contrastive negatives over ICI automatically, so the effective
negative pool is the global batch (the reference, being single-GPU, only ever saw
the local batch — ``train_gan.py:101,125``).  An explicit ``shard_map`` variant
with hand-placed collectives lives in ``parallel/collectives.py`` and is tested
for equivalence.

Numerics: log-softmax and the gradient-penalty norm are computed in float32 even
when activations are bf16 (hinge + ||grad||^6 overflow easily in bf16).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "l2_normalize",
    "cosine_scores",
    "make_labels",
    "contrastive_num_pos",
    "sent_loss",
    "img_loss",
    "word_loss",
    "hinge_real",
    "hinge_fake",
    "generator_loss",
    "magp_penalty",
]


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """Row-wise L2 normalization matching ``F.normalize(p=2)`` semantics
    (reference ``train_gan.py:88-89``): divide by max(norm, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cosine_scores(emb0: Array, emb1: Array) -> Array:
    """Cosine-similarity matrix between two sets of embeddings.

    Matches reference ``cosine_scores`` (``train_gan.py:85-91``):
    ``emb0 [B, D] x emb1 [B, D] -> [B, B]``.  Computed in float32 so the
    similarity matrix (and its log-softmax) stays stable under bf16 activations.
    """
    emb0 = l2_normalize(emb0.astype(jnp.float32), axis=1)
    emb1 = l2_normalize(emb1.astype(jnp.float32), axis=1)
    return jnp.dot(emb0, emb1.T, preferred_element_type=jnp.float32)


def make_labels(
    sent_embs: Array,
    b_global: bool,
    smooth_global: float,
    p: float = 0.6,
) -> Array:
    """Soft pseudo-positive label matrix (reference ``make_labels``,
    ``train_gan.py:72-83``).

    Identity labels, optionally augmented with off-diagonal soft positives for
    caption pairs whose sentence-embedding cosine similarity exceeds ``p``.
    ``smooth_global`` is ``cfg.TRAIN.SMOOTH.GLOBAL``: if nonzero it is the fixed
    soft-label weight; if zero the weight adapts to ``1 / num_pos`` per row,
    where ``num_pos = clamp(#positives, min=1) + 1`` (reference quirk: a row
    with no positives still gets num_pos == 2).  Result is stop-gradiented.
    """
    batch_size = sent_embs.shape[0]
    labels = jnp.eye(batch_size, dtype=jnp.float32)
    if b_global:
        sim_mat = cosine_scores(sent_embs, sent_embs)
        diag = jnp.eye(batch_size, dtype=bool)
        sim_mat = jnp.where(diag, 3.0, sim_mat)  # fill_diagonal_(3)
        global_pos = (sim_mat > p) & (sim_mat < 3.0)
        num_pos = jnp.clip(global_pos.sum(axis=1), min=1) + 1
        if smooth_global != 0.0:
            global_weight = jnp.asarray(smooth_global, jnp.float32)
        else:
            global_weight = (1.0 / num_pos.astype(jnp.float32))[:, None]
        labels = jnp.clip(labels + global_weight * global_pos.astype(jnp.float32), max=1.0)
    return jax.lax.stop_gradient(labels)


def contrastive_num_pos(labels: Array, b_global: bool, smooth_global: float) -> Array:
    """Per-row positive count used as the InfoNCE normalizer
    (reference ``sent_loss``/``img_loss`` head, ``train_gan.py:94-99,118-123``)."""
    if not b_global:
        return jnp.asarray(1.0, jnp.float32)
    if smooth_global == 0.0:
        return jnp.asarray(2.0, jnp.float32)
    return (labels > 0).sum(axis=1).astype(jnp.float32)


def _symmetric_info_nce(scores: Array, labels: Array, num_pos: Array) -> Array:
    """Symmetric InfoNCE over both softmax axes of a similarity matrix.

    Shared body of reference ``sent_loss`` (``train_gan.py:101-115``) and
    ``img_loss`` (``train_gan.py:125-139``): label-weighted negative
    log-softmax along each axis, per-row/column normalized by ``num_pos``,
    then averaged.
    """
    s0 = jax.nn.log_softmax(scores, axis=0) * labels
    s0 = -(s0.sum(axis=0)) / num_pos
    s1 = jax.nn.log_softmax(scores, axis=1) * labels
    s1 = -(s1.sum(axis=1)) / num_pos
    return s0.mean() + s1.mean()


def sent_loss(
    img_feats: Array,
    txt_feats: Array,
    labels: Array,
    b_global: bool,
    smooth_global: float,
) -> Array:
    """Sentence-image contrastive loss (reference ``sent_loss``,
    ``train_gan.py:93-115``)."""
    num_pos = contrastive_num_pos(labels, b_global, smooth_global)
    scores = cosine_scores(img_feats, txt_feats)
    return _symmetric_info_nce(scores, labels, num_pos)


def img_loss(
    real_feats: Array,
    fake_feats: Array,
    labels: Array,
    b_global: bool,
    smooth_global: float,
) -> Array:
    """Real-fake image contrastive loss (reference ``img_loss``,
    ``train_gan.py:117-139``)."""
    num_pos = contrastive_num_pos(labels, b_global, smooth_global)
    scores = cosine_scores(real_feats, fake_feats)
    return _symmetric_info_nce(scores, labels, num_pos)


def word_loss(
    region_feats: Array,
    words_embs: Array,
    mask: Array,
    labels: Array,
    b_global: bool,
    smooth_global: float,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    gamma3: float = 10.0,
) -> Array:
    """Word-region attentional contrastive loss (XMC-GAN's third objective).

    The reference defines the ``ENCODER_LOSS.WORD`` flag but raises
    ``NotImplementedError`` (``train_gan.py:220-222,267``); this implements the
    north-star objective using the standard attentional matching score
    (AttnGAN/DAMSM, as used by XMC-GAN): per (image, caption) pair, each word
    soft-attends over image regions (temperature ``gamma1``), word relevances
    aggregate by log-sum-exp (``gamma2``), and the resulting [B, B] score
    matrix (scaled by ``gamma3``) feeds the same symmetric label-weighted
    InfoNCE as ``sent_loss``.  Padded words (``mask`` True) are excluded.

    ``region_feats``: [B, R, D] spatial discriminator features;
    ``words_embs``: [B, T, D]; rows of the score matrix index images.
    Everything is computed in float32 (one [B, B, T, R] einsum — negligible
    next to the conv stacks, and XLA turns the batch axes into one fused
    contraction on the MXU).
    """
    num_pos = contrastive_num_pos(labels, b_global, smooth_global)
    r = l2_normalize(region_feats.astype(jnp.float32), axis=-1)  # [B, R, D]
    w = l2_normalize(words_embs.astype(jnp.float32), axis=-1)  # [B, T, D]

    # word -> region attention per (image i, caption j) pair
    sim = jnp.einsum("jtd,ird->ijtr", w, r)  # [B_img, B_cap, T, R]
    attn = jax.nn.softmax(gamma1 * sim, axis=-1)
    ctx = jnp.einsum("ijtr,ird->ijtd", attn, r)  # region context per word
    ctx = l2_normalize(ctx, axis=-1)
    rel = jnp.einsum("ijtd,jtd->ijt", ctx, w)  # cosine(context, word)

    # masked log-sum-exp over real words: R(Q,D) = logsumexp(gamma2*rel)/gamma2
    neg = jnp.asarray(-1e30, jnp.float32)
    rel = jnp.where(mask[None, :, :], neg, gamma2 * rel)
    score = jax.nn.logsumexp(rel, axis=-1) / gamma2  # [B_img, B_cap]
    return _symmetric_info_nce(gamma3 * score, labels, num_pos)


def hinge_real(logits: Array) -> Array:
    """D hinge loss on real/matching pairs: ``mean(relu(1 - out))``
    (reference ``train_gan.py:195``)."""
    return jax.nn.relu(1.0 - logits.astype(jnp.float32)).mean()


def hinge_fake(logits: Array) -> Array:
    """D hinge loss on fake or mismatched pairs: ``mean(relu(1 + out))``
    (reference ``train_gan.py:204,209``)."""
    return jax.nn.relu(1.0 + logits.astype(jnp.float32)).mean()


def generator_loss(logits: Array) -> Array:
    """Non-saturating G adversarial loss: ``-mean(out)``
    (reference ``train_gan.py:261``)."""
    return -logits.astype(jnp.float32).mean()


def magp_penalty(
    d_scalar_fn: Callable[[Array, Array], Array],
    imgs: Array,
    sent_embs: Array,
) -> Array:
    """Matching-Aware Gradient Penalty (reference ``train_gan.py:231-252``).

    ``d_scalar_fn(imgs, sent)`` must return the *sum* of D match logits over the
    batch (equivalent to the reference's ``grad_outputs=ones``).  The penalty is
    ``2 * mean(||∇_{img,sent} D||_2^6)`` with the per-example gradient taken
    jointly over the image pixels and the sentence embedding.  Inputs are
    treated as leaves (the reference re-wraps ``.data`` tensors, detaching them
    from G), and the norm is accumulated in float32.
    """
    imgs = jax.lax.stop_gradient(imgs)
    sent_embs = jax.lax.stop_gradient(sent_embs)
    grad_img, grad_sent = jax.grad(d_scalar_fn, argnums=(0, 1))(imgs, sent_embs)
    bs = imgs.shape[0]
    g0 = grad_img.astype(jnp.float32).reshape(bs, -1)
    g1 = grad_sent.astype(jnp.float32).reshape(bs, -1)
    sq = jnp.sum(jnp.square(g0), axis=1) + jnp.sum(jnp.square(g1), axis=1)
    grad_l2 = jnp.sqrt(sq)
    return 2.0 * jnp.mean(grad_l2**6)
