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
    "word_loss_from_scores",
    "word_region_scores",
    "word_scores_backend",
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
    if emb0.shape[-1] != emb1.shape[-1]:
        # Trace-time guard for direct callers (the train step additionally
        # validates the reference's config invariant up front — see
        # make_train_step's SENT_MATCH/IMG_MATCH check, which also covers the
        # dim-coincident case this shape guard cannot).  The reference crashes
        # on the same mismatch as a shape error in the matmul
        # (train_gan.py:90).
        raise ValueError(
            f"contrastive embeddings have mismatched feature dims "
            f"{emb0.shape[-1]} vs {emb1.shape[-1]}; with ENCODER_LOSS.SENT "
            f"set DISC.IMG_MATCH or DISC.SENT_MATCH so image and sentence "
            f"features share a projection space"
        )
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
    soft-label weight; if zero the weight adapts to ``1 / num_pos`` per *column*
    — the reference's ``global_weight * global_pos`` broadcasts the ``[bs]``
    reciprocal across rows, so ``labels[i, j] = 1 / num_pos[j]``
    (``train_gan.py:79-81``) — where ``num_pos = clamp(#positives, min=1) + 1``
    (quirk: a row with no positives still gets num_pos == 2).  Result is
    stop-gradiented.
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
            global_weight = (1.0 / num_pos.astype(jnp.float32))[None, :]
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


# Largest [B_img, C, T, R] similarity intermediate the word loss will
# materialize at once, in f32 elements (2**26 elems = 256 MB).  At the shipped
# LN-COCO config (B=256, T=200, R=256) the unblocked tensor is 3.3e9 elements
# (~13 GB) — far beyond a 16 GB chip — so caption blocks of ~5 stream through
# a scan instead.
WORD_LOSS_BLOCK_ELEMS = 2**26

# float32 dtypes the score backends agree on; anything else (e.g. float16)
# would be silently coerced to f32 by the Pallas backend while the XLA path
# honored it — fail loudly instead (ADVICE r2).
_WORD_COMPUTE_DTYPES = (None, jnp.float32, jnp.bfloat16)


def word_scores_backend(
    b: int,
    bc: int,
    t: int,
    r_regions: int,
    block_elems: int | None,
    in_shard_map: bool = False,
) -> str:
    """Explicit backend seam for ``word_region_scores``.

    The fused Pallas kernel wins exactly where blocking would kick in (it keeps
    each pair's intermediates in VMEM instead of streaming them via HBM), but a
    ``pallas_call`` is opaque to GSPMD: under a multi-device jit it would be
    replicated, running the full global pairwise computation on every chip.  So
    auto-selection picks Pallas only when the per-device program is explicit —
    single-device execution, or inside the ``shard_map`` row-block formulation
    (``parallel.collectives.make_sharded_word_scores``), where each device's
    kernel covers exactly its [B_local, B_global] block.
    """
    big = block_elems is not None and b * bc * t * r_regions > block_elems
    if not (big and jax.default_backend() == "tpu"):
        return "xla"
    if in_shard_map or jax.device_count() == 1:
        return "pallas"
    return "xla"


def word_region_scores(
    region_feats: Array,
    words_embs: Array,
    mask: Array,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    block_elems: int | None = WORD_LOSS_BLOCK_ELEMS,
    compute_dtype=None,
    backend: str | None = None,
    interpret: bool = False,
) -> Array:
    """Pairwise attentional word-region matching scores ``[B_img, B_cap]``.

    The AttnGAN/DAMSM matching score used by XMC-GAN's word loss: per
    (image i, caption j) pair, each word of caption j soft-attends over the
    regions of image i (temperature ``gamma1``); the per-word relevances
    (cosine between attention context and word) aggregate by log-sum-exp with
    ``gamma2``; padded words (``mask`` True) are excluded.

    Formulation note: this follows the DAMSM *paper* equations (7)-(10) —
    single gamma1-softmax over regions of the raw normalized similarities,
    and the 1/gamma2 power on the log-sum-exp.  The official AttnGAN code
    additionally pre-softmaxes the similarities over the word axis and drops
    the 1/gamma2; the reference repo implements neither (its WORD branch
    raises NotImplementedError, ``train_gan.py:220-222``), so the paper form
    is the spec here.  Cross-checked against an independent torch oracle in
    ``tests/test_word_loss.py``.

    Memory: the naive formulation materializes a ``[B, B, T, R]`` similarity
    tensor — 13 GB at the LN-COCO config — so when it would exceed
    ``block_elems`` f32 elements, captions stream through ``lax.scan`` in
    blocks with the block body rematerialized on the backward pass
    (``jax.checkpoint``): live memory is one block's intermediates regardless
    of B/T/R.  Small shapes keep the single fused einsum.  Numerics are
    identical (tested) — blocking only splits the caption axis, which no
    softmax crosses.

    ``region_feats``: [B, R, D]; ``words_embs``: [Bc, T, D]; ``mask``: [Bc, T].
    ``compute_dtype``: operand dtype for the three pairwise einsums (e.g.
    ``jnp.bfloat16`` to run them at the MXU's bf16 rate — accumulation stays
    float32, as do the normalize/softmax/log-sum-exp reductions).  None keeps
    full float32 operands.
    """
    if compute_dtype is not None:
        # canonicalize so equivalent spellings ("bfloat16", np.float32, ...)
        # pass; anything else would silently diverge between backends
        canon = jnp.dtype(compute_dtype)
        if canon not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)):
            raise ValueError(
                f"word_region_scores: compute_dtype must be one of "
                f"{_WORD_COMPUTE_DTYPES}, got {compute_dtype!r} (the Pallas "
                "backend only accelerates bf16 operands; other dtypes would "
                "silently diverge between backends)"
            )
        # hand downstream code the canonical scalar type so e.g. the Pallas
        # backend's `compute_dtype == jnp.bfloat16` check sees any spelling
        compute_dtype = (
            jnp.bfloat16 if canon == jnp.dtype(jnp.bfloat16) else jnp.float32
        )
    b, r_regions, d = region_feats.shape
    bc, t, _ = words_embs.shape
    if backend is None:
        backend = word_scores_backend(b, bc, t, r_regions, block_elems)
    if backend == "pallas":
        from xmc_gan_tpu.ops.pallas.damsm_score import damsm_scores

        return damsm_scores(
            region_feats, words_embs, mask, gamma1, gamma2,
            compute_dtype=compute_dtype, interpret=interpret,
        )

    r = l2_normalize(region_feats.astype(jnp.float32), axis=-1)  # [B, R, D]
    w = l2_normalize(words_embs.astype(jnp.float32), axis=-1)  # [Bc, T, D]
    cd = compute_dtype or jnp.float32

    def block(wb: Array, mb: Array) -> Array:
        # wb: [C, T, D] caption block; mb: [C, T] -> scores [B_img, C]
        rc = r.astype(cd)
        wc = wb.astype(cd)
        sim = jnp.einsum(  # word -> region similarity
            "ctd,ird->ictr", wc, rc, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(gamma1 * sim, axis=-1)
        ctx = jnp.einsum(  # region context per word
            "ictr,ird->ictd", attn.astype(cd), rc,
            preferred_element_type=jnp.float32,
        )
        ctx = l2_normalize(ctx, axis=-1)
        rel = jnp.einsum(  # cosine(context, word)
            "ictd,ctd->ict", ctx.astype(cd), wc,
            preferred_element_type=jnp.float32,
        )
        neg = jnp.asarray(-1e30, jnp.float32)
        rel = jnp.where(mb[None, :, :], neg, gamma2 * rel)
        return jax.nn.logsumexp(rel, axis=-1) / gamma2  # [B_img, C]

    if block_elems is None or b * bc * t * r_regions <= block_elems:
        return block(w, mask)

    c = max(1, min(bc, block_elems // (b * t * r_regions)))
    nb = -(-bc // c)
    pad = nb * c - bc
    wp = jnp.pad(w, ((0, pad), (0, 0), (0, 0)))
    mp = jnp.pad(mask, ((0, pad), (0, 0)), constant_values=True)
    blocks = jax.lax.map(
        jax.checkpoint(lambda args: block(*args)),
        (wp.reshape(nb, c, t, d), mp.reshape(nb, c, t)),
    )  # [nb, B_img, C]
    scores = jnp.moveaxis(blocks, 1, 0).reshape(b, nb * c)
    return scores[:, :bc]


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
    block_elems: int | None = WORD_LOSS_BLOCK_ELEMS,
    compute_dtype=None,
    backend: str | None = None,
    interpret: bool = False,
) -> Array:
    """Word-region attentional contrastive loss (XMC-GAN's third objective).

    The reference defines the ``ENCODER_LOSS.WORD`` flag but raises
    ``NotImplementedError`` (``train_gan.py:220-222,267``); this implements the
    north-star objective: the blockwise pairwise matching scores of
    ``word_region_scores`` (scaled by ``gamma3``) feed the same symmetric
    label-weighted InfoNCE as ``sent_loss``.  The temperatures come from
    ``cfg.TRAIN.SMOOTH.GAMMA1/2/3`` (AttnGAN COCO defaults).

    ``region_feats``: [B, R, D] spatial discriminator features;
    ``words_embs``: [B, T, D]; rows of the score matrix index images.
    """
    score = word_region_scores(
        region_feats, words_embs, mask, gamma1, gamma2, block_elems,
        compute_dtype, backend, interpret,
    )
    return word_loss_from_scores(score, labels, b_global, smooth_global, gamma3)


def word_loss_from_scores(
    scores: Array,
    labels: Array,
    b_global: bool,
    smooth_global: float,
    gamma3: float = 10.0,
) -> Array:
    """InfoNCE half of ``word_loss`` over precomputed matching scores.

    Split out so the distributed train step can produce ``scores`` through the
    ``shard_map`` row-block formulation (each chip computes its
    [B_local, B_global] block; see ``parallel.collectives``) and feed the same
    symmetric objective.
    """
    num_pos = contrastive_num_pos(labels, b_global, smooth_global)
    return _symmetric_info_nce(gamma3 * scores, labels, num_pos)


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
