"""Word-attention concept GAN generators (``CONCEPT_INATTN_GEN`` /
``CONCEPT_OUTATTN_GEN``).

TPU rebuild of the reference ``xmc_gan/model/concept_gan.py`` — the only place
the repo concretely implements **word-region cross-attention** (image queries
attending over word embeddings with padding masked to -inf), which the
XMC-GAN word-region contrastive objective needs (SURVEY.md §2 row 10).  The
reference file is dead code (its registry import is commented out,
``train_gan.py:31``) and contains outright bugs; this rebuild is *working*:

* ``InConceptBlock.forward`` reads ``self.upsample`` that its ``__init__``
  never sets (reference ``concept_gan.py:169-239`` would raise
  ``AttributeError``) — here the flag is threaded explicitly.
* ``OutConceptBlock``'s second phase feeds ``concept_reasoner2`` with the
  *first* phase's context and discards ``concept_sampler2``'s output
  (reference ``:435-437``) — here the sampler2 -> reasoner2 chain is wired as
  evidently intended.
* ``OutConceptBlock.get_context_embs`` normalizes the state tensor along the
  concept axis despite documenting cosine similarity over the state axis
  (reference ``:448-451``: ``normalize(dim=1)`` on ``[B, C, p']``) — here both
  operands normalize along the contracted ``p'`` axis (true cosine).

TPU-first choices: words are ``[B, T, D]``; grouped 1x1 convs are batched
einsums (``ops/grouped.GroupedDense``); the masked word attention is one
einsum + softmax chain (XLA-fused — its grouped state_dim=4 geometry pads
32x on the MXU lane axis, so the ``ops/pallas/cross_attention`` experiment
does not apply here; see that module's docstring);
``ResBlockUp``'s BatchNorm is a *pure* batch-stat normalization (no running
averages — under the jitted global-batch step the statistics are global-batch
statistics automatically; matches ``track_running_stats=False`` semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import Config
from xmc_gan_tpu.models.common import concept_gen_arch, inits
from xmc_gan_tpu.models.df_concept_gan import (
    BOTTLENECK,
    CARDINALITY,
    STATE_DIM,
    ConceptReasoner,
    ConceptSampler,
    _group,
)
from xmc_gan_tpu.ops.grouped import GroupedDense
from xmc_gan_tpu.ops.modules import SNConv, SNDense, leaky_relu, upsample_nearest_2x

Array = jax.Array

__all__ = ["InNetG", "OutNetG", "WordCondConceptSampler"]


def _batch_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """Pure batch-stat BatchNorm2d (NHWC).  torch ``BatchNorm2d`` in train
    mode normalizes by current-batch statistics; the running-average side
    channel is deliberately dropped (see module docstring)."""
    mean = x.mean(axis=(0, 1, 2), keepdims=True)
    var = x.var(axis=(0, 1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


class ResBlockUp(nn.Module):
    """Plain conditional-BN residual up-block for the first two stages
    (reference ``ResBlockUp``, ``concept_gan.py:454-512``): gamma/beta from
    bias-free Linears on the global condition, BN -> modulate -> ReLU ->
    (up) -> conv3x3, twice; non-gated residual add."""

    in_dim: int
    out_dim: int
    cond_dim: int
    upsample: bool
    normalize: bool
    he_init: bool
    # Fold the pre-conv upsample into c1 as a stride-2 transposed conv and run
    # the shortcut's 1x1 at the low resolution (1x1 convs commute exactly with
    # nearest upsampling) — exact math, same parameters.
    fuse_upsample: bool = True

    @nn.compact
    def __call__(self, x: Array, global_cond: Array) -> Array:
        kc, _ = inits(self.he_init, self.cond_dim)

        def affine(h, features, idx):
            gamma = SNDense(features, use_bias=False, kernel_init=kc,
                            name=f"linear_gamma{idx}")(global_cond)
            beta = SNDense(features, use_bias=False, kernel_init=kc,
                           name=f"linear_beta{idx}")(global_cond)
            if self.normalize:
                scale = self.param(f"bn{idx}_scale", nn.initializers.ones, (features,))
                bias = self.param(f"bn{idx}_bias", nn.initializers.zeros, (features,))
                h = _batch_norm(h, scale, bias)
            return nn.relu(gamma[:, None, None, :] * h + beta[:, None, None, :])

        fold = self.upsample and self.fuse_upsample
        out = affine(x, self.in_dim, 1)
        if self.upsample and not fold:
            out = upsample_nearest_2x(out)
        k1, b1 = inits(self.he_init, self.in_dim * 9)
        out = SNConv(self.out_dim, 3, padding=1, pre_upsample=fold,
                     kernel_init=k1, bias_init=b1, name="c1")(out)
        out = affine(out, self.out_dim, 2)
        k2, b2 = inits(self.he_init, self.out_dim * 9)
        out = SNConv(self.out_dim, 3, padding=1, kernel_init=k2, bias_init=b2,
                     name="c2")(out)

        sc = x
        if self.upsample and not fold:
            sc = upsample_nearest_2x(sc)
        if self.in_dim != self.out_dim:
            ks, bs_ = inits(self.he_init, self.in_dim)
            sc = SNConv(self.out_dim, 1, kernel_init=ks, bias_init=bs_, name="c_sc")(sc)
        if fold:
            sc = upsample_nearest_2x(sc)
        return out + sc


class WordCondConceptSampler(nn.Module):
    """Masked word-region attention per concept group (reference
    ``CondConceptSampler``, ``concept_gan.py:516-580``).

    Image queries ``[B, HW, C, p']`` x word keys ``[B, T, C, p']`` (per-group
    word projections), cosine similarity over ``p'``, padding masked to -inf,
    softmax over words, context = attention-weighted *normalized keys*, mean
    over space -> ``[B, C, p']``.  This is the word-region attention pattern
    the XMC-GAN word loss reuses."""

    cardinality: int
    state_dim: int
    text_dim: int
    normalize: bool
    he_init: bool

    @nn.compact
    def __call__(self, x: Array, words_embs: Array, mask: Array) -> Array:
        # x: [B, H, W, C*p]; words_embs: [B, T, text_dim]; mask: [B, T] True=pad
        C, p_out = self.cardinality, self.state_dim
        xg = _group(x, C)  # [B, HW, C, p]
        b, hw, _, p = xg.shape
        T = words_embs.shape[1]
        kq, _ = inits(self.he_init, p)
        kk, _ = inits(self.he_init, self.text_dim)

        query = GroupedDense(p_out, use_bias=False, kernel_init=kq,
                             name="query_gconv")(
            xg.reshape(-1, C, p)
        ).reshape(b, hw, C, p_out)
        words_g = jnp.broadcast_to(
            words_embs[:, :, None, :], (b, T, C, self.text_dim)
        )
        key = GroupedDense(p_out, use_bias=False, kernel_init=kk,
                           name="key_gconv")(
            words_g.reshape(-1, C, self.text_dim)
        ).reshape(b, T, C, p_out)
        if self.normalize:
            query = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn1")(
                query.reshape(b, hw, 1, C * p_out)
            ).reshape(b, hw, C, p_out)
            key = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn2")(
                key.reshape(b, T, 1, C * p_out)
            ).reshape(b, T, C, p_out)

        # cosine similarity over p' (reference normalize(p=2, dim=2))
        qn = query / jnp.maximum(
            jnp.linalg.norm(query, axis=-1, keepdims=True), 1e-12
        )
        kn = key / jnp.maximum(jnp.linalg.norm(key, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bncq,btcq->bcnt", qn, kn)  # [B, C, HW, T]
        neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
        sim = jnp.where(mask[:, None, None, :], neg_inf, sim)
        attn = jax.nn.softmax(sim, axis=-1)
        # context from the *normalized* keys (reference :556-558), then
        # spatial mean
        ctx = jnp.einsum("bcnt,btcq->bcnq", attn, kn).mean(axis=2)  # [B, C, p']
        return ctx


class _WordGammaBeta(nn.Module):
    """Single grouped 1x1 modulation projection (reference ``gamma*_gconv``,
    ``concept_gan.py:189-192``): [C, gc_dim+p'] -> [C, p] per group."""

    out_per_group: int
    he_init: bool

    @nn.compact
    def __call__(self, cond: Array) -> Array:
        k, b = inits(self.he_init, cond.shape[-1])
        return GroupedDense(self.out_per_group, kernel_init=k, bias_init=b,
                            name="g")(cond)


class InConceptBlock(nn.Module):
    """Word-attention concept block, image-query variant (reference
    ``InConceptBlock``, ``concept_gan.py:169-239``; ``upsample`` threaded
    explicitly — the reference forgets to set it)."""

    in_dim: int
    gc_dim: int
    text_dim: int
    upsample: bool
    normalize: bool
    he_init: bool
    cardinality: int = CARDINALITY
    bottleneck_width: int = BOTTLENECK
    state_dim: int = STATE_DIM

    @nn.compact
    def __call__(self, x, global_cond, words_embs, mask):
        C = self.cardinality
        gw = C * self.bottleneck_width
        b = x.shape[0]
        k1, _ = inits(self.he_init, self.in_dim)
        k3, _ = inits(self.he_init, self.bottleneck_width * 9)

        h = SNConv(gw, 1, use_bias=False, kernel_init=k1, name="split_conv")(x)
        h = nn.relu(h)
        h = SNConv(gw, 3, padding=1, use_bias=False, feature_group_count=C,
                   kernel_init=k3, name="trans_gconv")(h)
        if self.normalize:
            h = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn")(h)
        out = nn.relu(h)

        gc = jnp.broadcast_to(global_cond[:, None, :], (b, C, self.gc_dim))

        for phase in (1, 2):
            ctx = WordCondConceptSampler(
                cardinality=C, state_dim=self.state_dim, text_dim=self.text_dim,
                normalize=self.normalize, he_init=self.he_init,
                name=f"concept_sampler{phase}",
            )(out, words_embs, mask)
            ctx = ConceptReasoner(
                cardinality=C, state_dim=self.state_dim, he_init=self.he_init,
                name=f"concept_reasoner{phase}",
            )(ctx)
            cond = jnp.concatenate([gc, ctx], axis=-1)  # [B, C, gc+p']
            gamma = _WordGammaBeta(self.bottleneck_width, self.he_init,
                                   name=f"gamma{phase}_gconv")(cond)
            beta = _WordGammaBeta(self.bottleneck_width, self.he_init,
                                  name=f"beta{phase}_gconv")(cond)
            gamma = gamma.reshape(b, 1, 1, gw)
            beta = beta.reshape(b, 1, 1, gw)
            out = nn.relu(gamma * out + beta)
            if phase == 1 and self.upsample:
                out = upsample_nearest_2x(out)
        return out


class OutConceptBlock(nn.Module):
    """Word-attention concept block, concept-state-query variant (reference
    ``OutConceptBlock``, ``concept_gan.py:346-449``; phase-2 sampler/reasoner
    wiring fixed, cosine axes fixed — see module docstring)."""

    in_dim: int
    gc_dim: int
    text_dim: int
    upsample: bool
    normalize: bool
    he_init: bool
    cardinality: int = CARDINALITY
    bottleneck_width: int = BOTTLENECK
    state_dim: int = STATE_DIM

    @nn.compact
    def __call__(self, x, global_cond, words_embs, mask):
        C = self.cardinality
        gw = C * self.bottleneck_width
        b = x.shape[0]
        k1, _ = inits(self.he_init, self.in_dim)
        k3, _ = inits(self.he_init, self.bottleneck_width * 9)
        kw, _ = inits(self.he_init, self.text_dim)

        h = SNConv(gw, 1, use_bias=False, kernel_init=k1, name="split_conv")(x)
        h = nn.relu(h)
        h = SNConv(gw, 3, padding=1, use_bias=False, feature_group_count=C,
                   kernel_init=k3, name="trans_gconv")(h)
        if self.normalize:
            h = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn")(h)
        out = nn.relu(h)

        gc = jnp.broadcast_to(global_cond[:, None, :], (b, C, self.gc_dim))

        for phase in (1, 2):
            state = ConceptSampler(
                cardinality=C, state_dim=self.state_dim, normalize=self.normalize,
                he_init=self.he_init, name=f"concept_sampler{phase}",
            )(out)
            state = ConceptReasoner(
                cardinality=C, state_dim=self.state_dim, he_init=self.he_init,
                name=f"concept_reasoner{phase}",
            )(state)  # [B, C, p']
            w = SNDense(self.state_dim, use_bias=False, kernel_init=kw,
                        name=f"word_conv{phase}")(words_embs)  # [B, T, p']
            # concept-state-query word attention (reference get_context_embs,
            # concept_gan.py:346-372): cosine over p', mask, softmax over T
            sn = state / jnp.maximum(
                jnp.linalg.norm(state, axis=-1, keepdims=True), 1e-12
            )
            wn = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
            sim = jnp.einsum("bcq,btq->bct", sn, wn)  # [B, C, T]
            sim = jnp.where(mask[:, None, :], jnp.asarray(-jnp.inf, sim.dtype), sim)
            attn = jax.nn.softmax(sim, axis=-1)
            ctx = jnp.einsum("bct,btq->bcq", attn, wn)  # [B, C, p']

            cond = jnp.concatenate([gc, ctx], axis=-1)
            gamma = _WordGammaBeta(self.bottleneck_width, self.he_init,
                                   name=f"gamma{phase}_gconv")(cond)
            beta = _WordGammaBeta(self.bottleneck_width, self.he_init,
                                  name=f"beta{phase}_gconv")(cond)
            out = nn.relu(gamma.reshape(b, 1, 1, gw) * out + beta.reshape(b, 1, 1, gw))
            if phase == 1 and self.upsample:
                out = upsample_nearest_2x(out)
        return out


class _AttnResBlockUp(nn.Module):
    """Residual wrapper around one word-attention concept block (reference
    ``ICAttnResBlockUp`` ``concept_gan.py:123-166`` / ``OCAttnResBlockUp``
    ``:300-343``): residual = concept -> 1x1 conv; shortcut = (up) + 1x1 when
    dims change; plain (non-gated) add."""

    in_dim: int
    out_dim: int
    gc_dim: int
    text_dim: int
    upsample: bool
    normalize: bool
    he_init: bool
    inner: str  # "in" | "out"

    @nn.compact
    def __call__(self, x, global_cond, words_embs, mask):
        block_cls = InConceptBlock if self.inner == "in" else OutConceptBlock
        h = block_cls(
            in_dim=self.in_dim, gc_dim=self.gc_dim, text_dim=self.text_dim,
            upsample=self.upsample, normalize=self.normalize, he_init=self.he_init,
            name="concept1",
        )(x, global_cond, words_embs, mask)
        gw = CARDINALITY * BOTTLENECK
        ko, bo = inits(self.he_init, gw)
        h = SNConv(self.out_dim, 1, kernel_init=ko, bias_init=bo, name="conv_out1")(h)

        sc = x
        if self.upsample:
            sc = upsample_nearest_2x(sc)
        if self.in_dim != self.out_dim:
            ks, bs_ = inits(self.he_init, self.in_dim)
            sc = SNConv(self.out_dim, 1, kernel_init=ks, bias_init=bs_, name="c_sc")(sc)
        return h + sc


class _AttnNetG(nn.Module):
    """Shared skeleton (reference ``InNetG`` ``concept_gan.py:67-121`` /
    ``OutNetG`` ``:244-298``): global cond = [noise; proj_sent], two plain
    ``ResBlockUp`` stages, then word-attention blocks, lrelu+conv3x3+tanh."""

    cfg: Config
    inner: str = "in"
    dtype: jnp.dtype = jnp.float32
    # ResBlockUp's in-block upsample fold (the attention blocks' mid-block
    # upsamples cross attention statistics and are never folded)
    fuse_upsample: bool = True

    def setup(self):
        cfg = self.cfg
        nef = cfg.TRAIN.NEF
        he = cfg.TRAIN.HE_INIT
        noise_dim = cfg.TRAIN.NOISE_DIM
        arch = concept_gen_arch(cfg.IMG.SIZE, cfg.TRAIN.NCH)
        self._arch = arch
        gc_dim = noise_dim + nef

        ks, bs_ = inits(he, cfg.TEXT.EMBEDDING_DIM)
        self.proj_sent_dense = SNDense(nef, kernel_init=ks, bias_init=bs_)
        kw, bw = inits(he, cfg.TEXT.EMBEDDING_DIM)
        self.proj_word = SNDense(nef, kernel_init=kw, bias_init=bw)
        kc, bc = inits(he, gc_dim)
        self.proj_cond = SNDense(arch["in_channels"][0] * 16, kernel_init=kc,
                                 bias_init=bc)

        blocks = []
        for i in range(arch["depth"]):
            if not arch["attention"][i]:
                blocks.append(ResBlockUp(
                    in_dim=arch["in_channels"][i], out_dim=arch["out_channels"][i],
                    cond_dim=gc_dim, upsample=arch["upsample"][i],
                    normalize=cfg.GEN.NORMALIZE, he_init=he,
                    fuse_upsample=self.fuse_upsample, name=f"block{i}",
                ))
            else:
                blocks.append(_AttnResBlockUp(
                    in_dim=arch["in_channels"][i], out_dim=arch["out_channels"][i],
                    gc_dim=gc_dim, text_dim=nef, upsample=arch["upsample"][i],
                    normalize=cfg.GEN.NORMALIZE, he_init=he, inner=self.inner,
                    name=f"block{i}",
                ))
        self.upblocks = blocks
        ko, bo = inits(he, arch["out_channels"][-1] * 9)
        self.conv_out = SNConv(3, 3, padding=1, kernel_init=ko, bias_init=bo)

    def project_sent(self, sent_embs: Array) -> Array:
        return self.proj_sent_dense(sent_embs)

    def __call__(self, noise, sent_embs, words_embs, mask):
        # noise [B, noise_dim]; sent [B, text_dim]; words [B, T, text_dim]
        bs = noise.shape[0]
        sent = self.project_sent(sent_embs.astype(self.dtype))
        words = self.proj_word(words_embs.astype(self.dtype))  # [B, T, nef]
        global_cond = jnp.concatenate([noise.astype(self.dtype), sent], axis=1)
        out = self.proj_cond(global_cond)
        out = out.reshape(bs, self._arch["in_channels"][0], 4, 4).transpose(0, 2, 3, 1)
        for i, block in enumerate(self.upblocks):
            if self._arch["attention"][i]:
                out = block(out, global_cond, words, mask)
            else:
                out = block(out, global_cond)
        out = self.conv_out(leaky_relu(out))
        return jnp.tanh(out.astype(jnp.float32))


class InNetG(_AttnNetG):
    inner: str = "in"


class OutNetG(_AttnNetG):
    inner: str = "out"
