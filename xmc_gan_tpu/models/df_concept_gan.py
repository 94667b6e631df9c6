"""Concept-DF GAN family: grouped concept-attention generator blocks.

TPU-first redesign of the reference's experimental "Concept GAN on a DF-GAN
skeleton" (``xmc_gan/model/df_concept_gan.py``):

* **InNetG / ICAttnGBlock / InConceptBlock** — DF skeleton whose residual
  branches split features into ``cardinality`` concept groups, pool each group
  with text-conditioned attention over the spatial map, reason over the 16
  concept states with a tanh-adjacency graph layer, and modulate the grouped
  features with per-group gamma/beta MLPs (reference ``:65-253``).
* **OutNetG / OCAGBlock / OutConceptBlock** — self-attention concept pooling
  plus a sentence-query attention over concept states (reference ``:328-531``).
* **NetD (ConceptNetD) / ConceptResD** — concept-attention discriminator.  The
  reference registers and selects this class (``train_gan.py:49``,
  ``cfg/concept_out_df_gan.yml``) but its ``__init__`` raises
  ``NotImplementedError`` (``df_concept_gan.py:587``); here it is implemented
  *working* from the dead code below the raise, so ``concept_out_df_gan.yml``
  actually runs.  Its projection head sizes the sentence projection from the
  tensor actually supplied (the reference's dead head would mis-size it).

Layout notes (all deliberate TPU redesigns, verified by parity of math):
grouped 1x1 convs on ``[B, C*d, 1, 1]`` become batched einsums over an explicit
group axis ``[B, C, d]`` (``ops/grouped.py``); grouped 3x3 convs use
``feature_group_count``; the spatial attention is one einsum chain per block.
The reference's ``ConceptReasoner`` hardcodes ``normalize = False``
(``df_concept_gan.py:308``) — reproduced.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import Config
from xmc_gan_tpu.models.common import (
    disc_arch,
    gen_arch,
    inits,
    split_upsample_schedule,
)
from xmc_gan_tpu.ops.fused import modulate_lrelu
from xmc_gan_tpu.ops.grouped import GroupedDense
from xmc_gan_tpu.ops.modules import (
    SNConv,
    SNDense,
    avg_pool,
    global_avg_pool,
    leaky_relu,
    upsample_nearest_2x,
)

Array = jax.Array

CARDINALITY = 16  # concept groups (reference df_concept_gan.py:110)
BOTTLENECK = 8  # per-group width p (reference :110)
STATE_DIM = 4  # concept state width p' (reference :118)


def _group(x: Array, groups: int) -> Array:
    """[B, H, W, C*d] -> [B, HW, C, d]"""
    b, h, w, cd = x.shape
    return x.reshape(b, h * w, groups, cd // groups)


class ConceptReasoner(nn.Module):
    """Graph reasoning over concept states (reference ``ConceptReasoner``,
    ``df_concept_gan.py:304-326``): tanh adjacency from a p'->C projection,
    one propagation step, ReLU.  ``normalize`` is hardcoded off in the
    reference — reproduced."""

    cardinality: int
    state_dim: int
    he_init: bool
    spec_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, C, p']
        k, _ = inits(self.he_init, self.state_dim)
        adj = SNDense(self.cardinality, use_bias=False, spec_norm=self.spec_norm,
                      kernel_init=k, name="proj_edge")(x)  # [B, C, C]
        adj = jnp.tanh(adj)
        out = x + jnp.einsum("bij,bjp->bip", adj, x)
        return nn.relu(out)


class ConceptSampler(nn.Module):
    """Self-attention concept pooling (reference ``ConceptSampler``,
    ``df_concept_gan.py:535-581``): global-average query per group, key over
    the map, scaled softmax over space, value projection of the attended
    group features."""

    cardinality: int
    state_dim: int
    normalize: bool
    he_init: bool
    spec_norm: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, H, W, C*p] -> [B, C, p']
        C, p_out = self.cardinality, self.state_dim
        xg = _group(x, C)  # [B, HW, C, p]
        p = xg.shape[-1]
        k, _ = inits(self.he_init, p)

        query = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                             kernel_init=k, name="query_gconv")(xg.mean(axis=1))  # [B,C,p']
        key = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                           kernel_init=k, name="key_gconv")(
            xg.reshape(-1, C, p)
        ).reshape(xg.shape[0], -1, C, p_out)  # [B, HW, C, p']
        if self.normalize:
            query = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn1")(
                query.reshape(query.shape[0], 1, 1, C * p_out)
            ).reshape(query.shape[0], C, p_out)
            key_flat = key.reshape(key.shape[0], key.shape[1], 1, C * p_out)
            key = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn2")(key_flat).reshape(key.shape)

        scale = 1.0 / jnp.sqrt(jnp.asarray(self.state_dim, jnp.float32))
        attn = jnp.einsum("bcq,bncq->bcn", query, key) * scale  # [B, C, HW]
        attn = jax.nn.softmax(attn, axis=-1)
        pooled = jnp.einsum("bcn,bncp->bcp", attn, xg)  # [B, C, p]
        out = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                           kernel_init=k, name="value_gconv")(pooled)
        return out


class CondConceptSampler(nn.Module):
    """Sentence-conditioned concept pooling (reference ``CondConceptSampler``,
    ``df_concept_gan.py:256-302``): query from the tiled sentence embedding,
    unscaled softmax over space (the reference omits the 1/sqrt(d) here)."""

    cardinality: int
    state_dim: int
    cond_dim: int
    normalize: bool
    he_init: bool
    spec_norm: bool = False

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array) -> Array:
        C, p_out = self.cardinality, self.state_dim
        xg = _group(x, C)  # [B, HW, C, p]
        b, hw, _, p = xg.shape
        kq, _ = inits(self.he_init, self.cond_dim)
        kk, _ = inits(self.he_init, p)

        sent_g = jnp.broadcast_to(sent_embs[:, None, :], (b, C, self.cond_dim))
        query = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                             kernel_init=kq, name="query_gconv")(sent_g)  # [B,C,p']
        key = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                           kernel_init=kk, name="key_gconv")(
            xg.reshape(-1, C, p)
        ).reshape(b, hw, C, p_out)
        if self.normalize:
            query = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn1")(
                query.reshape(b, 1, 1, C * p_out)
            ).reshape(b, C, p_out)
            key = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn2")(
                key.reshape(b, hw, 1, C * p_out)
            ).reshape(b, hw, C, p_out)

        attn = jnp.einsum("bcq,bncq->bcn", query, key)  # [B, C, HW] (no scaling)
        attn = jax.nn.softmax(attn, axis=-1)
        pooled = jnp.einsum("bcn,bncp->bcp", attn, xg)  # [B, C, p]
        out = GroupedDense(p_out, use_bias=False, spec_norm=self.spec_norm,
                           kernel_init=kk, name="value_gconv")(pooled)
        return out


class _GammaBetaMLP(nn.Module):
    """Per-group two-layer modulation MLP (reference grouped 1x1 conv pairs,
    ``df_concept_gan.py:178-200``): (cond_dim+p') -> 2*p' -> p per group."""

    cardinality: int
    state_dim: int
    out_per_group: int
    he_init: bool
    spec_norm: bool = False

    @nn.compact
    def __call__(self, cond: Array) -> Array:
        # cond: [B, C, cond_dim + p'] -> [B, C * out_per_group]
        k1, b1 = inits(self.he_init, cond.shape[-1])
        h = GroupedDense(2 * self.state_dim, spec_norm=self.spec_norm,
                         kernel_init=k1, bias_init=b1, name="g1")(cond)
        h = leaky_relu(h)
        k2, b2 = inits(self.he_init, 2 * self.state_dim)
        out = GroupedDense(self.out_per_group, spec_norm=self.spec_norm,
                           kernel_init=k2, bias_init=b2, name="g2")(h)
        return out.reshape(out.shape[0], -1)


class InConceptBlock(nn.Module):
    """Sentence-conditioned concept block (reference ``InConceptBlock``,
    ``df_concept_gan.py:159-253``).

    ``pre_upsample`` executes a deferred nearest-2x upsample of the input here
    instead of in the previous block: the 1x1 split conv and LeakyReLU commute
    exactly with nearest upsampling, so they run at 1/4 the elements and the
    upsample folds into the grouped 3x3 as a stride-2 transposed conv.
    """

    in_dim: int
    cond_dim: int
    normalize: bool
    he_init: bool
    cardinality: int = CARDINALITY
    bottleneck_width: int = BOTTLENECK
    state_dim: int = STATE_DIM
    pre_upsample: bool = False

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array) -> Array:
        C = self.cardinality
        gw = C * self.bottleneck_width
        b = x.shape[0]
        k1, _ = inits(self.he_init, self.in_dim)
        k3, _ = inits(self.he_init, self.bottleneck_width * 9)

        h = SNConv(gw, 1, use_bias=False, kernel_init=k1, name="split_conv")(x)
        h = leaky_relu(h)
        h = SNConv(gw, 3, padding=1, use_bias=False, feature_group_count=C,
                   pre_upsample=self.pre_upsample,
                   kernel_init=k3, name="trans_gconv")(h)
        if self.normalize:
            h = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn")(h)
        img_embs = leaky_relu(h)

        gc = jnp.broadcast_to(sent_embs[:, None, :], (b, C, self.cond_dim))

        for phase in (1, 2):
            ctx = CondConceptSampler(
                cardinality=C, state_dim=self.state_dim, cond_dim=self.cond_dim,
                normalize=self.normalize, he_init=self.he_init,
                name=f"concept_sampler{phase}",
            )(img_embs, sent_embs)
            ctx = ConceptReasoner(
                cardinality=C, state_dim=self.state_dim, he_init=self.he_init,
                name=f"concept_reasoner{phase}",
            )(ctx)
            cond = jnp.concatenate([gc, ctx], axis=-1)  # [B, C, cond+p']
            gamma = _GammaBetaMLP(C, self.state_dim, self.bottleneck_width,
                                  self.he_init, name=f"gamma{phase}_gconv")(cond)
            beta = _GammaBetaMLP(C, self.state_dim, self.bottleneck_width,
                                 self.he_init, name=f"beta{phase}_gconv")(cond)
            img_embs = modulate_lrelu(img_embs, gamma, beta)
        return img_embs


class OutConceptBlock(nn.Module):
    """Self-attention concept block with sentence-query context selection
    (reference ``OutConceptBlock``, ``df_concept_gan.py:421-531``).

    ``pre_upsample`` — see :class:`InConceptBlock`.
    """

    in_dim: int
    cond_dim: int
    normalize: bool
    he_init: bool
    cardinality: int = CARDINALITY
    bottleneck_width: int = BOTTLENECK
    state_dim: int = STATE_DIM
    pre_upsample: bool = False

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array) -> Array:
        C = self.cardinality
        gw = C * self.bottleneck_width
        b = x.shape[0]
        k1, _ = inits(self.he_init, self.in_dim)
        k3, _ = inits(self.he_init, self.bottleneck_width * 9)
        ks, _ = inits(self.he_init, self.cond_dim)

        h = SNConv(gw, 1, use_bias=False, kernel_init=k1, name="split_conv")(x)
        h = leaky_relu(h)
        h = SNConv(gw, 3, padding=1, use_bias=False, feature_group_count=C,
                   pre_upsample=self.pre_upsample,
                   kernel_init=k3, name="trans_gconv")(h)
        if self.normalize:
            h = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn")(h)
        img_embs = leaky_relu(h)

        gc = jnp.broadcast_to(sent_embs[:, None, :], (b, C, self.cond_dim))

        for phase in (1, 2):
            state = ConceptSampler(
                cardinality=C, state_dim=self.state_dim, normalize=self.normalize,
                he_init=self.he_init, name=f"concept_sampler{phase}",
            )(img_embs)
            state = ConceptReasoner(
                cardinality=C, state_dim=self.state_dim, he_init=self.he_init,
                name=f"concept_reasoner{phase}",
            )(state)  # [B, C, p']
            s = SNDense(self.state_dim, use_bias=False, kernel_init=ks,
                        name=f"sent_linear{phase}")(sent_embs)  # [B, p']
            # sentence-query attention over concepts (reference
            # get_context_embs, df_concept_gan.py:471-478)
            sim = jnp.einsum("bq,bcq->bc", s, state)  # [B, C]
            attn = jax.nn.softmax(sim, axis=-1)
            ctx = state * attn[:, :, None]  # [B, C, p']

            cond = jnp.concatenate([gc, ctx], axis=-1)
            gamma = _GammaBetaMLP(C, self.state_dim, self.bottleneck_width,
                                  self.he_init, name=f"gamma{phase}_gconv")(cond)
            beta = _GammaBetaMLP(C, self.state_dim, self.bottleneck_width,
                                 self.he_init, name=f"beta{phase}_gconv")(cond)
            img_embs = modulate_lrelu(img_embs, gamma, beta)
        return img_embs


class _ConceptGBlock(nn.Module):
    """Residual up-block wrapping two concept blocks (reference
    ``ICAttnG_Block`` ``df_concept_gan.py:108-156`` / ``OCAG_Block``
    ``:369-418``; the two differ only in inner block type and the 3x3-vs-1x1
    output convs)."""

    in_dim: int
    out_dim: int
    cond_dim: int
    upsample: bool
    normalize: bool
    he_init: bool
    inner: str  # "in" | "out"
    pre_upsample: bool = False

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array) -> Array:
        gw = CARDINALITY * BOTTLENECK
        block_cls = InConceptBlock if self.inner == "in" else OutConceptBlock
        conv_k = 3 if self.inner == "in" else 1  # reference :125-126 vs :387-388
        pad = 1 if conv_k == 3 else 0
        kk, bb = inits(self.he_init, BOTTLENECK * conv_k * conv_k * CARDINALITY)

        h = block_cls(in_dim=self.in_dim, cond_dim=self.cond_dim,
                      normalize=self.normalize, he_init=self.he_init,
                      pre_upsample=self.pre_upsample,
                      name="concept1")(x, sent_embs)
        h = SNConv(self.out_dim, conv_k, padding=pad, kernel_init=kk, bias_init=bb,
                   name="conv_out1")(h)
        h = leaky_relu(h)
        h = block_cls(in_dim=self.out_dim, cond_dim=self.cond_dim,
                      normalize=self.normalize, he_init=self.he_init,
                      name="concept2")(h, sent_embs)
        h = SNConv(self.out_dim, conv_k, padding=pad, kernel_init=kk, bias_init=bb,
                   name="conv_out2")(h)

        gate = self.param("gamma", nn.initializers.zeros, (1,))
        if self.in_dim != self.out_dim:
            k1, b1 = inits(self.he_init, self.in_dim)
            sc = SNConv(self.out_dim, 1, kernel_init=k1, bias_init=b1, name="c_sc")(x)
        else:
            sc = x
        if self.pre_upsample:
            sc = upsample_nearest_2x(sc)
        out = gate.astype(h.dtype) * h + sc
        if self.upsample:
            out = upsample_nearest_2x(out)
        return out


class _ConceptNetG(nn.Module):
    """Shared generator skeleton (reference ``InNetG`` ``:65-105`` /
    ``OutNetG`` ``:328-367`` — identical apart from the block type)."""

    cfg: Config
    inner: str = "in"
    dtype: jnp.dtype = jnp.float32
    fuse_upsample: bool = True

    def setup(self):
        cfg = self.cfg
        ngf = cfg.TRAIN.NCH
        he = cfg.TRAIN.HE_INIT
        arch = gen_arch(cfg.IMG.SIZE, ngf)
        k, b = inits(he, cfg.TRAIN.NOISE_DIM)
        self.proj_noise = SNDense(8 * ngf * 16, kernel_init=k, bias_init=b)
        self.needs_sent_proj = cfg.TEXT.EMBEDDING_DIM != cfg.TRAIN.NEF
        if self.needs_sent_proj:
            kp, bp = inits(he, cfg.TEXT.EMBEDDING_DIM)
            self.proj_sent_dense = SNDense(cfg.TRAIN.NEF, kernel_init=kp, bias_init=bp)
        # deferred-upsample fold: each trailing upsample moves into the next
        # block's concept stage, folding into the grouped 3x3
        pre, post = split_upsample_schedule(arch["upsample"], self.fuse_upsample)
        self.upblocks = [
            _ConceptGBlock(
                in_dim=arch["in_channels"][i],
                out_dim=arch["out_channels"][i],
                cond_dim=cfg.TRAIN.NEF,
                upsample=post[i],
                pre_upsample=pre[i],
                normalize=cfg.GEN.NORMALIZE,
                he_init=he,
                inner=self.inner,
                name=f"block{i}",
            )
            for i in range(arch["depth"])
        ]
        ko, bo = inits(he, arch["out_channels"][-1] * 9)
        self.conv_out = SNConv(3, 3, padding=1, kernel_init=ko, bias_init=bo)

    def project_sent(self, sent_embs: Array) -> Array:
        if self.needs_sent_proj:
            return self.proj_sent_dense(sent_embs)
        return sent_embs

    def __call__(self, noise, sent_embs, words_embs=None, mask=None):
        ngf = self.cfg.TRAIN.NCH
        bs = noise.shape[0]
        cond = self.project_sent(sent_embs.astype(self.dtype))
        out = self.proj_noise(noise.astype(self.dtype))
        out = out.reshape(bs, 8 * ngf, 4, 4).transpose(0, 2, 3, 1)
        for block in self.upblocks:
            out = block(out, cond)
        out = self.conv_out(leaky_relu(out))
        return jnp.tanh(out.astype(jnp.float32))


class InNetG(_ConceptNetG):
    inner: str = "in"


class OutNetG(_ConceptNetG):
    inner: str = "out"


class ConceptResD(nn.Module):
    """Concept-attention residual down-block (reference ``ConceptResD``,
    ``df_concept_gan.py:614-679``)."""

    in_dim: int
    out_dim: int
    downsample: bool
    normalize: bool
    spec_norm: bool
    he_init: bool
    cardinality: int = CARDINALITY
    bottleneck_width: int = BOTTLENECK
    state_dim: int = STATE_DIM
    fuse_downsample: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = self.cardinality
        gw = C * self.bottleneck_width
        k4, _ = inits(self.he_init, self.in_dim * 16)
        k3, _ = inits(self.he_init, self.bottleneck_width * 9)

        h = SNConv(gw, 4, strides=2, padding=1, use_bias=False, spec_norm=self.spec_norm,
                   kernel_init=k4, name="split_conv")(x)
        h = leaky_relu(h)
        h = SNConv(gw, 3, padding=1, use_bias=False, feature_group_count=C,
                   spec_norm=self.spec_norm, kernel_init=k3, name="trans_gconv")(h)
        if self.normalize:
            h = nn.GroupNorm(num_groups=C, epsilon=1e-5, name="gn")(h)
        img_embs = leaky_relu(h)

        ctx = ConceptSampler(cardinality=C, state_dim=self.state_dim,
                             normalize=self.normalize, he_init=self.he_init,
                             spec_norm=self.spec_norm, name="concept_sampler")(img_embs)
        ctx = ConceptReasoner(cardinality=C, state_dim=self.state_dim,
                              he_init=self.he_init, spec_norm=self.spec_norm,
                              name="concept_reasoner")(ctx)  # [B, C, p']

        # single-hidden-layer grouped modulation (reference :634-644)
        kg, bg = inits(self.he_init, self.state_dim)
        gamma_h = GroupedDense(self.state_dim, spec_norm=self.spec_norm,
                               kernel_init=kg, bias_init=bg, name="gamma_g1")(ctx)
        gamma = GroupedDense(self.bottleneck_width, spec_norm=self.spec_norm,
                             kernel_init=kg, bias_init=bg, name="gamma_g2")(
            leaky_relu(gamma_h)
        ).reshape(x.shape[0], -1)
        beta_h = GroupedDense(self.state_dim, spec_norm=self.spec_norm,
                              kernel_init=kg, bias_init=bg, name="beta_g1")(ctx)
        beta = GroupedDense(self.bottleneck_width, spec_norm=self.spec_norm,
                            kernel_init=kg, bias_init=bg, name="beta_g2")(
            leaky_relu(beta_h)
        ).reshape(x.shape[0], -1)
        out = modulate_lrelu(img_embs, gamma, beta)

        k1o, b1o = inits(self.he_init, gw)
        out = SNConv(self.out_dim, 1, spec_norm=self.spec_norm,
                     kernel_init=k1o, bias_init=b1o, name="conv_out")(out)

        # Shortcut fold: 1x1 conv commutes exactly with the average pool, so
        # pool first and run the conv at 1/4 the elements (see df_gan.ResD).
        fold = self.downsample and self.fuse_downsample
        sc = avg_pool(x, 2) if fold else x
        if self.in_dim != self.out_dim:
            k1, b1 = inits(self.he_init, self.in_dim)
            sc = SNConv(self.out_dim, 1, spec_norm=self.spec_norm,
                        kernel_init=k1, bias_init=b1, name="conv_s")(sc)
        if self.downsample and not fold:
            sc = avg_pool(sc, 2)
        gate = self.param("gamma", nn.initializers.zeros, (1,))
        return sc + gate.astype(out.dtype) * out


class ConceptDGetLogits(nn.Module):
    """Projection head of the concept discriminator (reference
    ``D_GET_LOGITS``, ``df_concept_gan.py:681-714``); sentence projection sized
    from the supplied tensor (see module docstring)."""

    cfg: Config

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array):
        cfg = self.cfg
        ndf = cfg.TRAIN.NCH
        nef = cfg.TRAIN.NEF
        spec_norm = cfg.DISC.SPEC_NORM
        he = cfg.TRAIN.HE_INIT
        in_dim = sent_embs.shape[-1]

        out = global_avg_pool(x)  # [B, ndf*16] (reference adaptive_avg_pool2d)

        if cfg.DISC.IMG_MATCH:
            # Framework extension: the reference's concept head has no
            # IMG_MATCH branch (``df_concept_gan.py:681-703`` — only
            # SENT_MATCH / project-sent-to-nef), so CONCEPT_NETD could only
            # ever condition through the weaker sentence-side projection.
            # Mirror DF_DISC's IMG_MATCH (``df_gan.py:134-176``): project the
            # pooled image features into the text space instead.  Measured
            # effect on toy conditioning: BASELINE.md "CONCEPT_NETD plateau".
            k, b = inits(he, ndf * 16)
            out = SNDense(nef, spec_norm=spec_norm, kernel_init=k,
                          bias_init=b, name="proj_match")(out)
            cond_dim = in_dim
        elif cfg.DISC.SENT_MATCH:
            k, b = inits(he, in_dim)
            sent_embs = SNDense(ndf * 16, spec_norm=spec_norm, kernel_init=k,
                                bias_init=b, name="proj_match")(sent_embs)
            cond_dim = ndf * 16
        elif in_dim != nef:
            k, b = inits(he, in_dim)
            sent_embs = SNDense(nef, spec_norm=spec_norm, kernel_init=k,
                                bias_init=b, name="proj_match")(sent_embs)
            cond_dim = nef
        else:
            cond_dim = nef

        c = jnp.broadcast_to(sent_embs[:, None, None, :], (x.shape[0], 4, 4, cond_dim))
        h = jnp.concatenate([x, c.astype(x.dtype)], axis=-1)
        kj, _ = inits(he, (ndf * 16 + cond_dim) * 9)
        h = SNConv(ndf * 2, 3, padding=1, use_bias=False, spec_norm=spec_norm,
                   kernel_init=kj, name="joint_conv1")(h)
        h = leaky_relu(h)
        kj2, _ = inits(he, ndf * 2 * 16)
        match = SNConv(1, 4, use_bias=False, spec_norm=spec_norm,
                       kernel_init=kj2, name="joint_conv2")(h)
        return match.reshape(x.shape[0]), out, sent_embs


class NetD(nn.Module):
    """Concept discriminator (reference ``NetD``, ``df_concept_gan.py:584-612``
    — registered as ``CONCEPT_NETD``; implemented working here, see module
    docstring)."""

    cfg: Config
    dtype: jnp.dtype = jnp.float32
    fuse_downsample: bool = True  # shortcut 1x1-past-pool fold (see df_gan.ResD)

    def setup(self):
        cfg = self.cfg
        ndf = cfg.TRAIN.NCH
        he = cfg.TRAIN.HE_INIT
        spec_norm = cfg.DISC.SPEC_NORM
        arch = disc_arch(cfg.IMG.SIZE, ndf)
        k, b = inits(he, 3 * 9)
        self.conv_img = SNConv(arch["out_channels"][0], 3, padding=1,
                               spec_norm=spec_norm, kernel_init=k, bias_init=b)
        self.downblocks = [
            ConceptResD(
                in_dim=arch["in_channels"][i],
                out_dim=arch["out_channels"][i],
                downsample=arch["downsample"][i],
                normalize=cfg.GEN.NORMALIZE,
                spec_norm=spec_norm,
                he_init=he,
                fuse_downsample=self.fuse_downsample,
                name=f"block{i}",
            )
            for i in range(1, arch["depth"])
        ]
        self.cond_dnet = ConceptDGetLogits(cfg)

    def __call__(self, x: Array) -> Array:
        out = self.conv_img(x.astype(self.dtype))
        for block in self.downblocks:
            out = block(out)
        return out

    def logits(self, features: Array, sent_embs: Array):
        return self.cond_dnet(features, sent_embs.astype(self.dtype))

    def d_all(self, x: Array, sent_embs: Array):
        return self.logits(self(x), sent_embs)
