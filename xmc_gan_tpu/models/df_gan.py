"""DF-GAN backbone as Flax modules — the flagship model family.

TPU-first redesign of the reference's one-stage generator and projection
discriminator (``xmc_gan/model/df_gan.py``):

* **NetG** — ``Linear(noise -> 8*ngf*4*4)``, 5/6/7 text-conditional residual
  up-blocks, ``LeakyReLU -> Conv3x3 -> Tanh`` head (reference ``df_gan.py:64-103``).
* **GBlock** — residual block with four conditional affine modulations and a
  zero-initialized scalar gate, nearest 2x upsample (reference ``df_gan.py:179-224``).
* **Affine** — gamma/beta from two 2-layer MLPs on the sentence embedding
  (reference ``df_gan.py:227-263``); the two modulation+LeakyReLU pairs go
  through the fused epilogue seam in ``ops/fused.py``.
* **NetD / ResD / DGetLogits** — conv stem + stride-2 residual down-blocks with
  optional spectral norm; projection head tiling the sentence embedding over
  the 4x4 feature map (reference ``df_gan.py:106-176,266-294``).

Layout is NHWC (TPU native; the reference is NCHW).  The noise projection is
reshaped channel-major before the NHWC transpose so converted PyTorch weights
produce identical activations.

Note on the projection head's identity branch: the reference sets
``cond_dim = TEXT.EMBEDDING_DIM`` when no match/seperate projection applies
(``df_gan.py:152-154``), which crashes at runtime whenever
``EMBEDDING_DIM != NEF`` and ``SEPERATE`` is off (e.g. ``cfg/df_gan_sbert.yml``:
768-dim identity head fed a 256-dim projected sentence).  Here the identity
branch uses the dimension of the tensor actually supplied (``NEF`` unless
``SEPERATE``), which is byte-identical to the reference in every configuration
that the reference itself can run.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import Config
from xmc_gan_tpu.models.common import (
    affine_out_inits,
    disc_arch,
    gen_arch,
    inits,
    split_upsample_schedule,
)
from xmc_gan_tpu.ops.fused import double_modulate_lrelu
from xmc_gan_tpu.ops.modules import (
    SNConv,
    SNDense,
    avg_pool,
    leaky_relu,
    upsample_nearest_2x,
)

Array = jax.Array

AFFINE_HIDDEN = 256  # reference df_gan.py:233,239


class Affine(nn.Module):
    """Conditional affine parameters (reference ``affine``, ``df_gan.py:227-263``).

    Returns the (gamma, beta) pair; the caller fuses the modulation so that
    consecutive affines share one epilogue kernel.
    """

    num_features: int
    cond_dim: int
    he_init: bool

    @nn.compact
    def __call__(self, cond: Array) -> tuple[Array, Array]:
        k1, b1 = inits(self.he_init, self.cond_dim)
        gk, gb = affine_out_inits(self.he_init, gamma=True, fan_in=AFFINE_HIDDEN)
        bk, bb = affine_out_inits(self.he_init, gamma=False, fan_in=AFFINE_HIDDEN)
        h_g = SNDense(AFFINE_HIDDEN, kernel_init=k1, bias_init=b1, name="fc_gamma_1")(cond)
        gamma = SNDense(self.num_features, kernel_init=gk, bias_init=gb, name="fc_gamma_2")(
            nn.relu(h_g)
        )
        h_b = SNDense(AFFINE_HIDDEN, kernel_init=k1, bias_init=b1, name="fc_beta_1")(cond)
        beta = SNDense(self.num_features, kernel_init=bk, bias_init=bb, name="fc_beta_2")(
            nn.relu(h_b)
        )
        return gamma, beta


class GBlock(nn.Module):
    """Text-conditional residual up-block (reference ``G_Block``,
    ``df_gan.py:179-224``).

    ``pre_upsample`` is the TPU-first execution of the *previous* block's
    trailing nearest-2x upsample (reference ``df_gan.py:199-204`` applies it
    after the residual add): modulation+LeakyReLU commute exactly with nearest
    upsampling, so the two affines before ``c1`` run at 1/4 the elements, the
    upsample folds into ``c1`` as a stride-2 transposed conv (2.25x fewer
    FLOPs), and the shortcut's 1x1 conv also runs at the low resolution.  The
    parameter tree is unchanged.
    """

    in_dim: int
    out_dim: int
    cond_dim: int
    upsample: bool
    he_init: bool
    pre_upsample: bool = False

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        k3_in, b3_in = inits(self.he_init, self.in_dim * 9)
        k3_out, b3_out = inits(self.he_init, self.out_dim * 9)

        # residual: affine0 -> lrelu -> affine1 -> lrelu -> conv3x3
        #           affine2 -> lrelu -> affine3 -> lrelu -> conv3x3
        g0, be0 = Affine(self.in_dim, self.cond_dim, self.he_init, name="affine0")(cond)
        g1, be1 = Affine(self.in_dim, self.cond_dim, self.he_init, name="affine1")(cond)
        h = double_modulate_lrelu(x, g0, be0, g1, be1)
        h = SNConv(self.out_dim, 3, padding=1, pre_upsample=self.pre_upsample,
                   kernel_init=k3_in, bias_init=b3_in, name="c1")(h)

        g2, be2 = Affine(self.out_dim, self.cond_dim, self.he_init, name="affine2")(cond)
        g3, be3 = Affine(self.out_dim, self.cond_dim, self.he_init, name="affine3")(cond)
        h = double_modulate_lrelu(h, g2, be2, g3, be3)
        h = SNConv(self.out_dim, 3, padding=1, kernel_init=k3_out, bias_init=b3_out, name="c2")(h)

        gate = self.param("gamma", nn.initializers.zeros, (1,))
        if self.in_dim != self.out_dim:
            k1, b1 = inits(self.he_init, self.in_dim)
            sc = SNConv(self.out_dim, 1, kernel_init=k1, bias_init=b1, name="c_sc")(x)
        else:
            sc = x
        if self.pre_upsample:
            sc = upsample_nearest_2x(sc)
        out = sc + gate.astype(h.dtype) * h
        if self.upsample:
            out = upsample_nearest_2x(out)
        return out


class NetG(nn.Module):
    """DF-GAN generator (reference ``NetG``, ``df_gan.py:64-103``).

    ``fuse_upsample`` (default on) defers each block's trailing nearest-2x
    upsample into the next block, where it folds into the first conv — exact
    math, same parameter tree, measurably less HBM traffic and FLOPs.  The
    reference arch tables never upsample after the last block
    (``df_gan.py:9-34``), so every upsample is foldable.
    """

    cfg: Config
    dtype: jnp.dtype = jnp.float32
    fuse_upsample: bool = True

    @property
    def _arch(self) -> dict:
        return gen_arch(self.cfg.IMG.SIZE, self.cfg.TRAIN.NCH)

    def setup(self):
        cfg = self.cfg
        ngf = cfg.TRAIN.NCH
        he = cfg.TRAIN.HE_INIT
        arch = self._arch
        k, b = inits(he, cfg.TRAIN.NOISE_DIM)
        self.proj_noise = SNDense(8 * ngf * 16, kernel_init=k, bias_init=b)
        self.needs_sent_proj = cfg.TEXT.EMBEDDING_DIM != cfg.TRAIN.NEF
        if self.needs_sent_proj:
            kp, bp = inits(he, cfg.TEXT.EMBEDDING_DIM)
            self.proj_sent_dense = SNDense(cfg.TRAIN.NEF, kernel_init=kp, bias_init=bp)
        pre, post = split_upsample_schedule(arch["upsample"], self.fuse_upsample)
        self.upblocks = [
            GBlock(
                in_dim=arch["in_channels"][i],
                out_dim=arch["out_channels"][i],
                cond_dim=cfg.TRAIN.NEF,
                upsample=post[i],
                pre_upsample=pre[i],
                he_init=he,
                name=f"block{i}",
            )
            for i in range(arch["depth"])
        ]
        ko, bo = inits(he, arch["out_channels"][-1] * 9)
        self.conv_out = SNConv(3, 3, padding=1, kernel_init=ko, bias_init=bo)

    def project_sent(self, sent_embs: Array) -> Array:
        """The sentence projection also used to condition D
        (reference ``train_gan.py:191`` — D conditioned on G's projection)."""
        if self.needs_sent_proj:
            return self.proj_sent_dense(sent_embs)
        return sent_embs

    def __call__(
        self,
        noise: Array,
        sent_embs: Array,
        words_embs: Array | None = None,
        mask: Array | None = None,
    ) -> Array:
        ngf = self.cfg.TRAIN.NCH
        bs = noise.shape[0]
        out = self.proj_noise(noise.astype(self.dtype))
        # channel-major reshape, then NHWC — matches the reference's
        # view(B, 8*ngf, 4, 4) (df_gan.py:94) for weight-conversion parity.
        out = out.reshape(bs, 8 * ngf, 4, 4).transpose(0, 2, 3, 1)
        cond = self.project_sent(sent_embs.astype(self.dtype))
        for block in self.upblocks:
            out = block(out, cond)
        out = self.conv_out(leaky_relu(out))
        return jnp.tanh(out.astype(jnp.float32))


class ResD(nn.Module):
    """Residual down-block (reference ``resD``, ``df_gan.py:266-294``)."""

    in_dim: int
    out_dim: int
    downsample: bool
    spec_norm: bool
    he_init: bool
    # Run the shortcut's 1x1 conv *after* the 2x2 average pool instead of
    # before: 1x1 convs commute exactly with average pooling (both linear,
    # the bias is pool-invariant), so the conv touches 1/4 the elements.
    # Same parameters, same math — mirrors the G-side deferred-upsample fold.
    fuse_downsample: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k4, _ = inits(self.he_init, self.in_dim * 16)
        k3, _ = inits(self.he_init, self.out_dim * 9)
        h = SNConv(
            self.out_dim, 4, strides=2, padding=1, use_bias=False,
            spec_norm=self.spec_norm, kernel_init=k4, name="conv_r1",
        )(x)
        h = leaky_relu(h)
        h = SNConv(
            self.out_dim, 3, padding=1, use_bias=False,
            spec_norm=self.spec_norm, kernel_init=k3, name="conv_r2",
        )(h)
        h = leaky_relu(h)

        fold = self.downsample and self.fuse_downsample
        sc = avg_pool(x, 2) if fold else x
        if self.in_dim != self.out_dim:
            k1, b1 = inits(self.he_init, self.in_dim)
            sc = SNConv(
                self.out_dim, 1, spec_norm=self.spec_norm,
                kernel_init=k1, bias_init=b1, name="conv_s",
            )(sc)
        if self.downsample and not fold:
            sc = avg_pool(sc, 2)
        gate = self.param("gamma", nn.initializers.zeros, (1,))
        return sc + gate.astype(h.dtype) * h


class DGetLogits(nn.Module):
    """Projection head returning (match_logit, img_feat, sent_proj)
    (reference ``D_GET_LOGITS``, ``df_gan.py:134-176``)."""

    cfg: Config

    @nn.compact
    def __call__(self, x: Array, sent_embs: Array) -> tuple[Array, Array, Array]:
        cfg = self.cfg
        ndf = cfg.TRAIN.NCH
        nef = cfg.TRAIN.NEF
        text_dim = cfg.TEXT.EMBEDDING_DIM
        spec_norm = cfg.DISC.SPEC_NORM
        he = cfg.TRAIN.HE_INIT

        out = avg_pool(x, 4).reshape(x.shape[0], -1)  # [B, ndf*16]

        if cfg.DISC.IMG_MATCH:
            k, b = inits(he, ndf * 16)
            out = SNDense(nef, spec_norm=spec_norm, kernel_init=k, bias_init=b,
                          name="proj_match")(out)
            cond_dim = nef
        elif cfg.DISC.SENT_MATCH:
            k, b = inits(he, nef)
            sent_embs = SNDense(ndf * 16, spec_norm=spec_norm, kernel_init=k, bias_init=b,
                                name="proj_match")(sent_embs)
            cond_dim = ndf * 16
        elif cfg.DISC.SEPERATE and text_dim != nef:
            k, b = inits(he, text_dim)
            sent_embs = SNDense(nef, spec_norm=spec_norm, kernel_init=k, bias_init=b,
                                name="proj_match")(sent_embs)
            cond_dim = nef
        else:
            # identity; see module docstring for the reference's cond_dim bug
            cond_dim = text_dim if cfg.DISC.SEPERATE else nef

        c = jnp.broadcast_to(
            sent_embs[:, None, None, :], (x.shape[0], 4, 4, cond_dim)
        ).astype(x.dtype)
        h = jnp.concatenate([x, c], axis=-1)
        kj, _ = inits(he, (ndf * 16 + cond_dim) * 9)
        h = SNConv(ndf * 2, 3, padding=1, use_bias=False, spec_norm=spec_norm,
                   kernel_init=kj, name="joint_conv1")(h)
        h = leaky_relu(h)
        kj2, _ = inits(he, ndf * 2 * 16)
        match = SNConv(1, 4, use_bias=False, spec_norm=spec_norm,
                       kernel_init=kj2, name="joint_conv2")(h)
        return match.reshape(x.shape[0]), out, sent_embs


class NetD(nn.Module):
    """DF-GAN discriminator trunk (reference ``NetD``, ``df_gan.py:106-132``).

    ``__call__`` returns the 4x4 trunk features; ``logits`` applies the
    projection head (the reference exposes it as the ``COND_DNET`` attribute,
    called separately up to 4x per step — ``train_gan.py:194,203,208,260``).
    """

    cfg: Config
    dtype: jnp.dtype = jnp.float32
    fuse_downsample: bool = True  # shortcut 1x1-past-pool fold (see ResD)

    def setup(self):
        cfg = self.cfg
        ndf = cfg.TRAIN.NCH
        he = cfg.TRAIN.HE_INIT
        spec_norm = cfg.DISC.SPEC_NORM
        arch = disc_arch(cfg.IMG.SIZE, ndf)
        k, b = inits(he, 3 * 9)
        self.conv_img = SNConv(
            arch["out_channels"][0], 3, padding=1, spec_norm=spec_norm,
            kernel_init=k, bias_init=b,
        )
        self.downblocks = [
            ResD(
                in_dim=arch["in_channels"][i],
                out_dim=arch["out_channels"][i],
                downsample=arch["downsample"][i],
                spec_norm=spec_norm,
                he_init=he,
                fuse_downsample=self.fuse_downsample,
                name=f"block{i}",
            )
            for i in range(1, arch["depth"])
        ]
        self.cond_dnet = DGetLogits(cfg)
        # word-region loss head: 1x1 projection of the 16x16-resolution trunk
        # stage into the word-embedding space (no reference counterpart — the
        # reference's ENCODER_LOSS.WORD raises NotImplementedError,
        # train_gan.py:220-222; this powers losses.word_loss).
        self.uses_word_loss = cfg.TRAIN.ENCODER_LOSS.WORD
        # stage whose *output* sits at 16x16 -> R = 256 regions.  The arch
        # table's resolution entries are block *input* resolutions (verified
        # against the actual trunk: entry "16" is the block that maps
        # 32x32 -> 16x16), hence the +1.
        self._region_stage = arch["resolution"].index(16) + 1
        if self.uses_word_loss:
            kr, br = inits(he, arch["out_channels"][self._region_stage])
            self.region_proj = SNConv(
                cfg.TEXT.EMBEDDING_DIM, 1, spec_norm=spec_norm,
                kernel_init=kr, bias_init=br,
            )

    def __call__(self, x: Array) -> Array:
        out = self.conv_img(x.astype(self.dtype))
        for block in self.downblocks:
            out = block(out)
        return out

    def features_and_regions(self, x: Array) -> tuple[Array, Array]:
        """One trunk pass returning (4x4 features, [B, 256, text_dim] region
        projections from the 16x16 stage) for the word-region loss."""
        out = self.conv_img(x.astype(self.dtype))
        regions = out if self._region_stage == 0 else None
        for i, block in enumerate(self.downblocks):
            out = block(out)
            if i + 1 == self._region_stage:
                regions = out
        r = self.region_proj(regions)
        b, h, w, d = r.shape
        return out, r.reshape(b, h * w, d)

    def logits(self, features: Array, sent_embs: Array) -> tuple[Array, Array, Array]:
        return self.cond_dnet(features, sent_embs.astype(self.dtype))

    def d_all(self, x: Array, sent_embs: Array) -> tuple[Array, Array, Array]:
        """Trunk + projection head in one call — use as the ``method`` for
        ``init`` so the head's parameters are created."""
        if self.uses_word_loss:
            feats, _ = self.features_and_regions(x)
            return self.logits(feats, sent_embs)
        return self.logits(self(x), sent_embs)
