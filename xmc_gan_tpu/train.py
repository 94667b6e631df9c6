"""The training step: the reference's whole hot loop as one jitted function.

One call to ``train_step`` reproduces everything between the data load and the
logging of reference ``train_gan.py:174-289``:

1. **D update** — hinge real/fake (+ mismatch on ``feats_real[:B-1]`` vs
   ``psent[1:]`` when ``RMIS_LOSS``) + weighted sentence-image InfoNCE on the
   real projection-head features, one Adam step (reference ``:188-229``).
2. **MAGP update** — gradient penalty evaluated at the *post-update* D
   parameters (the reference calls ``optimizerD.step()`` before building the
   MAGP graph, ``:229-252``), then a second Adam step on the same optimizer
   state.  ``psent`` is detached from G (``.data`` in the reference), so the
   penalty is a function of D parameters only.
3. **G update** — every ``N_CRITIC`` steps (counter semantics of ``:254-291``),
   non-saturating loss + sentence InfoNCE + real-fake image InfoNCE on
   4x4-pooled trunk features, against the *twice-updated* D (reference
   ``:256-289``).  Gradients flow into ``G.proj_sent`` through D's conditioning
   (the reference quirk of ``:191,260``).

TPU-first details: the fake image is generated once per step and reused
(stop-gradient in the D loss, recomputed under ``jax.grad`` in the G loss with
the same noise); the spectral-norm power iteration is refreshed once per step
directly from the kernels (no extra forward); everything is static-shaped and
branch-free except a single ``lax.cond`` for ``N_CRITIC > 1``.  Under a
``jax.sharding.Mesh`` with the batch sharded over the ``data`` axis, XLA turns
the global-batch contrastive matrices into ``all_gather`` over ICI and inserts
gradient ``psum``s — no hand-written collectives in the step.
"""

from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct

from xmc_gan_tpu import losses
from xmc_gan_tpu.config import Config
from xmc_gan_tpu.ops.images import to_unit_range
from xmc_gan_tpu.ops.modules import avg_pool
from xmc_gan_tpu.registry import get_discriminator, get_generator

Array = jax.Array
Params = Any


class TrainState(struct.PyTreeNode):
    """Full optimization state for the alternating GAN step."""

    step: Array
    g_params: Params
    d_params: Params
    d_spectral: Params  # power-iteration state; empty dict when SPEC_NORM off
    g_opt_state: optax.OptState
    d_opt_state: optax.OptState


def make_models(cfg: Config, dtype=jnp.float32):
    g_cls = get_generator(cfg.GEN.ENCODER_NAME or "DF_GEN")
    d_cls = get_discriminator(cfg.DISC.ENCODER_NAME or "DF_DISC")
    return g_cls(cfg, dtype=dtype), d_cls(cfg, dtype=dtype)


def make_optimizers(cfg: Config) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    """Adam pair matching reference ``train_gan.py:483-484`` (torch defaults:
    eps=1e-8, no weight decay)."""
    opt = cfg.TRAIN.OPT
    g_tx = optax.adam(opt.G_LR, b1=opt.G_BETA1, b2=opt.G_BETA2, eps=1e-8)
    d_tx = optax.adam(opt.D_LR, b1=opt.D_BETA1, b2=opt.D_BETA2, eps=1e-8)
    return g_tx, d_tx


def create_train_state(cfg: Config, rng: Array, dtype=jnp.float32) -> TrainState:
    """Build models and optimizers; init parameters (reference
    ``train_gan.py:470-484``)."""
    g_model, d_model = make_models(cfg, dtype)
    g_rng, d_rng = jax.random.split(rng)
    bs = 2  # init batch size is irrelevant to parameter shapes
    noise = jnp.zeros((bs, cfg.TRAIN.NOISE_DIM), jnp.float32)
    sent = jnp.zeros((bs, cfg.TEXT.EMBEDDING_DIM), jnp.float32)
    words = jnp.zeros((bs, cfg.TEXT.MAX_LENGTH, cfg.TEXT.EMBEDDING_DIM), jnp.float32)
    mask = jnp.zeros((bs, cfg.TEXT.MAX_LENGTH), bool)
    g_vars = g_model.init(g_rng, noise, sent, words, mask)
    img = jnp.zeros((bs, cfg.IMG.SIZE, cfg.IMG.SIZE, 3), jnp.float32)
    psent_dim = cfg.TEXT.EMBEDDING_DIM if cfg.DISC.SEPERATE else cfg.TRAIN.NEF
    d_vars = d_model.init(d_rng, img, jnp.zeros((bs, psent_dim), jnp.float32), method="d_all")
    g_params = g_vars["params"]
    d_params = d_vars["params"]
    d_spectral = d_vars.get("spectral", {})
    g_tx, d_tx = make_optimizers(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        d_spectral=d_spectral,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
    )


def matricize_spectral_kernel(kernel: Array, u_dim: int) -> Array:
    """Matricize a spectral-normalized kernel into the ``[u_dim, v_dim]``
    power-iteration operand.  GroupedDense kernels ``[groups, d_in, f]``
    (PyTorch grouped-conv layout; see ops/grouped.py) flatten as
    ``(groups*f, d_in)``; every other kernel as ``(out_features, -1)`` —
    torch ``spectral_norm``'s view.  Single source of truth shared with the
    sigma probe in ``benchmarks/toy_learn.py``: a drifted copy there would
    silently invalidate the refresh-cadence measurement."""
    if kernel.ndim == 3 and u_dim == kernel.shape[0] * kernel.shape[-1]:
        return kernel.transpose(1, 0, 2).reshape(kernel.shape[1], u_dim).T
    out_features = kernel.shape[-1]
    return jnp.moveaxis(kernel, -1, 0).reshape(out_features, -1)


def refresh_spectral(d_params: Params, d_spectral: Params, iters: int = 1) -> Params:
    """``iters`` power-iteration steps for every spectral-normalized kernel,
    computed directly from the parameters.  The reference refreshes inside
    each D forward — up to 5 per step (``train_gan.py:193,201,207,231-252,259``
    via torch ``spectral_norm``); the default here is one refresh per step,
    measured equivalent on the 2000-step toy-learning A/B (BASELINE.md
    'Spectral-norm refresh cadence', 2026-08-20): 5 iters halves the sigma
    tracking error (mean 0.8% vs 1.9% vs the exact top singular value) but
    every training metric is indistinguishable — identical 1.00/1.00
    held-out conditioning, D margin within 0.5%.  ``iters=5`` reproduces the
    reference count (``--spectral_iters 5``)."""

    def walk(spec_node: dict, param_node: dict) -> dict:
        if set(spec_node.keys()) >= {"u", "v"} and "kernel" in param_node:
            kernel = param_node["kernel"]
            u_dim = spec_node["u"].shape[0]
            w = matricize_spectral_kernel(kernel, u_dim).astype(jnp.float32)
            u, v = spec_node["u"], spec_node["v"]
            for _ in range(iters):
                v = w.T @ u
                v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
                u = w @ v
                u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
            return {**spec_node, "u": u, "v": v}
        return {
            k: walk(vv, param_node[k]) if isinstance(vv, dict) else vv
            for k, vv in spec_node.items()
        }

    if not d_spectral:
        return d_spectral
    spec = flax.core.unfreeze(d_spectral)
    params = flax.core.unfreeze(d_params)
    return walk(spec, params)


def make_train_step(
    cfg: Config,
    g_model=None,
    d_model=None,
    dtype=jnp.float32,
    mesh=None,
    word_block_elems: int | None = None,
    remat: bool = False,
    spectral_iters: int = 1,
) -> Callable[[TrainState, dict, Array], tuple[TrainState, dict]]:
    """Build the jitted-able train step for a given (static) config.

    ``mesh``: the ``jax.sharding.Mesh`` the step will be jitted over, if any.
    Everything in the step is GSPMD-partitionable from the global-batch
    formulation *except* the word-region matching scores (the Pallas kernel is
    opaque to the partitioner), so with a multi-device mesh those route through
    the explicit ``shard_map`` row-block formulation
    (``parallel.collectives.make_sharded_word_scores``): each chip computes its
    [B_local, B_global] block against the all-gathered global words.

    ``word_block_elems``: override for the word-loss streaming threshold
    (``losses.WORD_LOSS_BLOCK_ELEMS``); used by tests/dry runs to force the
    blocking/kernel path at reduced shapes.

    ``remat``: rematerialize the G and D forwards under ``jax.checkpoint`` —
    the backward passes recompute activations instead of keeping them live,
    trading ~1 extra forward's FLOPs for the activation footprint.  Off by
    default (the conv trunk is HBM-bandwidth-bound; remat is for fitting
    large-batch configs, e.g. the 256px NCH=96 paper config at 8 img/device —
    see benchmarks/tp_memory.py).

    ``spectral_iters``: power-iteration refreshes per step (see
    ``refresh_spectral``; 1 = this framework's default, 5 = the reference's
    per-forward count — A/B'd equivalent, BASELINE.md).
    """
    if g_model is None or d_model is None:
        g_model, d_model = make_models(cfg, dtype)
    g_tx, d_tx = make_optimizers(cfg)

    t = cfg.TRAIN
    el = t.ENCODER_LOSS
    if el.SENT and not (cfg.DISC.SENT_MATCH or cfg.DISC.IMG_MATCH):
        # Reference-parity config validation (`assert cfg.DISC.SENT_MATCH or
        # cfg.DISC.IMG_MATCH`, train_gan.py:217): without a shared projection
        # the sentence InfoNCE would compare unaligned feature spaces — and
        # when the trunk dim happens to equal NEF the shapes alone would not
        # catch it (cosine_scores' dim guard covers only the mismatch case).
        raise ValueError(
            "ENCODER_LOSS.SENT requires DISC.SENT_MATCH or DISC.IMG_MATCH "
            "(the reference asserts this, train_gan.py:217): the sentence "
            "contrastive loss needs image and sentence features projected "
            "into a shared space"
        )
    use_labels = el.SENT or el.WORD or el.DISC or el.VGG
    vgg_model = None
    if el.VGG:
        # The reference raises NotImplementedError here (train_gan.py:279-281,
        # dead `enc_loss += vgg_loss` with no weight); implemented like the
        # WORD loss: the image-image InfoNCE over frozen VGG-19 features
        # (models/vgg.py).  The step then takes a 4th argument with the
        # frozen VGG variables (never part of the train state).
        from xmc_gan_tpu.models.vgg import VGG19Features

        vgg_model = VGG19Features(dtype=dtype)
    if el.WORD and not hasattr(d_model, "features_and_regions"):
        raise NotImplementedError(
            f"ENCODER_LOSS.WORD needs a discriminator with a region head "
            f"(features_and_regions); {type(d_model).__name__} "
            f"({cfg.DISC.ENCODER_NAME}) has none — use DF_DISC for the "
            "word-region loss (cfg/ln_*.yml do)"
        )

    # bf16 training runs the word-loss pairwise einsums at the MXU bf16 rate
    # (f32 accumulation/reductions inside; see losses.word_region_scores)
    word_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else None

    word_scores_fn = None
    if el.WORD:
        block_elems = (
            losses.WORD_LOSS_BLOCK_ELEMS if word_block_elems is None
            else word_block_elems
        )
        if mesh is not None and mesh.size > 1:
            from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

            word_scores_fn = make_sharded_word_scores(
                mesh, t.SMOOTH.GAMMA1, t.SMOOTH.GAMMA2,
                block_elems=block_elems, compute_dtype=word_dtype,
            )
        else:
            def word_scores_fn(regions, words, mask):
                return losses.word_region_scores(
                    regions, words, mask, t.SMOOTH.GAMMA1, t.SMOOTH.GAMMA2,
                    block_elems=block_elems, compute_dtype=word_dtype,
                )

    def g_apply(g_params, noise, sent, words, mask):
        return g_model.apply({"params": g_params}, noise, sent, words, mask)

    def project_sent(g_params, sent):
        if cfg.DISC.SEPERATE:
            return sent
        return g_model.apply({"params": g_params}, sent, method="project_sent")

    def d_apply(d_params, d_spectral, x):
        variables = {"params": d_params}
        if d_spectral:
            variables["spectral"] = d_spectral
        return d_model.apply(variables, x)

    def d_apply_regions(d_params, d_spectral, x):
        variables = {"params": d_params}
        if d_spectral:
            variables["spectral"] = d_spectral
        return d_model.apply(variables, x, method="features_and_regions")

    def d_logits(d_params, d_spectral, feats, sent):
        variables = {"params": d_params}
        if d_spectral:
            variables["spectral"] = d_spectral
        return d_model.apply(variables, feats, sent, method="logits")

    if remat:
        # Whole-trunk rematerialization: only each apply's inputs/outputs stay
        # live across the backward (the dominant activation cost is the conv
        # trunks; the tiny logits head is not worth recomputing).
        g_apply = jax.checkpoint(g_apply)
        d_apply = jax.checkpoint(d_apply)
        d_apply_regions = jax.checkpoint(d_apply_regions)

    def train_step(state: TrainState, batch: dict, rng: Array,
                   vgg_variables=None):
        if el.VGG and vgg_variables is None:
            raise ValueError(
                "ENCODER_LOSS.VGG is on: pass the frozen VGG-19 variables as "
                "the step's 4th argument (models.vgg.VGG19Features.init or "
                "vgg19_params_from_torch)"
            )
        # loader ships uint8; normalize to [-1,1] on device (fused by XLA).
        # float inputs (tests, precomputed batches) pass through unchanged.
        imgs = to_unit_range(batch["imgs"], dtype)
        sent = batch["sent_embs"]
        words = batch.get("words_embs")
        mask = batch.get("mask")
        bs = imgs.shape[0]

        noise = jax.random.normal(rng, (bs, t.NOISE_DIM), jnp.float32)

        spectral = refresh_spectral(
            state.d_params, state.d_spectral, iters=spectral_iters
        )

        # D is conditioned on G's sentence projection, detached
        # (reference train_gan.py:188-191,194).
        psent = jax.lax.stop_gradient(project_sent(state.g_params, sent))

        labels = (
            losses.make_labels(sent, el.B_GLOBAL, t.SMOOTH.GLOBAL) if use_labels else None
        )

        # fake generated once, reused by D (stop-grad) and recomputed under
        # grad for G (reference generates once, train_gan.py:199).
        fake = jax.lax.stop_gradient(g_apply(state.g_params, noise, sent, words, mask))

        # ------------------------------------------------------- D update 1
        def d_loss_fn(d_params):
            if el.WORD:
                feats_real, regions_real = d_apply_regions(d_params, spectral, imgs)
            else:
                feats_real = d_apply(d_params, spectral, imgs)
            match_real, img_feat_real, sent_proj = d_logits(d_params, spectral, feats_real, psent)
            errD_real = losses.hinge_real(match_real)

            feats_fake = d_apply(d_params, spectral, fake)
            match_fake, _, _ = d_logits(d_params, spectral, feats_fake, psent)
            errD_fake = losses.hinge_fake(match_fake)
            mis_loss = errD_fake
            errD_mismatch = jnp.zeros((), jnp.float32)
            if t.RMIS_LOSS:
                match_mis, _, _ = d_logits(
                    d_params, spectral, feats_real[: bs - 1], psent[1:bs]
                )
                errD_mismatch = losses.hinge_fake(match_mis)
                mis_loss = mis_loss + errD_mismatch

            enc_loss = jnp.zeros((), jnp.float32)
            ds_loss = jnp.zeros((), jnp.float32)
            ds_word = jnp.zeros((), jnp.float32)
            if el.SENT:
                ds_loss = losses.sent_loss(
                    img_feat_real, sent_proj, labels, el.B_GLOBAL, t.SMOOTH.GLOBAL
                )
                enc_loss = enc_loss + t.SMOOTH.SENT * ds_loss
            if el.WORD:
                ds_word = losses.word_loss_from_scores(
                    word_scores_fn(regions_real, words, mask),
                    labels, el.B_GLOBAL, t.SMOOTH.GLOBAL, t.SMOOTH.GAMMA3,
                )
                enc_loss = enc_loss + t.SMOOTH.WORD * ds_word

            errD = errD_real + mis_loss * t.SMOOTH.MISMATCH + enc_loss
            aux = {
                "errD_real": errD_real,
                "errD_fake": errD_fake,
                "errD_mismatch": errD_mismatch,
                "ds_loss": ds_loss,
                "ds_word": ds_word,
            }
            return errD, aux

        (errD, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ------------------------------------------- D update 2: MAGP
        d_loss_gp = jnp.zeros((), jnp.float32)
        if t.MAGP:
            def gp_loss_fn(dp):
                def d_scalar(i, s):
                    feats = d_apply(dp, spectral, i)
                    match, _, _ = d_logits(dp, spectral, feats, s)
                    return match.astype(jnp.float32).sum()

                return losses.magp_penalty(d_scalar, imgs, psent)

            d_loss_gp, gp_grads = jax.value_and_grad(gp_loss_fn)(d_params)
            gp_updates, d_opt_state = d_tx.update(gp_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, gp_updates)

        # ------------------------------------------------------- G update
        def g_step(operand):
            g_params, g_opt_state = operand

            def g_loss_fn(gp):
                fake_g = g_apply(gp, noise, sent, words, mask)
                psent_g = project_sent(gp, sent)
                if el.WORD:
                    feats, regions_fake = d_apply_regions(d_params, spectral, fake_g)
                else:
                    feats = d_apply(d_params, spectral, fake_g)
                match, img_feat_fake, sent_proj = d_logits(d_params, spectral, feats, psent_g)
                errG_fake = losses.generator_loss(match)

                enc_loss = jnp.zeros((), jnp.float32)
                gs_loss = jnp.zeros((), jnp.float32)
                gs_word = jnp.zeros((), jnp.float32)
                disc_loss = jnp.zeros((), jnp.float32)
                if el.SENT:
                    gs_loss = losses.sent_loss(
                        img_feat_fake, sent_proj, labels, el.B_GLOBAL, t.SMOOTH.GLOBAL
                    )
                    enc_loss = enc_loss + t.SMOOTH.SENT * gs_loss
                if el.WORD:
                    gs_word = losses.word_loss_from_scores(
                        word_scores_fn(regions_fake, words, mask),
                        labels, el.B_GLOBAL, t.SMOOTH.GLOBAL, t.SMOOTH.GAMMA3,
                    )
                    enc_loss = enc_loss + t.SMOOTH.WORD * gs_word
                if el.DISC:
                    feats_real = jax.lax.stop_gradient(d_apply(d_params, spectral, imgs))
                    rf = avg_pool(feats_real, 4).reshape(bs, -1)
                    ff = avg_pool(feats, 4).reshape(bs, -1)
                    disc_loss = losses.img_loss(
                        rf, ff, labels, el.B_GLOBAL, t.SMOOTH.GLOBAL
                    )
                    enc_loss = enc_loss + t.SMOOTH.DISC * disc_loss
                vgg_loss = jnp.zeros((), jnp.float32)
                if el.VGG:
                    # image-image InfoNCE over frozen VGG-19 features; added
                    # unweighted, matching the reference's dead
                    # `enc_loss += vgg_loss` (train_gan.py:281)
                    vgg_real = jax.lax.stop_gradient(
                        vgg_model.apply(vgg_variables, imgs)
                    )
                    vgg_fake = vgg_model.apply(vgg_variables, fake_g)
                    vgg_loss = losses.img_loss(
                        vgg_real, vgg_fake, labels, el.B_GLOBAL, t.SMOOTH.GLOBAL
                    )
                    enc_loss = enc_loss + vgg_loss

                errG = errG_fake + enc_loss
                return errG, {"gs_loss": gs_loss, "gs_word": gs_word,
                              "disc_loss": disc_loss, "vgg_loss": vgg_loss}

            (errG, g_aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
            g_updates, g_opt_state = g_tx.update(g_grads, g_opt_state, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            return g_params, g_opt_state, errG, g_aux

        def g_skip(operand):
            g_params, g_opt_state = operand
            zero = jnp.zeros((), jnp.float32)
            return g_params, g_opt_state, zero, {
                "gs_loss": zero, "gs_word": zero, "disc_loss": zero,
                "vgg_loss": zero,
            }

        if t.N_CRITIC == 1:
            g_params, g_opt_state, errG, g_aux = g_step(
                (state.g_params, state.g_opt_state)
            )
            g_updated = jnp.ones((), bool)
        else:
            do_g = (state.step + 1) % t.N_CRITIC == 0
            g_params, g_opt_state, errG, g_aux = jax.lax.cond(
                do_g, g_step, g_skip, (state.g_params, state.g_opt_state)
            )
            g_updated = do_g

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            d_spectral=spectral,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
        )
        metrics = {
            "Loss_D": errD,
            "Loss_G": errG,
            "errD_real": d_aux["errD_real"],
            "errD_fake": d_aux["errD_fake"],
            "errD_mismatch": d_aux["errD_mismatch"],
            "ds_loss": d_aux["ds_loss"],
            "gs_loss": g_aux["gs_loss"],
            "disc_loss": g_aux["disc_loss"],
            # The FULL penalty added to the D loss, i.e. 2*mean(||grad||^6):
            # the reference's variable named d_loss_gp is the pre-factor
            # mean(||grad||^6) (train_gan.py:247-248) — it never logs either;
            # this scalar (an extra beyond the reference's logged set) keeps
            # the applied-penalty convention used throughout BASELINE.md.
            "d_loss_gp": d_loss_gp,
            "g_updated": g_updated,
        }
        if el.WORD:
            metrics["ds_word"] = d_aux["ds_word"]
            metrics["gs_word"] = g_aux["gs_word"]
        if el.VGG:
            metrics["vgg_loss"] = g_aux["vgg_loss"]
        return new_state, metrics

    return train_step


def jit_train_step(cfg: Config, dtype=jnp.float32, mesh=None, remat=False,
                   **jit_kwargs):
    """Jitted train step with donated state (double-buffer-free updates)."""
    step = make_train_step(cfg, dtype=dtype, mesh=mesh, remat=remat)
    return jax.jit(step, donate_argnums=(0,), **jit_kwargs)


def make_sample_fn(cfg: Config, g_model=None, dtype=jnp.float32):
    """Jitted sampling function (reference ``eval`` G forward,
    ``train_gan.py:361-365``)."""
    if g_model is None:
        g_model, _ = make_models(cfg, dtype)

    def sample(g_params, noise, sent, words=None, mask=None):
        return g_model.apply({"params": g_params}, noise, sent, words, mask)

    return jax.jit(sample)
