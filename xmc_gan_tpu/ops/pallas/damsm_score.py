"""Fused Pallas kernel for the pairwise word-region (DAMSM) matching score.

The LN-scale word loss (``losses.word_region_scores``; spec at
``losses.py`` — DAMSM paper eqs. 7-10, reference anchor
``/root/reference/xmc_gan/model/concept_gan.py:516-580`` for the masked
attention pattern) computes, for every (image i, caption j) pair::

    sim  = w_j @ r_i^T                     # [T, R] word-region cosines
    a    = softmax_R(gamma1 * sim)
    c    = a @ r_i ; c_hat = c / ||c||     # per-word region context
    rel  = rowsum(c_hat * w_j)             # [T]
    out  = logsumexp_T(gamma2 * rel[valid]) / gamma2

The XLA streaming path materializes per-block [B, C, T, R] and [B, C, T, D]
tensors in HBM (with rematerialization on the backward) and is
bandwidth-bound — ~0.94 s/call at the LN-COCO shape.  This kernel computes
each (image, caption-block) pair entirely in VMEM: HBM traffic is just the
operands and the [B, Bc] score matrix, and the MXU runs the four
[T,D]x[D,R]-shaped dots back to back.

Three kernels: forward, backward-to-regions (accumulates over captions with
the grid's inner axis revisiting the per-image output block), and
backward-to-words (grid transposed so the per-caption output block is
resident while images stream).  ``damsm_scores`` wires them into a
``jax.custom_vjp``; l2-normalization of the raw inputs and its backward stay
in XLA (cheap, elementwise).  Numerics: f32 throughout VMEM; the MXU dots
optionally take bf16 operands with f32 accumulation (``compute_dtype``),
matching the XLA path's option.

Each kernel processes its whole caption block as ONE [cb*T, ...] operand —
one MXU dot per chain stage instead of a per-caption loop (fills the 128-row
MXU tiles: T=200 alone wastes 22% of the last tile, cb*T amortizes it) — and
each backward kernel computes only its own output's dots: d_regions skips the
d_w dot, d_words skips the two d_r dots, cutting the backward recompute from
2x6 to 5+4 MXU dots per pair (VERDICT r3 weak #6).

Padded words use the same -1e30 masking constant as the XLA path, so values
(and the all-padded-caption edge case) agree exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["damsm_scores"]

NEG = -1e30
CAPTION_BLOCK = 8  # padding granularity for the caption axis (max block)

# Split VMEM budgets (the hardware limit is 16 MB): pipeline IO buffers vs
# the kernel's stack-resident chain temporaries.  Calibrated against the
# on-chip (cb, vb) compile/perf matrix at the LN shapes (2026-08-19, see
# BASELINE.md): cb=8 fails to compile (the [*, 1] g/mask operands lane-pad
# 128x in VMEM), cb=4/vb=4 is the measured optimum for bf16.
_IO_BUDGET = 8 * 1024 * 1024
_STACK_BUDGET = 8 * 1024 * 1024


def _caption_blocks(rp, tp, dp, cd):
    # ((cb, vb) fwd/d_regions, (cb, vb) d_words): cb = captions DMA'd per
    # grid step (large cb amortizes grid-step and pipeline overheads — the
    # dominant efficiency factor, measured on-chip), vb = captions the
    # in-kernel chain vectorizes per sub-block iteration (the [vb*tp, ...]
    # temporaries live on the Mosaic stack, so vb is what the stack budget
    # actually constrains).  Inputs are double-buffered by the pipeline; the
    # d_regions kernel holds an f32 [rp, dp] output block + accumulator, the
    # d_words kernel an f32 [cb, tp, dp] output block.
    s = 2 if cd == jnp.bfloat16 else 4
    regions_io = 2 * rp * dp * s

    def io_misc(cb):
        # g_rows + mask, [cb*tp, 1]-shaped: every sublane tile carries 128
        # lanes for one useful value, so VMEM occupancy is 128x logical
        return 2 * 2 * (-(-cb * tp // 8)) * 8 * 128 * 4

    def tmp(vb):
        # chain temporaries: [vb*tp, rp] f32 (sim/attn/exp class) and
        # [vb*tp, dp] at the storage dtype (context/d_c class, bf16 on the
        # bf16 path)
        return vb * tp * (4 * rp * 3 + s * dp * 4)

    def fits_fwd_dr(cb, vb):
        words_io = 2 * cb * tp * dp * s
        out_dr = 2 * 4 * rp * dp  # out block + acc
        io = regions_io + words_io + out_dr + io_misc(cb)
        return io <= _IO_BUDGET and tmp(vb) <= _STACK_BUDGET

    def fits_dw(cb, vb):
        words_io = 2 * cb * tp * dp * s
        out_dw = 4 * cb * tp * dp
        io = regions_io + words_io + out_dw + io_misc(cb)
        return io <= _IO_BUDGET and tmp(vb) <= _STACK_BUDGET

    def pick(fits):
        # maximize the DMA block first, then the vector width within it
        for cb in (8, 4, 2, 1):
            for vb in (cb, cb // 2, cb // 4, cb // 8):
                if vb and fits(cb, vb):
                    return cb, vb
        return 1, 1

    return pick(fits_fwd_dr), pick(fits_dw)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_axis(x: Array, axis: int, to: int, value=0.0) -> Array:
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pair_core(w, r, gamma1, cd, real_r):
    """Shared forward math for one caption against one image's regions.

    w: [T, D] normalized words; r: [Rp, D] normalized regions (rows past the
    real R are zero).  Returns (sim, a, c_hat, inv_norm, rel).
    """
    sim = jax.lax.dot_general(
        w.astype(cd), r.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, Rp]
    # zero-padded region rows give sim == 0; exp(gamma1*0)=1 would leak
    # attention mass, so mask them out before the softmax
    col = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim = jnp.where(col < real_r, sim, NEG)
    m = jnp.max(sim, axis=1, keepdims=True)
    e = jnp.exp(gamma1 * (sim - m))  # rescale by max: stable softmax
    a = e / jnp.sum(e, axis=1, keepdims=True)  # [T, Rp]
    c = jax.lax.dot_general(
        a.astype(cd), r.astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, D]
    inv_norm = jax.lax.rsqrt(jnp.sum(c * c, axis=1, keepdims=True) + 1e-24)
    c_hat = c * inv_norm
    rel = jnp.sum(c_hat * w.astype(jnp.float32), axis=1, keepdims=True)  # [T, 1]
    return sim, a, c_hat, inv_norm, rel


def _fwd_kernel(r_ref, w_ref, mpad_ref, out_ref, *, gamma1, gamma2,
                real_r, cj, vj, tp, cd):
    j = pl.program_id(1)
    r = r_ref[0]  # [Rp, D]
    # per-caption logsumexp over static sublane slices; scalar stores to
    # VMEM are unsupported, so each score lands via a masked row add
    cjp = out_ref.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cjp), 1)
    row = jnp.zeros((1, cjp), jnp.float32)
    for sb in range(cj // vj):
        w = w_ref[sb * vj:(sb + 1) * vj].reshape(vj * tp, r.shape[1])
        _, _, _, _, rel = _pair_core(w, r, gamma1, cd, real_r)
        pad = mpad_ref[sb * vj * tp:(sb + 1) * vj * tp] > 0.5
        relv = jnp.where(pad, NEG, gamma2 * rel)
        for c in range(vj):
            rc = relv[c * tp:(c + 1) * tp]
            m = jnp.max(rc)
            s = m + jnp.log(jnp.sum(jnp.exp(rc - m)))
            row = row + jnp.where(col == j * cj + sb * vj + c, s / gamma2, 0.0)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] = out_ref[0] + row


def _block_backward(w, r, pad, g_rows, gamma1, gamma2, cd, real_r, vj, tp):
    """Shared backward chain for one caption sub-block against one image.

    w: [vj*tp, D] normalized words, r: [Rp, D] normalized regions,
    pad: [vj*tp, 1], g_rows: [vj*tp, 1] upstream d(score_ij) broadcast over
    each caption's rows.  Recomputes the forward, returns the pieces each
    output kernel finishes with its own dots: (a, d_c, d_sim, d_rel, c_hat).
    """
    sim, a, c_hat, inv_norm, rel = _pair_core(w, r, gamma1, cd, real_r)
    relv = jnp.where(pad, NEG, gamma2 * rel)
    # per-caption word softmax on static sublane slices (cheap VPU work;
    # the MXU dots below stay vectorized over the whole sub-block)
    parts = []
    for c in range(vj):
        rc = relv[c * tp:(c + 1) * tp]
        m = jnp.max(rc)
        e = jnp.exp(rc - m)
        parts.append(e / jnp.sum(e))
    p = parts[0] if vj == 1 else jnp.concatenate(parts, axis=0)
    d_rel = g_rows * p  # [vj*tp, 1]
    # the [vj*tp, D] chain dominates VPU/VMEM traffic; on the bf16 path store
    # it at the operand precision the dots consume anyway (reductions and the
    # [*, 1] scale factors stay f32)
    st = cd if cd == jnp.bfloat16 else jnp.float32
    c_hat = c_hat.astype(st)
    d_chat = (d_rel * w.astype(jnp.float32)).astype(st)  # [vj*tp, D]
    # normalize backward: d_c = (d_chat - c_hat * <c_hat, d_chat>) * inv_norm
    inner = jnp.sum((c_hat * d_chat).astype(jnp.float32), axis=1,
                    keepdims=True)
    d_c = ((d_chat - c_hat * inner.astype(st)) * inv_norm).astype(st)
    d_a = jax.lax.dot_general(
        d_c.astype(cd), r.astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [vj*tp, Rp]
    # softmax backward (temperature gamma1)
    ad = a * d_a
    d_sim = gamma1 * (ad - a * jnp.sum(ad, axis=1, keepdims=True))
    return a, d_c, d_sim, d_rel, c_hat


def _bwd_dr_kernel(r_ref, w_ref, mpad_ref, g_ref, dr_ref, *, gamma1, gamma2,
                   real_r, cj, vj, tp, cd):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dr_ref[0] = jnp.zeros_like(dr_ref[0])

    r = r_ref[0]
    acc = jnp.zeros_like(dr_ref[0])
    for sb in range(cj // vj):
        w = w_ref[sb * vj:(sb + 1) * vj].reshape(vj * tp, r.shape[1])
        rows = slice(sb * vj * tp, (sb + 1) * vj * tp)
        pad = mpad_ref[rows] > 0.5
        g_rows = g_ref[0, rows]  # [vj*tp, 1]
        a, d_c, d_sim, _, _ = _block_backward(
            w, r, pad, g_rows, gamma1, gamma2, cd, real_r, vj, tp
        )
        # contraction over the sub-block's vj*tp word rows accumulates all vj
        # captions' d_r in the two dots; d_w's dot is skipped entirely
        acc = acc + jax.lax.dot_general(
            a.astype(cd), d_c.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            d_sim.astype(cd), w.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Rp, D]
    dr_ref[0] = dr_ref[0] + acc


def _bwd_dw_kernel(w_ref, mpad_ref, r_ref, g_ref, dw_ref, *, gamma1, gamma2,
                   real_r, cj, vj, tp, cd):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref[:])

    r = r_ref[0]
    for sb in range(cj // vj):
        w = w_ref[sb * vj:(sb + 1) * vj].reshape(vj * tp, r.shape[1])
        rows = slice(sb * vj * tp, (sb + 1) * vj * tp)
        pad = mpad_ref[rows] > 0.5
        g_rows = g_ref[0, rows]
        _, _, d_sim, d_rel, c_hat = _block_backward(
            w, r, pad, g_rows, gamma1, gamma2, cd, real_r, vj, tp
        )
        # d_r's two dots are skipped entirely
        d_w = d_rel * c_hat + jax.lax.dot_general(
            d_sim.astype(cd), r.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [vj*tp, D]
        blk = dw_ref[sb * vj:(sb + 1) * vj]
        dw_ref[sb * vj:(sb + 1) * vj] = blk + d_w.reshape(blk.shape)


def _prep(regions: Array, words: Array, mask_f: Array, cd):
    """l2-normalize (XLA side), pad to kernel-friendly shapes, and store the
    operand arrays in the compute dtype (halves the per-pair DMA at bf16 —
    reductions inside the kernels stay f32)."""
    def norm(x):
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
        )

    r = norm(regions).astype(cd)
    w = norm(words).astype(cd)
    b, rr, d = r.shape
    bc, t, _ = w.shape
    rp = _round_up(rr, 128)
    # T must be a sublane-tile multiple of the words' dtype so the in-kernel
    # [cb, tp, dp] -> [cb*tp, dp] collapse is layout-free (f32 tiles are
    # (8, 128) sublanes x lanes; bf16 are (16, 128))
    tp = _round_up(t, 16 if cd == jnp.bfloat16 else 8)
    dp = _round_up(d, 128)
    cjp = _round_up(bc, CAPTION_BLOCK)
    r = _pad_axis(_pad_axis(r, 1, rp), 2, dp)
    w = _pad_axis(_pad_axis(_pad_axis(w, 1, tp), 2, dp), 0, cjp)
    # padded words / padded captions are marked padding so they never count;
    # laid out as one flag per word ROW ([cjp*tp, 1]) to match the kernels'
    # block-vectorized [cb*tp, ...] operands
    mp = _pad_axis(_pad_axis(mask_f.astype(jnp.float32), 1, tp, 1.0), 0, cjp, 1.0)
    mp = mp.reshape(cjp * tp, 1)
    return r, w, mp, (b, rr, d, bc, t, rp, tp, dp, cjp)


def _fwd_impl(regions, words, mask_f, gamma1, gamma2, cd, interpret):
    r, w, mp, (b, rr, d, bc, t, rp, tp, dp, cjp) = _prep(regions, words, mask_f, cd)
    (cb, vb), _ = _caption_blocks(rp, tp, dp, cd)
    jb = cjp // cb
    kern = functools.partial(
        _fwd_kernel, gamma1=gamma1, gamma2=gamma2, real_r=rr,
        cj=cb, vj=vb, tp=tp, cd=cd,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 1, cjp), jnp.float32),
        grid=(b, jb),
        in_specs=[
            pl.BlockSpec((1, rp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, tp, dp), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb * tp, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, cjp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r, w, mp)
    return out[:, 0, :bc]


def _bwd_impl(regions, words, mask_f, g, gamma1, gamma2, cd, interpret):
    r, w, mp, (b, rr, d, bc, t, rp, tp, dp, cjp) = _prep(regions, words, mask_f, cd)
    (cb, vb), (cb_dw, vb_dw) = _caption_blocks(rp, tp, dp, cd)
    jb = cjp // cb
    gp = _pad_axis(g.astype(jnp.float32), 1, cjp)
    # upstream cotangent broadcast over each caption's word rows, so the
    # kernels consume it as one [cb*tp, 1] operand per (image, block); both
    # backward kernels read the same array through different index maps
    g_rows = jnp.repeat(gp, tp, axis=1)[:, :, None]  # [b, cjp*tp, 1]

    dr_kern = functools.partial(
        _bwd_dr_kernel, gamma1=gamma1, gamma2=gamma2, real_r=rr,
        cj=cb, vj=vb, tp=tp, cd=cd,
    )
    d_rn = pl.pallas_call(
        dr_kern,
        out_shape=jax.ShapeDtypeStruct((b, rp, dp), jnp.float32),
        grid=(b, jb),
        in_specs=[
            pl.BlockSpec((1, rp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, tp, dp), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb * tp, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb * tp, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r, w, mp, g_rows)[:, :rr, :d]

    jb_dw = cjp // cb_dw
    dw_kern = functools.partial(
        _bwd_dw_kernel, gamma1=gamma1, gamma2=gamma2, real_r=rr,
        cj=cb_dw, vj=vb_dw, tp=tp, cd=cd,
    )
    d_wn = pl.pallas_call(
        dw_kern,
        out_shape=jax.ShapeDtypeStruct((cjp, tp, dp), jnp.float32),
        grid=(jb_dw, b),
        in_specs=[
            pl.BlockSpec((cb_dw, tp, dp), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb_dw * tp, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, dp), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb_dw * tp, 1), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cb_dw, tp, dp), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w, mp, r, g_rows)[:bc, :t, :d]

    # backward through the l2 normalizations (XLA, elementwise per vector)
    def norm_bwd(raw, d_n):
        raw = raw.astype(jnp.float32)
        nsq = jnp.maximum(jnp.sum(raw * raw, axis=-1, keepdims=True), 1e-24)
        inv = jax.lax.rsqrt(nsq)
        n_hat = raw * inv
        inner = jnp.sum(n_hat * d_n, axis=-1, keepdims=True)
        return (d_n - n_hat * inner) * inv

    return norm_bwd(regions, d_rn), norm_bwd(words, d_wn)


@functools.lru_cache(maxsize=None)
def _make_damsm(gamma1: float, gamma2: float, use_bf16: bool, interpret: bool):
    cd = jnp.bfloat16 if use_bf16 else jnp.float32

    @jax.custom_vjp
    def scores(regions, words, mask_f):
        return _fwd_impl(regions, words, mask_f, gamma1, gamma2, cd, interpret)

    def fwd(regions, words, mask_f):
        return scores(regions, words, mask_f), (regions, words, mask_f)

    def bwd(res, g):
        regions, words, mask_f = res
        d_r, d_w = _bwd_impl(regions, words, mask_f, g, gamma1, gamma2, cd, interpret)
        # cotangents must carry the primal dtypes (e.g. bf16 trunk features)
        return (d_r.astype(regions.dtype), d_w.astype(words.dtype),
                jnp.zeros_like(mask_f))

    scores.defvjp(fwd, bwd)
    return scores


def damsm_scores(
    regions: Array,
    words: Array,
    mask: Array,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    compute_dtype=None,
    interpret: bool = False,
) -> Array:
    """Pairwise DAMSM matching scores [B_img, B_cap], fused on TPU.

    ``mask``: [Bc, T] with True = padded word.  Differentiable w.r.t.
    ``regions`` and ``words`` via the custom VJP kernels above; numerics match
    ``losses.word_region_scores`` (tested in ``tests/test_pallas_ops.py``).
    """
    if compute_dtype not in (None, jnp.float32, jnp.bfloat16):
        # The XLA streaming path honors any dtype but this backend only
        # implements f32/bf16 accumulation — fail loudly rather than let the
        # two backends silently diverge (e.g. f16 coerced to f32 here).
        raise ValueError(
            f"damsm_scores: unsupported compute_dtype {compute_dtype!r}; "
            "use None, float32, or bfloat16"
        )
    fn = _make_damsm(
        float(gamma1), float(gamma2),
        compute_dtype == jnp.bfloat16, bool(interpret),
    )
    return fn(regions, words, mask.astype(jnp.float32))
