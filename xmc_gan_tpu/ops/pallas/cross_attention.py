"""Pallas kernel: blockwise masked cross-attention (image queries x word keys).

**Status: documented experiment** (mirroring ``fused_affine``) — standalone
1.76x over XLA at an LN-like shape, but no production consumer: the LN
word-region loss it was designed for is served by ``damsm_score`` (whose
pairwise every-image-x-every-caption structure and custom VJP this kernel
cannot express), and the ``concept_gan`` samplers' grouped state_dim=4
attention is the wrong shape for the MXU (see ``ops/pallas/__init__``).
Kept, tested, as a seam for future single-pair attention workloads.

The mechanics: image-queries-attend-over-words with padding masked to -inf.
At the reference's T<=20 XLA handles it inline; at T in the hundreds with
N = H*W image queries the [N, T] score matrix per batch element is the hot
object, and this kernel computes the context **blockwise over the word axis
with an online (flash-style) softmax** — scores never materialize in HBM,
VMEM usage is O(TILE_N * TILE_T), and arbitrary T streams through.

    ctx[b, n, :] = sum_t softmax_t(scale * q[b,n]·k[b,t] + mask)  v[b, t, :]

``masked_cross_attention`` is the public seam: jnp fallback off-TPU (or with
``backend='xla'``), Pallas kernel on TPU.  Numerics are float32 inside the
kernel regardless of input dtype (softmax over hundreds of words in bf16
loses mass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["masked_cross_attention"]

TILE_N = 256  # query tile (sublanes)
TILE_T = 128  # word-block size streamed per step


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float, t_total: int):
    """Grid program: one (batch, query-tile).  Streams word blocks with an
    online softmax (running max m, running sum l, running accumulator acc)."""
    q = q_ref[0].astype(jnp.float32)  # [TN, D]
    tn = q.shape[0]
    d = v_ref.shape[-1]
    num_blocks = pl.cdiv(t_total, TILE_T)

    def body(tb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(tb * TILE_T, TILE_T), :].astype(jnp.float32)  # [TT, D]
        v = v_ref[0, pl.ds(tb * TILE_T, TILE_T), :].astype(jnp.float32)
        pad = mask_ref[0, 0, pl.ds(tb * TILE_T, TILE_T)]  # [TT] True = padding

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [TN, TT]
        # padding and out-of-range tail (T padded up to a TILE_T multiple)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + tb * TILE_T
        invalid = pad[None, :] | (col >= t_total)
        s = jnp.where(invalid, -jnp.inf, s)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # [TN, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # guard: all-invalid block keeps m_new finite via m_prev init -inf ->
        # exp(-inf - -inf) handled below with where
        alpha = jnp.where(
            jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0
        )  # rescale of old mass
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - m_new), 0.0)  # [TN, TT]
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        acc = alpha * acc + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((tn, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((tn, 1), jnp.float32)
    acc0 = jnp.zeros((tn, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _pad_axis(x: Array, axis: int, to: int, value=0):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def masked_cross_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Array,
    scale: float = 1.0,
    backend: str | None = None,
) -> Array:
    """softmax over words of ``scale * q k^T`` (padding masked out) @ v.

    q: [B, N, D] image queries; k/v: [B, T, D] word keys/values;
    mask: [B, T] True = padding.  Returns [B, N, D] contexts in q's dtype.
    """
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "xla":
        s = jnp.einsum(
            "bnd,btd->bnt", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * scale
        s = jnp.where(mask[:, None, :], -jnp.inf, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bnt,btd->bnd", p, v.astype(jnp.float32)).astype(q.dtype)

    b, n, d = q.shape
    t = k.shape[1]
    tn = min(TILE_N, n)
    n_pad = pl.cdiv(n, tn) * tn
    t_pad = pl.cdiv(t, TILE_T) * TILE_T
    qp = _pad_axis(q, 1, n_pad)
    kp = _pad_axis(k, 1, t_pad)
    vp = _pad_axis(v, 1, t_pad)
    # mask rides as [B, 1, T]: TPU block shapes need the last two dims tileable
    # or equal to the array dims.
    maskp = _pad_axis(mask, 1, t_pad, value=True)[:, None, :]

    grid = (b, n_pad // tn)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_total=t),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tn, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(qp, kp, vp, maskp)
    return out[:, :n, :]
