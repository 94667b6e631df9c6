"""Pallas kernel: fused text-conditional modulation epilogue.

``leaky_relu(gamma * x + beta)`` over NHWC activations with per-(batch,
channel) modulation — the generator's most frequent elementwise pattern
(reference ``df_gan.py:250-263``; 4 occurrences per G block).

Status: **documented experiment, not a production backend.**  Standalone it
beats the unfused XLA epilogue 1.32x (v5e, bf16), but inside the full train
step XLA fuses the modulation into the producing convs and the kernel showed
no in-step win (BASELINE.md), so ``ops/fused.py`` ships the plain-jnp form
and this kernel is kept with its parity tests as the reference Pallas
implementation of the pattern.

Grid: one program per (batch, spatial tile).  The channel axis is kept whole
(last-dim lanes); spatial rows tile in chunks of ``TILE_HW`` sublanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

__all__ = ["modulate_lrelu_pallas", "double_modulate_lrelu_pallas"]

TILE_HW = 256


def _launch(kernel, x: Array, mods: list[Array]) -> Array:
    b, h, w, c = x.shape
    hw = h * w
    xf = x.reshape(b, hw, c)
    tile = min(TILE_HW, hw)
    grid = (b, pl.cdiv(hw, tile))

    x_spec = pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    # modulation vectors ride as [B, 1, C] so the trailing block dims are
    # (1, C) = the array dims (TPU block-shape tiling rule)
    m_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        grid=grid,
        in_specs=[x_spec] + [m_spec] * len(mods),
        out_specs=x_spec,
        # modulation vectors stay fp32: Mosaic's bf16 (16, 128) tiling rejects
        # the degenerate [B, 1, C] buffers (remote-compile failure on v5e);
        # kernels cast after the broadcast.
    )(xf, *[m.astype(jnp.float32)[:, None, :] for m in mods])
    return out.reshape(b, h, w, c)


def modulate_lrelu_pallas(x: Array, gamma: Array, beta: Array, slope: float = 0.2) -> Array:
    """Fused ``leaky_relu(gamma * x + beta)``; x NHWC, gamma/beta [B, C]."""

    def kernel(x_ref, g_ref, b_ref, out_ref):
        # g/b blocks are fp32 [1, 1, C]; compute in fp32, cast on store
        x = x_ref[:].astype(jnp.float32)
        y = g_ref[0, 0, :][None, None, :] * x + b_ref[0, 0, :][None, None, :]
        out_ref[:] = jnp.where(y >= 0, y, slope * y).astype(out_ref.dtype)

    return _launch(kernel, x, [gamma, beta])


def double_modulate_lrelu_pallas(
    x: Array, g0: Array, b0: Array, g1: Array, b1: Array, slope: float = 0.2
) -> Array:
    """Two chained fused epilogues (affine0+affine1 of a G-block branch)."""

    def kernel(x_ref, g0_ref, b0_ref, g1_ref, b1_ref, out_ref):
        x = x_ref[:].astype(jnp.float32)
        y = g0_ref[0, 0, :][None, None, :] * x + b0_ref[0, 0, :][None, None, :]
        y = jnp.where(y >= 0, y, slope * y)
        y = g1_ref[0, 0, :][None, None, :] * y + b1_ref[0, 0, :][None, None, :]
        out_ref[:] = jnp.where(y >= 0, y, slope * y).astype(out_ref.dtype)

    return _launch(kernel, x, [g0, b0, g1, b1])
