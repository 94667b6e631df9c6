"""Text-conditional modulation epilogue.

The generator's hot elementwise path is ``leaky_relu(gamma * x + beta)``
applied twice before each conv (reference ``df_gan.py:212-224,250-263``).
Plain jnp is the production implementation: inside the full train step XLA
fuses these into the producing conv/matmul epilogues, and the standalone
Pallas kernel (``ops/pallas/fused_affine.py``, 1.32x standalone) showed no
in-step win — measured and recorded in BASELINE.md, so the kernel is kept as
a documented experiment (with tests) rather than a dispatch backend.
"""

from __future__ import annotations

import jax

Array = jax.Array


def modulate(x: Array, gamma: Array, beta: Array) -> Array:
    """Per-channel affine modulation: ``gamma * x + beta`` with [B, C] params
    broadcast over the spatial dims of NHWC ``x``."""
    return gamma[:, None, None, :] * x + beta[:, None, None, :]


def modulate_lrelu(x: Array, gamma: Array, beta: Array, slope: float = 0.2) -> Array:
    """``leaky_relu(gamma * x + beta, slope)`` — the fused modulation epilogue."""
    return jax.nn.leaky_relu(modulate(x, gamma, beta), negative_slope=slope)


def double_modulate_lrelu(
    x: Array, g0: Array, b0: Array, g1: Array, b1: Array, slope: float = 0.2
) -> Array:
    """Two chained modulation epilogues (the affine0/affine1 pair of a G_Block
    residual branch, reference ``df_gan.py:213-216``)."""
    y = jax.nn.leaky_relu(modulate(x, g0, b0), negative_slope=slope)
    return jax.nn.leaky_relu(modulate(y, g1, b1), negative_slope=slope)
