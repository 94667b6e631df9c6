"""Fused text-conditional modulation epilogue.

The generator's hot elementwise path is ``leaky_relu(gamma * x + beta)``
applied twice before each conv (reference ``df_gan.py:212-224,250-263``).
``modulate_lrelu`` is the single seam for that op: the default implementation
is plain jnp (XLA fuses it into the producing matmul/conv epilogue); a Pallas
TPU kernel implementation lives in ``ops/pallas/fused_affine.py`` and can be
enabled globally with ``set_backend("pallas")`` (benchmarked in ``bench.py``;
the faster backend wins per-shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BACKEND = "xla"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def modulate(x: Array, gamma: Array, beta: Array) -> Array:
    """Per-channel affine modulation: ``gamma * x + beta`` with [B, C] params
    broadcast over the spatial dims of NHWC ``x``."""
    return gamma[:, None, None, :] * x + beta[:, None, None, :]


def modulate_lrelu(x: Array, gamma: Array, beta: Array, slope: float = 0.2) -> Array:
    """``leaky_relu(gamma * x + beta, slope)`` — the fused modulation epilogue."""
    if _BACKEND == "pallas":
        from xmc_gan_tpu.ops.pallas.fused_affine import modulate_lrelu_pallas

        return modulate_lrelu_pallas(x, gamma, beta, slope)
    y = modulate(x, gamma, beta)
    return jax.nn.leaky_relu(y, negative_slope=slope)


def double_modulate_lrelu(
    x: Array, g0: Array, b0: Array, g1: Array, b1: Array, slope: float = 0.2
) -> Array:
    """Two chained modulation epilogues (the affine0/affine1 pair of a G_Block
    residual branch, reference ``df_gan.py:213-216``)."""
    if _BACKEND == "pallas":
        from xmc_gan_tpu.ops.pallas.fused_affine import double_modulate_lrelu_pallas

        return double_modulate_lrelu_pallas(x, g0, b0, g1, b1, slope)
    y = jax.nn.leaky_relu(modulate(x, g0, b0), negative_slope=slope)
    return jax.nn.leaky_relu(modulate(y, g1, b1), negative_slope=slope)
