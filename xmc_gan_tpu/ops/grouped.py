"""Grouped (per-concept) dense ops for the concept-GAN model families.

The reference implements per-concept-group projections as grouped 1x1
``nn.Conv2d``/``nn.Conv1d`` on ``[B, C*d, 1, 1]`` tensors
(``df_concept_gan.py:178-200,266-268``).  On TPU that layout wastes the MXU:
here group projections are batched einsums over an explicit group axis
``[B, groups, d]`` — one fused contraction instead of a grouped conv on a
1-pixel image.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from xmc_gan_tpu.ops.modules import _spectral_normalize

Array = jax.Array

__all__ = ["GroupedDense"]


class GroupedDense(nn.Module):
    """Per-group dense layer: ``[B, groups, d_in] -> [B, groups, d_out]``.

    Equivalent to a grouped 1x1 convolution with ``groups`` feature groups
    (PyTorch weight ``[groups*d_out, d_in, 1, 1]``).  Spectral norm uses the
    same ``(out_total, d_in)`` matricization as PyTorch for parity.
    """

    features: int  # d_out per group
    use_bias: bool = True
    spec_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, groups, d_in = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, (groups, d_in, self.features), self.param_dtype
        )
        if self.spec_norm:
            # (d_in, groups*features) so _spectral_normalize's moveaxis(-1, 0)
            # yields PyTorch's (out_total, d_in) matricization.
            k2 = kernel.transpose(1, 0, 2).reshape(d_in, groups * self.features)
            k2 = _spectral_normalize(self, k2, groups * self.features)
            kernel = k2.reshape(d_in, groups, self.features).transpose(1, 0, 2)
        y = jnp.einsum("bgi,gio->bgo", x, kernel.astype(x.dtype))
        if self.use_bias:
            bias_init = self.bias_init or nn.initializers.zeros
            bias = self.param("bias", bias_init, (groups, self.features), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
