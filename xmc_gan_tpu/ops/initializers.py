"""Weight initializers reproducing the reference's init regimes.

Two regimes exist in the reference:

* ``HE_INIT`` (``cfg.TRAIN.HE_INIT``, applied via ``netG.apply(weight_init)``,
  reference ``train_gan.py:65-69,476-478``): every Conv2d/Linear weight gets
  Kaiming-normal fan-in (ReLU gain) and biases are zeroed.  Crucially this is
  applied *after* module construction, so it **overwrites** the special
  zeros/ones init of the text-conditional affine layers
  (reference ``df_gan.py:244-248``) — all canonical run configs set
  ``HE_INIT: True``, so the shipped behavior is Kaiming weights with zero
  biases even in the affine MLPs.  We reproduce that ordering faithfully.

* default (no ``HE_INIT``): PyTorch's module defaults — Kaiming-uniform with
  ``a=sqrt(5)`` which reduces to ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for
  both weight and bias — with the affine special init kept intact.

All initializers produce NHWC/HWIO layouts (JAX convention); fan-in is computed
over the receptive field times input channels, matching PyTorch's fan
computation for OIHW kernels.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

__all__ = [
    "he_normal_fan_in",
    "torch_default_kernel_init",
    "torch_default_bias_init",
    "zeros_init",
    "ones_init",
]

# Kaiming normal, mode='fan_in', nonlinearity='relu' (gain^2 = 2).
he_normal_fan_in = variance_scaling(2.0, "fan_in", "normal")

# PyTorch default: kaiming_uniform_(a=sqrt(5)) == U(-1/sqrt(fan_in), +1/sqrt(fan_in)),
# i.e. variance scale 1/3 under a fan_in uniform scheme.
torch_default_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")

zeros_init = jax.nn.initializers.zeros
ones_init = jax.nn.initializers.ones


def torch_default_bias_init(fan_in: int):
    """PyTorch default bias init: ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
