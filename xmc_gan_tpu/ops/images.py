"""Device-side image dtype/range conversion.

The host input pipeline ships images as **uint8 NHWC** (``data/pipeline.py``);
the ``ToTensor + Normalize(.5,.5)`` mapping to [-1, 1] that the reference does
per-example on the CPU (``dataset.py:32-37``) runs on device instead, where
XLA fuses it into the first conv's input read.  Rationale: host->device
transfer is the wall-clock bottleneck of the full training loop (a 256² bs128
float32 batch is ~100 MB per step), and uint8 cuts it 4x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["to_unit_range"]


def to_unit_range(x: jax.Array, dtype=None) -> jax.Array:
    """uint8 images -> [-1, 1] float; float inputs pass through unchanged.

    The uint8 branch reproduces the retired host-side normalization
    bit-for-bit: the same ``/255 * 2 - 1`` op order in float32, with any cast
    to a lower-precision ``dtype`` (e.g. bf16) applied only afterwards —
    exactly what ``batch["imgs"].astype(dtype)`` did when the loader shipped
    pre-normalized float32.
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    if dtype is not None and x.dtype != dtype:
        x = x.astype(dtype)
    return x
