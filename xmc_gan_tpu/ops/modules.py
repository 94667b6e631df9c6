"""Core neural-net ops: spectral-norm conv/dense and pooling/upsampling helpers.

TPU-native equivalents of the reference's ops layer
(``xmc_gan/model/modules.py:13-33`` — Conv2d/Conv1d/Linear with optional
``torch.nn.utils.spectral_norm``):

* NHWC/HWIO layouts throughout (channels-last is the native TPU layout; the
  reference is NCHW).
* Spectral norm is implemented as one power-iteration step whose ``u``/``v``
  state lives in a ``"spectral"`` Flax variable collection.  The estimate is
  refreshed whenever the collection is marked mutable (the train step does this
  once per optimizer update; the reference refreshes on every forward in train
  mode — up to 5x per step — which only affects power-iteration convergence
  speed, not semantics).  The matricization matches PyTorch: weight reshaped to
  ``(out_features, -1)``, ``sigma = u^T W v`` with ``u``/``v`` stop-gradiented.
* Explicit padding tuples reproduce PyTorch's ``padding=N`` behavior for
  stride-2 kernels (e.g. 4x4/s2/p1 halving).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

__all__ = [
    "SNConv",
    "SNDense",
    "fold_upsample_kernel",
    "avg_pool",
    "global_avg_pool",
    "upsample_nearest_2x",
    "leaky_relu",
]


def leaky_relu(x: Array, negative_slope: float = 0.2) -> Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def avg_pool(x: Array, window: int, stride: int | None = None) -> Array:
    """NHWC average pooling (reference uses ``F.avg_pool2d``)."""
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def global_avg_pool(x: Array) -> Array:
    """Adaptive average pool to 1x1, returned as [B, C]."""
    return x.mean(axis=(1, 2))


def upsample_nearest_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsampling (reference ``F.interpolate(scale_factor=2)``,
    default mode='nearest'). Implemented as repeats — cheap, layout-preserving,
    fuses into the consumer under XLA."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _spectral_normalize(module: nn.Module, kernel: Array, out_features: int) -> Array:
    """Shared spectral-norm body: one power iteration on the (out, -1)
    matricization with state in the ``spectral`` collection."""
    w_shape = kernel.shape
    # Move output-feature axis first, flatten the rest: (out, rest).
    w = jnp.moveaxis(kernel, -1, 0).reshape(out_features, -1)
    rest = w.shape[1]

    def _u_init():
        u0 = jax.random.normal(jax.random.PRNGKey(0), (out_features,), jnp.float32)
        return u0 / jnp.linalg.norm(u0)

    def _v_init():
        v0 = jax.random.normal(jax.random.PRNGKey(1), (rest,), jnp.float32)
        return v0 / jnp.linalg.norm(v0)

    u_var = module.variable("spectral", "u", _u_init)
    v_var = module.variable("spectral", "v", _v_init)

    w32 = w.astype(jnp.float32)
    u = u_var.value
    v = v_var.value
    if module.is_mutable_collection("spectral"):
        # One power-iteration step (reference: torch spectral_norm default,
        # n_power_iterations=1), no gradient through the iteration.
        wng = lax.stop_gradient(w32)
        v = wng.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = wng @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
        u_var.value = u
        v_var.value = v
    u = lax.stop_gradient(u)
    v = lax.stop_gradient(v)
    sigma = u @ (w32 @ v)
    w_sn = (w32 / sigma).astype(kernel.dtype)
    return jnp.moveaxis(w_sn.reshape((out_features,) + w_shape[:-1]), 0, -1).reshape(w_shape)


# Per-axis fold of nearest-2x upsampling into a 3x3/pad-1 convolution: the
# composed operator is a stride-2 transposed conv whose 4-tap kernel (offsets
# m = p - 2i in [-1, 2]) sums the 3x3 taps that can reach each output phase.
# NumPy on purpose — a module-level jnp.array would initialize the JAX
# backend at import time, breaking late platform selection (dryrun/CLI).
_UPFOLD_TAPS = np.array(
    [[0.0, 0.0, 1.0], [0.0, 1.0, 1.0], [1.0, 1.0, 0.0], [1.0, 0.0, 0.0]]
)


def fold_upsample_kernel(kernel: Array) -> Array:
    """Transform an HWIO 3x3 kernel so that a stride-2 input-dilated conv with
    the result equals ``conv3x3(pad=1)(upsample_nearest_2x(x))`` exactly.

    The returned 4x4 kernel is pre-flipped for ``lax.conv_general_dilated``
    with ``lhs_dilation=(2, 2)`` and padding ``((2, 2), (2, 2))``.
    """
    taps = jnp.asarray(_UPFOLD_TAPS, kernel.dtype)
    k4 = jnp.einsum("ma,nb,abio->mnio", taps, taps, kernel)
    return k4[::-1, ::-1]


class SNConv(nn.Module):
    """NHWC 2-D convolution with optional spectral normalization.

    TPU-native equivalent of reference ``conv2d_nxn``
    (``model/modules.py:13-18``).  ``padding`` is the symmetric integer pad of
    PyTorch's ``padding=N``.

    ``pre_upsample`` fuses a nearest-2x upsampling of the input into the conv
    itself (exact algebraic fold — see :func:`fold_upsample_kernel`): the
    parameters stay an ordinary 3x3 kernel (checkpoint/export compatible) but
    the upsampled intermediate is never materialized and the conv runs as a
    2.25x-cheaper stride-2 transposed conv.
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    feature_group_count: int = 1
    spec_norm: bool = False
    pre_upsample: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable | None = None  # None -> zeros
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1] // self.feature_group_count
        kshape = (self.kernel_size, self.kernel_size, in_features, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        if self.spec_norm:
            kernel = _spectral_normalize(self, kernel, self.features)
        if self.pre_upsample:
            if self.kernel_size != 3 or self.strides != 1 or self.padding != 1:
                raise ValueError("pre_upsample folds only a 3x3/stride-1/pad-1 conv")
            y = lax.conv_general_dilated(
                x,
                fold_upsample_kernel(kernel).astype(x.dtype),
                window_strides=(1, 1),
                padding=((2, 2), (2, 2)),
                lhs_dilation=(2, 2),
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                bias_init = self.bias_init or nn.initializers.zeros
                bias = self.param("bias", bias_init, (self.features,), self.param_dtype)
                y = y + bias.astype(y.dtype)
            return y
        kernel = kernel.astype(x.dtype)
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.strides, self.strides),
            padding=pad,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias_init = self.bias_init or nn.initializers.zeros
            bias = self.param("bias", bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


class SNDense(nn.Module):
    """Dense layer with optional spectral normalization
    (reference ``linear``, ``model/modules.py:28-33``)."""

    features: int
    use_bias: bool = True
    spec_norm: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable | None = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), self.param_dtype
        )
        if self.spec_norm:
            kernel = _spectral_normalize(self, kernel, self.features)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias_init = self.bias_init or nn.initializers.zeros
            bias = self.param("bias", bias_init, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
