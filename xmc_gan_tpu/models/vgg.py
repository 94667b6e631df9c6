"""VGG-19 image feature encoder for the VGG perceptual contrastive loss.

The reference defines ``cfg.TRAIN.ENCODER_LOSS.VGG`` but raises
``NotImplementedError`` where the loss would be added (reference
``train_gan.py:279-281``, the dead ``enc_loss += vgg_loss`` line carries no
weight) — like the WORD loss, this framework implements the objective the
flag promises: the XMC-GAN paper's image-image contrastive loss over
features from an ImageNet-pretrained VGG-19.  ``vgg_loss`` is the same
symmetric label-weighted InfoNCE as ``losses.img_loss``, computed on
VGG features of (real, fake) instead of the discriminator's pooled trunk.

TPU-first: NHWC convs, bf16-capable activations with fp32 feature output,
one global-average-pooled tap (default ``relu5_4``, the deepest conv
activation — the tap layer is configurable since the reference specifies
nothing).  Weights convert from a torchvision ``vgg19`` state_dict
(``vgg19_params_from_torch``); with no weights available the random-init
encoder still exercises the full code path (weaker but valid contrastive
features — documented, mirroring the FID fallback).  Topology/conversion
parity is tested against a from-scratch torch oracle
(``tests/test_vgg.py``), since torchvision itself is absent here.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["VGG19Features", "vgg19_params_from_torch", "preprocess"]

# torchvision vgg19 'E' configuration: conv channel per layer, 'M' = maxpool
VGG19_CFG = [
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
]

# tap names in torchvision convention: reluN_M = after the M-th conv of
# block N (the relu following it)
_TAPS = {}
_block, _idx = 1, 1
for _v in VGG19_CFG:
    if _v == "M":
        _block += 1
        _idx = 1
    else:
        _TAPS[f"relu{_block}_{_idx}"] = len(_TAPS)
        _idx += 1

# ImageNet normalization (torchvision transforms convention)
_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def preprocess(images: Array) -> Array:
    """[-1, 1] NHWC RGB -> ImageNet-normalized float32."""
    x01 = (images.astype(jnp.float32) + 1.0) / 2.0
    return (x01 - _MEAN) / _STD


class VGG19Features(nn.Module):
    """VGG-19 conv tower; returns the globally-average-pooled activation of
    ``tap`` (fp32, [B, C]).  Frozen encoder: parameters are supplied by the
    caller, never part of the train state."""

    tap: str = "relu5_4"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        if self.tap not in _TAPS:
            raise KeyError(f"unknown VGG tap {self.tap!r}; one of {list(_TAPS)}")
        x = preprocess(images).astype(self.dtype)
        conv_i = 0
        out = None
        tap_i = _TAPS[self.tap]
        for v in VGG19_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            if conv_i == tap_i:
                out = x
                break
            conv_i += 1
        feats = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # GAP -> [B, C]
        return feats


def vgg19_params_from_torch(state_dict: dict) -> dict:
    """Map a torchvision ``vgg19`` (or ``vgg19.features``) state_dict onto
    ``VGG19Features`` params: conv kernels OIHW -> HWIO, in configuration
    order (torchvision indexes convs at features.{0,2,5,...}; we index them
    densely as conv0..conv15)."""
    import numpy as np

    feat_keys = sorted(
        (k for k in state_dict if k.endswith(".weight")
         and (".features." in k or k.startswith("features."))
         and getattr(state_dict[k], "ndim", 0) == 4),
        key=lambda k: int(k.split("features.")[-1].split(".")[0]),
    )
    params = {}
    for i, wk in enumerate(feat_keys):
        bk = wk[: -len("weight")] + "bias"
        w = np.asarray(state_dict[wk], np.float32).transpose(2, 3, 1, 0)
        params[f"conv{i}"] = {
            "kernel": w,
            "bias": np.asarray(state_dict[bk], np.float32),
        }
    return {"params": params}
