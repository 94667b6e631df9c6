"""InceptionV3 feature extractor for FID, in Flax (NHWC).

The reference computes FID with ``pytorch_fid.calculate_fid_given_paths``
(``train_gan.py:389``), whose backbone is InceptionV3 truncated at the 2048-dim
``pool3`` features.  This is the TPU-native equivalent: the standard
InceptionV3 topology (Szegedy et al. 2015) with the two behavioral switches the
FID variant needs (``fid_variant=True``: average pools exclude padding, and the
last Inception-E block pools with max instead of avg — the quirks of the
``pt_inception-2015-12-05`` graph that pytorch_fid reproduces).  Weights
convert from either a torchvision ``inception_v3`` or a pytorch_fid FID
checkpoint via ``inception_params_from_torch`` (identical tensor names).

Everything is inference-only (BatchNorm running stats), jit-friendly, NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

__all__ = ["InceptionV3", "inception_params_from_torch", "preprocess"]


def _avg_pool_3x3_exclude_pad(x: Array) -> Array:
    """3x3/s1/p1 average pool with count_include_pad=False (FID variant):
    divide by the number of *valid* taps, not 9."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    summed = nn.pool(x, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    counts = nn.pool(ones, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    return summed / counts


def _avg_pool_3x3_include_pad(x: Array) -> Array:
    summed = nn.pool(x, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    return summed / 9.0


def _max_pool(x: Array, window: int, stride: int, pad: int = 0) -> Array:
    return nn.max_pool(
        x, (window, window), (stride, stride), ((pad, pad), (pad, pad))
    )


class BasicConv2d(nn.Module):
    """conv(no bias) + BN(eps=1e-3, frozen stats) + relu."""

    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=tuple((p, p) for p in self.padding),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        pool = (_avg_pool_3x3_exclude_pad if self.fid_variant
                else _avg_pool_3x3_include_pad)(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        pool = (_avg_pool_3x3_exclude_pad if self.fid_variant
                else _avg_pool_3x3_include_pad)(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pool_mode: 'avg' (torchvision / FID block 1) or 'max' (FID block 2,
    # pytorch_fid FIDInceptionE_2)
    pool_mode: str = "avg"
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_mode == "max":
            pool = _max_pool(x, 3, 1, pad=1)
        else:
            pool = (_avg_pool_3x3_exclude_pad if self.fid_variant
                    else _avg_pool_3x3_include_pad)(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def preprocess(images: Array, size: int = 299) -> Array:
    """[-1, 1] NHWC at any resolution -> 299x299 (bilinear), matching
    pytorch_fid's ``resize_input``/``normalize_input`` wrapper (images saved to
    PNG by the reference are re-read in [0,1]; [-1,1] here is the same after
    its x*2-1)."""
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), "bilinear")
    return images


class InceptionV3(nn.Module):
    """Returns 2048-dim pool3 features (and logits when ``num_classes>0``)."""

    fid_variant: bool = True
    num_classes: int = 0

    @nn.compact
    def __call__(self, x: Array, *, return_logits: bool = False):
        fid = self.fid_variant
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", fid, name="Mixed_7b")(x)
        x = InceptionE("max" if fid else "avg", fid, name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> [B, 2048]
        if self.num_classes and return_logits:
            return nn.Dense(self.num_classes, name="fc")(feats)
        return feats


def inception_params_from_torch(state_dict) -> dict:
    """torchvision/pytorch_fid ``inception_v3`` state_dict -> Flax variables
    ``{'params': ..., 'batch_stats': ...}``.  Tensor names map 1:1; conv
    weights transpose OIHW -> HWIO."""

    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path: Sequence[str], leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for name, value in state_dict.items():
        arr = np.asarray(value, dtype=np.float32)
        parts = name.split(".")
        if parts[0].startswith("AuxLogits"):
            continue
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], np.transpose(arr, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["scale"], arr)
            elif parts[-1] == "bias":
                put(params, parts[:-1] + ["bias"], arr)
            elif parts[-1] == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], arr)
            elif parts[-1] == "running_var":
                put(batch_stats, parts[:-1] + ["var"], arr)
            # num_batches_tracked: dropped
        elif parts[0] == "fc":
            if parts[-1] == "weight":
                put(params, ["fc", "kernel"], arr.T)
            else:
                put(params, ["fc", "bias"], arr)
        elif parts[-1] == "num_batches_tracked":
            continue
        else:
            raise KeyError(f"Unrecognized inception tensor {name}")
    return {"params": params, "batch_stats": batch_stats}
