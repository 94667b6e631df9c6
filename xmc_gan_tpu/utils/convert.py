"""PyTorch checkpoint -> JAX parameter conversion.

The reference trains against *pretrained PyTorch* artifacts: the DAMSM text
encoder ``text_encoder100.pth`` (``cfg/df_gan_damsm.yml:62``, loaded at
``train_gan.py:461-468``) and optional D warm-starts (``train_gan.py:494-495``).
This module converts those ``state_dict``s into this framework's Flax pytrees
so pretrained text encoders keep working on TPU, and supports the parity tests
of SURVEY.md §4 ("fixed-seed forward of G/D with weights converted from a saved
PyTorch init").

Layout rules applied here:

* ``nn.Linear.weight``  [out, in]      -> Dense ``kernel``  [in, out]  (transpose)
* ``nn.Conv2d.weight``  [O, I, kH, kW] -> Conv ``kernel``    [kH, kW, I, O] (HWIO)
* RNN weights keep the torch layout verbatim — ``RNNEncoder`` stores
  ``weight_ih_l0``-style parameters natively (``models/encoder.py``).

torch is imported lazily (CPU-only wheel is in the image); numpy arrays are
returned so the caller controls device placement/sharding.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = [
    "load_state_dict",
    "rnn_encoder_params",
    "load_rnn_encoder",
    "linear_to_dense",
    "conv2d_to_hwio",
]


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a ``.pth`` state_dict to {name: float32 numpy array} on CPU."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def linear_to_dense(weight: np.ndarray, bias: np.ndarray | None = None) -> dict:
    """torch ``nn.Linear`` -> Flax Dense param dict."""
    p: dict[str, np.ndarray] = {"kernel": np.ascontiguousarray(weight.T)}
    if bias is not None:
        p["bias"] = bias
    return p


def conv2d_to_hwio(weight: np.ndarray, bias: np.ndarray | None = None) -> dict:
    """torch ``nn.Conv2d`` [O, I, kH, kW] -> Flax Conv param dict (HWIO)."""
    p: dict[str, np.ndarray] = {"kernel": np.transpose(weight, (2, 3, 1, 0))}
    if bias is not None:
        p["bias"] = bias
    return p


def rnn_encoder_params(state_dict: Mapping[str, Any]) -> dict:
    """Convert the reference ``RNN_ENCODER`` state_dict to ``RNNEncoder`` params.

    The reference module tree (``encoder.py:94-105``) is
    ``encoder.weight`` (Embedding) + ``rnn.{weight,bias}_{ih,hh}_l0[_reverse]``;
    ``RNNEncoder`` deliberately uses the same tensor layouts, so this is a
    rename-and-copy.
    """
    params: dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        arr = np.asarray(value, dtype=np.float32)
        if key == "encoder.weight":
            params["embedding"] = arr
        elif key.startswith("rnn."):
            params[key[len("rnn."):]] = arr
        # drop_prob has no parameters; anything else is unexpected
        else:
            raise KeyError(f"Unexpected RNN_ENCODER state_dict key: {key}")
    return params


def load_rnn_encoder(path: str) -> dict:
    """Load + convert the DAMSM text encoder checkpoint in one call."""
    return rnn_encoder_params(load_state_dict(path))
