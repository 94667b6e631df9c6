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


def rnn_encoder_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse of ``rnn_encoder_params``: our ``RNNEncoder`` params back to the
    reference ``RNN_ENCODER`` state_dict names (tensor layouts are shared)."""
    sd: dict[str, np.ndarray] = {}
    for key, value in params.items():
        arr = np.asarray(value, np.float32)
        if key == "embedding":
            sd["encoder.weight"] = arr
        else:
            sd[f"rnn.{key}"] = arr
    return sd


# --------------------------------------------------------------------------- #
# DF-GAN G/D state_dicts (reference model/df_gan.py) -> Flax trees.
# torch's spectral_norm wrapper stores ``weight_orig`` + power-iteration
# vectors ``weight_u``/``weight_v``; those map to our kernel + the
# ``spectral`` variable collection.
# --------------------------------------------------------------------------- #


def _put(tree: dict, path: list[str], leaf) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = leaf


def _convert_tensor(tree: dict, spectral: dict, path: list[str], leaf_name: str,
                    arr: np.ndarray, is_conv: bool) -> None:
    if leaf_name in ("weight", "weight_orig"):
        kernel = np.transpose(arr, (2, 3, 1, 0)) if is_conv else arr.T
        _put(tree, path + ["kernel"], np.ascontiguousarray(kernel))
    elif leaf_name == "bias":
        _put(tree, path + ["bias"], arr)
    elif leaf_name == "weight_u":
        _put(spectral, path + ["u"], arr)
    elif leaf_name == "weight_v":
        _put(spectral, path + ["v"], arr)
    else:
        raise KeyError(f"Unexpected tensor {'.'.join(path)}.{leaf_name}")


def df_gan_generator_params(state_dict: Mapping[str, Any]) -> dict:
    """Reference ``NetG`` state_dict (``df_gan.py:64-103``) -> our ``NetG``
    params.  Name map: ``upblocks.{i}`` -> ``block{i}``; ``affine{j}.
    fc_gamma.linear{k}`` -> ``affine{j}/fc_gamma_{k}``; ``conv_out.1`` (the
    Conv inside the Sequential) -> ``conv_out``; ``proj_sent`` ->
    ``proj_sent_dense``."""
    params: dict = {}
    for name, value in state_dict.items():
        arr = np.asarray(value, dtype=np.float32)
        p = name.split(".")
        if p[0] == "proj_noise":
            _convert_tensor(params, {}, ["proj_noise"], p[-1], arr, is_conv=False)
        elif p[0] == "proj_sent":
            _convert_tensor(params, {}, ["proj_sent_dense"], p[-1], arr, is_conv=False)
        elif p[0] == "upblocks":
            block = f"block{p[1]}"
            sub = p[2]
            if sub in ("c1", "c2", "c_sc"):
                _convert_tensor(params, {}, [block, sub], p[-1], arr, is_conv=True)
            elif sub == "gamma":
                _put(params, [block, "gamma"], arr.reshape(1))
            elif sub.startswith("affine"):
                # affine{j}.fc_gamma.linear{k}.weight -> affine{j}/fc_gamma_{k}
                fc, linear = p[3], p[4]  # fc_gamma|fc_beta, linear1|linear2
                leaf = f"{fc}_{linear[-1]}"
                _convert_tensor(params, {}, [block, sub, leaf], p[-1], arr,
                                is_conv=False)
            else:
                raise KeyError(f"Unexpected NetG tensor {name}")
        elif p[0] == "conv_out":
            _convert_tensor(params, {}, ["conv_out"], p[-1], arr, is_conv=True)
        else:
            raise KeyError(f"Unexpected NetG tensor {name}")
    return params


def df_gan_discriminator_params(state_dict: Mapping[str, Any]) -> tuple[dict, dict]:
    """Reference ``NetD`` state_dict (``df_gan.py:106-176``) -> (params,
    spectral) trees.  Name map: ``downblocks.{i}`` -> ``block{i+1}`` (our
    blocks are numbered by arch stage); ``conv_r.0/.2`` -> ``conv_r1/conv_r2``;
    ``COND_DNET`` -> ``cond_dnet`` with ``joint_conv.0/.2`` ->
    ``joint_conv1/joint_conv2``."""
    params: dict = {}
    spectral: dict = {}
    for name, value in state_dict.items():
        arr = np.asarray(value, dtype=np.float32)
        p = name.split(".")
        if p[0] == "conv_img":
            _convert_tensor(params, spectral, ["conv_img"], p[-1], arr, is_conv=True)
        elif p[0] == "downblocks":
            block = f"block{int(p[1]) + 1}"
            sub = p[2]
            if sub == "conv_r":
                leaf = {"0": "conv_r1", "2": "conv_r2"}[p[3]]
                _convert_tensor(params, spectral, [block, leaf], p[-1], arr,
                                is_conv=True)
            elif sub == "conv_s":
                _convert_tensor(params, spectral, [block, "conv_s"], p[-1], arr,
                                is_conv=True)
            elif sub == "gamma":
                _put(params, [block, "gamma"], arr.reshape(1))
            else:
                raise KeyError(f"Unexpected NetD tensor {name}")
        elif p[0] == "COND_DNET":
            sub = p[1]
            if sub == "proj_match":
                _convert_tensor(params, spectral, ["cond_dnet", "proj_match"],
                                p[-1], arr, is_conv=False)
            elif sub == "joint_conv":
                leaf = {"0": "joint_conv1", "2": "joint_conv2"}[p[2]]
                _convert_tensor(params, spectral, ["cond_dnet", leaf], p[-1], arr,
                                is_conv=True)
            else:
                raise KeyError(f"Unexpected NetD tensor {name}")
        else:
            raise KeyError(f"Unexpected NetD tensor {name}")
    _permute_conv_v(params, spectral)
    return params, spectral


def _permute_conv_v(params: dict, spectral: dict) -> None:
    """torch matricizes conv weights as (O, I*kH*kW); our spectral norm
    flattens the HWIO kernel as (O, kH*kW*I).  ``u`` (length O) transfers
    verbatim; ``v`` must be re-ordered from (I, kH, kW) to (kH, kW, I)."""
    for key, spec_node in spectral.items():
        if not isinstance(spec_node, Mapping):
            continue
        if "v" in spec_node and "kernel" in params.get(key, {}):
            kernel = params[key]["kernel"]  # HWIO
            if kernel.ndim == 4:
                kh, kw, i, _ = kernel.shape
                spec_node["v"] = np.ascontiguousarray(
                    spec_node["v"].reshape(i, kh, kw).transpose(1, 2, 0).reshape(-1)
                )
        else:
            _permute_conv_v(params.get(key, {}), spec_node)


def _grouped_1x1_to_dense(weight: np.ndarray, groups: int) -> np.ndarray:
    """torch grouped 1x1 conv ``[g*f, d_in, 1, 1]`` -> GroupedDense kernel
    ``[g, d_in, f]`` (output channels are group-major in torch)."""
    gf, d_in = weight.shape[0], weight.shape[1]
    f = gf // groups
    return np.ascontiguousarray(
        weight.reshape(groups, f, d_in, 1, 1)[..., 0, 0].transpose(0, 2, 1)
    )


def df_concept_generator_params(
    state_dict: Mapping[str, Any], groups: int = 16
) -> dict:
    """Reference ``df_concept_gan.InNetG``/``OutNetG`` state_dict -> our
    ``InNetG``/``OutNetG`` params (``models/df_concept_gan.py``).

    Grouped 1x1 convs become ``GroupedDense`` kernels; the two-layer
    ``gamma/beta`` Sequentials map to the ``g1``/``g2`` GroupedDense pair;
    everything else is layout conversion (reference ``df_concept_gan.py``
    module names cited in the model docstrings)."""
    params: dict = {}
    for name, value in state_dict.items():
        arr = np.asarray(value, dtype=np.float32)
        p = name.split(".")
        if p[0] == "proj_noise":
            _convert_tensor(params, {}, ["proj_noise"], p[-1], arr, is_conv=False)
        elif p[0] == "proj_sent":
            _convert_tensor(params, {}, ["proj_sent_dense"], p[-1], arr, is_conv=False)
        elif p[0] == "conv_out":
            _convert_tensor(params, {}, ["conv_out"], p[-1], arr, is_conv=True)
        elif p[0] == "upblocks":
            block = f"block{p[1]}"
            sub = p[2]
            if sub in ("conv_out1", "conv_out2", "c_sc"):
                _convert_tensor(params, {}, [block, sub], p[-1], arr, is_conv=True)
            elif sub == "gamma":
                _put(params, [block, "gamma"], arr.reshape(1))
            elif sub in ("concept1", "concept2"):
                inner = p[3]
                base = [block, sub]
                if inner in ("split_conv", "trans_gconv"):
                    _convert_tensor(params, {}, base + [inner], p[-1], arr,
                                    is_conv=True)
                elif inner == "gn":
                    leaf = {"weight": "scale", "bias": "bias"}[p[-1]]
                    _put(params, base + ["gn", leaf], arr)
                elif inner.startswith("concept_sampler"):
                    proj = p[4]  # query/key/value_gconv or gn1/gn2
                    if proj == "norm":
                        continue  # rsqrt(state_dim) buffer; computed inline here
                    if proj.endswith("_gconv"):
                        _put(params, base + [inner, proj, "kernel"],
                             _grouped_1x1_to_dense(arr, groups))
                    else:  # gn1 / gn2
                        leaf = {"weight": "scale", "bias": "bias"}[p[-1]]
                        _put(params, base + [inner, proj, leaf], arr)
                elif inner.startswith("concept_reasoner"):
                    # proj_edge: Linear(p' -> C), shared across groups
                    _convert_tensor(params, {}, base + [inner, "proj_edge"],
                                    p[-1], arr, is_conv=False)
                elif inner.startswith("sent_linear"):
                    _convert_tensor(params, {}, base + [inner], p[-1], arr,
                                    is_conv=False)
                elif inner.endswith("_gconv"):  # gamma{k}_gconv / beta{k}_gconv
                    # Sequential index is p[4]: '0' -> g1, '2' -> g2
                    g_leaf = {"0": "g1", "2": "g2"}[p[4]]
                    kern = _grouped_1x1_to_dense(arr, groups) if p[-1] == "weight" \
                        else arr.reshape(groups, -1)
                    _put(params, base + [inner, g_leaf,
                                         "kernel" if p[-1] == "weight" else "bias"],
                         kern)
                else:
                    raise KeyError(f"Unexpected concept tensor {name}")
            else:
                raise KeyError(f"Unexpected upblock tensor {name}")
        else:
            raise KeyError(f"Unexpected NetG tensor {name}")
    return params


# --------------------------------------------------------------------------- #
# Inverse direction: Flax trees -> reference-named torch state_dicts, so
# TPU-trained checkpoints flow back into the PyTorch ecosystem
# (SURVEY.md §2 row 17 "PyTorch-compat export").
# --------------------------------------------------------------------------- #


def _kernel_to_torch(kernel: np.ndarray) -> np.ndarray:
    arr = np.asarray(kernel, np.float32)
    if arr.ndim == 4:  # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
    return np.ascontiguousarray(arr.T)  # Dense (in, out) -> (out, in)


def df_gan_generator_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Our ``NetG`` params -> reference ``NetG`` state_dict names."""
    sd: dict[str, np.ndarray] = {}

    def put(name, node):
        sd[f"{name}.weight"] = _kernel_to_torch(node["kernel"])
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"], np.float32)

    for key, node in params.items():
        if key == "proj_noise":
            put("proj_noise", node)
        elif key == "proj_sent_dense":
            put("proj_sent", node)
        elif key == "conv_out":
            put("conv_out.1", node)
        elif key.startswith("block"):
            i = int(key[len("block"):])
            for sub, snode in node.items():
                if sub in ("c1", "c2", "c_sc"):
                    put(f"upblocks.{i}.{sub}", snode)
                elif sub == "gamma":
                    sd[f"upblocks.{i}.gamma"] = np.asarray(snode, np.float32)
                elif sub.startswith("affine"):
                    for leaf, lnode in snode.items():
                        fc, lin = leaf.rsplit("_", 1)  # fc_gamma_1 -> fc_gamma, 1
                        put(f"upblocks.{i}.{sub}.{fc}.linear{lin}", lnode)
                else:
                    raise KeyError(f"Unexpected NetG param {key}/{sub}")
        else:
            raise KeyError(f"Unexpected NetG param {key}")
    return sd


def df_gan_discriminator_state_dict(
    params: Mapping[str, Any], spectral: Mapping[str, Any] | None = None
) -> dict[str, np.ndarray]:
    """Our ``NetD`` params (+ spectral state) -> reference ``NetD`` state_dict
    (spectral-normalized tensors get ``weight_orig``/``weight_u``/``weight_v``;
    conv ``v`` vectors permute back to torch's (I, kH, kW) flattening)."""
    spectral = spectral or {}
    sd: dict[str, np.ndarray] = {}

    def put(name, node, spec_node):
        kernel = np.asarray(node["kernel"], np.float32)
        has_spec = isinstance(spec_node, Mapping) and "u" in spec_node
        w_name = f"{name}.weight_orig" if has_spec else f"{name}.weight"
        sd[w_name] = _kernel_to_torch(kernel)
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"], np.float32)
        if has_spec:
            sd[f"{name}.weight_u"] = np.asarray(spec_node["u"], np.float32)
            v = np.asarray(spec_node["v"], np.float32)
            if kernel.ndim == 4:
                kh, kw, i, _ = kernel.shape
                v = np.ascontiguousarray(
                    v.reshape(kh, kw, i).transpose(2, 0, 1).reshape(-1)
                )
            sd[f"{name}.weight_v"] = v

    for key, node in params.items():
        spec = spectral.get(key, {})
        if key == "conv_img":
            put("conv_img", node, spec)
        elif key.startswith("block"):
            i = int(key[len("block"):]) - 1
            for sub, snode in node.items():
                sspec = spec.get(sub, {}) if isinstance(spec, Mapping) else {}
                if sub == "conv_r1":
                    put(f"downblocks.{i}.conv_r.0", snode, sspec)
                elif sub == "conv_r2":
                    put(f"downblocks.{i}.conv_r.2", snode, sspec)
                elif sub == "conv_s":
                    put(f"downblocks.{i}.conv_s", snode, sspec)
                elif sub == "gamma":
                    sd[f"downblocks.{i}.gamma"] = np.asarray(snode, np.float32)
                else:
                    raise KeyError(f"Unexpected NetD param {key}/{sub}")
            if "conv_s" not in node:
                # The reference resD constructs conv_s unconditionally but only
                # calls it when in_dim != out_dim (df_gan.py:281,287-291); our
                # ResD omits the module for equal dims, so strict load into the
                # reference NetD (which 128/256px archs hit in their last
                # blocks) needs placeholder tensors.  They are functionally
                # unused — conv_s.forward never runs for equal-dim blocks.
                _, _, in_dim, out_dim = np.asarray(node["conv_r1"]["kernel"]).shape
                assert in_dim == out_dim, f"block{i + 1} missing conv_s with unequal dims"
                spec_on = isinstance(spec, Mapping) and "u" in spec.get("conv_r1", {})
                w_name = f"downblocks.{i}.conv_s.weight_orig" if spec_on \
                    else f"downblocks.{i}.conv_s.weight"
                sd[w_name] = np.zeros((out_dim, in_dim, 1, 1), np.float32)
                sd[f"downblocks.{i}.conv_s.bias"] = np.zeros((out_dim,), np.float32)
                if spec_on:
                    u = np.zeros((out_dim,), np.float32); u[0] = 1.0
                    v = np.zeros((in_dim,), np.float32); v[0] = 1.0
                    sd[f"downblocks.{i}.conv_s.weight_u"] = u
                    sd[f"downblocks.{i}.conv_s.weight_v"] = v
        elif key == "cond_dnet":
            for sub, snode in node.items():
                sspec = spec.get(sub, {}) if isinstance(spec, Mapping) else {}
                if sub == "proj_match":
                    put("COND_DNET.proj_match", snode, sspec)
                elif sub == "joint_conv1":
                    put("COND_DNET.joint_conv.0", snode, sspec)
                elif sub == "joint_conv2":
                    put("COND_DNET.joint_conv.2", snode, sspec)
                elif sub == "region_proj":
                    # word-loss head: framework extension, no reference name
                    put("region_proj", snode, sspec)
                else:
                    raise KeyError(f"Unexpected NetD param {key}/{sub}")
        elif key == "region_proj":
            put("region_proj", node, spec)
        else:
            raise KeyError(f"Unexpected NetD param {key}")
    return sd


def merge_partial(tree: dict, updates: dict, path: str = "") -> tuple[dict, list[str]]:
    """Non-strict merge (torch ``load_state_dict(strict=False)`` semantics,
    reference D warm start ``train_gan.py:494-495``): leaves present in both
    and shape-compatible are replaced; everything else keeps the initialized
    value.  Returns (merged, list of skipped update paths)."""
    skipped: list[str] = []

    def walk(node, upd, prefix):
        out = dict(node)
        for k, v in upd.items():
            child = f"{prefix}/{k}" if prefix else k
            if k not in node:
                skipped.append(child)
            elif isinstance(v, Mapping) and isinstance(node[k], Mapping):
                out[k] = walk(node[k], v, child)
            elif getattr(node[k], "shape", None) == getattr(v, "shape", None):
                out[k] = np.asarray(v, dtype=np.float32)
            else:
                skipped.append(child)
        return out

    return walk(tree, updates, path), skipped
