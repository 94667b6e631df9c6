"""DF-GAN torch-checkpoint conversion: reference-named state_dicts (built with
plain torch modules, spectral-norm wrappers included) convert into our Flax
trees, load, and forward; init semantics and strict=False merging verified."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.models import df_gan
from xmc_gan_tpu.utils.convert import (
    df_gan_discriminator_params,
    df_gan_generator_params,
    merge_partial,
)


def _cfg():
    return cfg_from_dict({
        "TRAIN": {"NCH": 4, "NEF": 32, "NOISE_DIM": 8},
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 16},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })


def _torch_netg_state_dict(cfg):
    """A state_dict with the reference NetG's exact names/shapes
    (df_gan.py:64-103,179-263), built from plain torch layers."""
    import torch.nn as nn

    ngf, nef = cfg.TRAIN.NCH, cfg.TRAIN.NEF
    in_ch = [8 * ngf, 8 * ngf, 8 * ngf, 4 * ngf, 2 * ngf]
    out_ch = [8 * ngf, 8 * ngf, 4 * ngf, 2 * ngf, 1 * ngf]

    sd = {}
    def add(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    add("proj_noise", nn.Linear(cfg.TRAIN.NOISE_DIM, 8 * ngf * 16))
    add("proj_sent", nn.Linear(cfg.TEXT.EMBEDDING_DIM, nef))
    import torch

    for i, (ci, co) in enumerate(zip(in_ch, out_ch)):
        add(f"upblocks.{i}.c1", nn.Conv2d(ci, co, 3, 1, 1))
        add(f"upblocks.{i}.c2", nn.Conv2d(co, co, 3, 1, 1))
        for j, feats in enumerate([ci, ci, co, co]):
            for fc in ("fc_gamma", "fc_beta"):
                add(f"upblocks.{i}.affine{j}.{fc}.linear1", nn.Linear(nef, 256))
                add(f"upblocks.{i}.affine{j}.{fc}.linear2", nn.Linear(256, feats))
        sd[f"upblocks.{i}.gamma"] = torch.zeros(1)
        if ci != co:
            add(f"upblocks.{i}.c_sc", nn.Conv2d(ci, co, 1))
    add("conv_out.1", nn.Conv2d(out_ch[-1], 3, 3, 1, 1))
    return sd


def _torch_netd_state_dict(cfg):
    """Reference NetD names incl. torch spectral_norm (weight_orig/u/v)."""
    import torch
    import torch.nn as nn
    from torch.nn.utils import spectral_norm

    ndf, nef = cfg.TRAIN.NCH, cfg.TRAIN.NEF
    in_ch = [3, ndf, 2 * ndf, 4 * ndf, 8 * ndf]
    out_ch = [ndf, 2 * ndf, 4 * ndf, 8 * ndf, 16 * ndf]

    sd = {}
    def add(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v

    add("conv_img", spectral_norm(nn.Conv2d(3, ndf, 3, 1, 1)))
    for i in range(1, 5):
        ci, co = in_ch[i], out_ch[i]
        add(f"downblocks.{i-1}.conv_r.0",
            spectral_norm(nn.Conv2d(ci, co, 4, 2, 1, bias=False)))
        add(f"downblocks.{i-1}.conv_r.2",
            spectral_norm(nn.Conv2d(co, co, 3, 1, 1, bias=False)))
        add(f"downblocks.{i-1}.conv_s", spectral_norm(nn.Conv2d(ci, co, 1)))
        sd[f"downblocks.{i-1}.gamma"] = torch.zeros(1)
    add("COND_DNET.proj_match", spectral_norm(nn.Linear(16 * ndf, nef)))
    add("COND_DNET.joint_conv.0",
        spectral_norm(nn.Conv2d(16 * ndf + nef, 2 * ndf, 3, 1, 1, bias=False)))
    add("COND_DNET.joint_conv.2",
        spectral_norm(nn.Conv2d(2 * ndf, 1, 4, 1, 0, bias=False)))
    return sd


def test_generator_checkpoint_converts_and_runs():
    cfg = _cfg()
    sd = _torch_netg_state_dict(cfg)
    converted = df_gan_generator_params(sd)

    model = df_gan.NetG(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)), jnp.zeros((1, 16)))
    merged, skipped = merge_partial(init["params"], converted)
    assert not skipped, skipped
    img = model.apply({"params": jax.tree.map(jnp.asarray, merged)},
                      jnp.ones((2, 8)), jnp.ones((2, 16)))
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    # gamma gates arrive as the zero-init scalars the reference uses
    np.testing.assert_array_equal(np.asarray(merged["block0"]["gamma"]), [0.0])
    # Linear layout: kernel is the transpose of torch weight
    np.testing.assert_allclose(
        np.asarray(merged["proj_noise"]["kernel"]),
        sd["proj_noise.weight"].numpy().T,
    )


def test_discriminator_checkpoint_converts_with_spectral_state():
    cfg = _cfg()
    sd = _torch_netd_state_dict(cfg)
    params_upd, spec_upd = df_gan_discriminator_params(sd)

    model = df_gan.NetD(cfg)
    import functools

    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 32)), method="d_all")
    merged, skipped = merge_partial(init["params"], params_upd)
    assert not skipped, skipped
    spec_merged, spec_skipped = merge_partial(init["spectral"], spec_upd)
    assert not spec_skipped, spec_skipped

    variables = {"params": jax.tree.map(jnp.asarray, merged),
                 "spectral": jax.tree.map(jnp.asarray, spec_merged)}
    feats = model.apply(variables, jnp.ones((2, 64, 64, 3)))
    match, img_feat, _ = model.apply(variables, feats, jnp.ones((2, 32)),
                                     method="logits")
    assert match.shape == (2,) and img_feat.shape == (2, 32)
    # conv layout: HWIO transpose of torch OIHW weight_orig
    np.testing.assert_allclose(
        np.asarray(merged["conv_img"]["kernel"]),
        np.transpose(sd["conv_img.weight_orig"].numpy(), (2, 3, 1, 0)),
    )


def test_export_roundtrip_generator():
    """Flax -> torch state_dict -> Flax is the identity (PyTorch-compat
    export, SURVEY.md §2 row 17)."""
    from xmc_gan_tpu.utils.convert import df_gan_generator_state_dict

    cfg = _cfg()
    model = df_gan.NetG(cfg)
    init = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8)), jnp.zeros((1, 16)))
    sd = df_gan_generator_state_dict(init["params"])
    back = df_gan_generator_params(sd)
    merged, skipped = merge_partial(init["params"], back)
    assert not skipped, skipped
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(init["params"]),
        jax.tree_util.tree_leaves_with_path(merged),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_export_roundtrip_discriminator_with_spectral():
    from xmc_gan_tpu.utils.convert import df_gan_discriminator_state_dict

    cfg = _cfg()
    model = df_gan.NetD(cfg)
    init = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 32)), method="d_all")
    sd = df_gan_discriminator_state_dict(init["params"], init["spectral"])
    # exported names follow the torch spectral_norm convention
    assert "conv_img.weight_orig" in sd and "conv_img.weight_u" in sd
    back_p, back_s = df_gan_discriminator_params(
        {k: v for k, v in sd.items() if not k.startswith("region_proj")}
    )
    merged, skipped = merge_partial(init["params"], back_p)
    assert not skipped, skipped
    spec_merged, s_skipped = merge_partial(init["spectral"], back_s)
    assert not s_skipped, s_skipped
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(init["params"]),
        jax.tree_util.tree_leaves_with_path(merged),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(init["spectral"]),
        jax.tree_util.tree_leaves_with_path(spec_merged),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_merge_partial_strict_false_semantics():
    base = {"a": {"kernel": np.zeros((2, 2))}, "b": {"bias": np.zeros(3)}}
    upd = {"a": {"kernel": np.ones((2, 2))},
           "b": {"bias": np.ones(4)},  # shape mismatch -> skipped
           "c": {"kernel": np.ones(1)}}  # missing target -> skipped
    merged, skipped = merge_partial(base, upd)
    np.testing.assert_array_equal(merged["a"]["kernel"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["bias"], np.zeros(3))
    assert sorted(skipped) == ["b/bias", "c"]
