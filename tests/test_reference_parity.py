"""Forward parity vs the actual reference PyTorch models (SURVEY.md §4):
fixed weights converted torch -> Flax, identical inputs, outputs compared.

The reference is imported read-only from /root/reference (torchvision, which
it imports only for ``save_image``, is stubbed).  This is the test backing the
"generated images match within FID tolerance" clause: if the forward graphs
agree numerically, FID agreement follows from weight conversion.
"""

import sys
import types

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

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_df_gan():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from xmc_gan.model import df_gan as ref  # noqa: E402

    return ref


def _ref_cfg(ours):
    """Reference models read attribute-style cfg; mirror ours."""
    ns = types.SimpleNamespace
    return ns(
        TRAIN=ns(NCH=ours.TRAIN.NCH, NEF=ours.TRAIN.NEF,
                 NOISE_DIM=ours.TRAIN.NOISE_DIM),
        TEXT=ns(EMBEDDING_DIM=ours.TEXT.EMBEDDING_DIM),
        IMG=ns(SIZE=ours.IMG.SIZE),
        DISC=ns(SPEC_NORM=ours.DISC.SPEC_NORM,
                IMG_MATCH=ours.DISC.IMG_MATCH,
                SENT_MATCH=ours.DISC.SENT_MATCH,
                SEPERATE=ours.DISC.SEPERATE),
    )


def _cfg(img_size=64, spec_norm=True):
    return cfg_from_dict({
        "TRAIN": {"NCH": 4, "NEF": 24, "NOISE_DIM": 8},
        "IMG": {"SIZE": img_size},
        "TEXT": {"EMBEDDING_DIM": 16},
        "DISC": {"SPEC_NORM": spec_norm, "IMG_MATCH": True},
    })


@pytest.mark.parametrize("img_size", [64, 128])
def test_generator_forward_matches_reference(ref_df_gan, img_size):
    import torch

    cfg = _cfg(img_size)
    torch.manual_seed(0)
    ref_g = ref_df_gan.NetG(_ref_cfg(cfg))
    ref_g.eval()

    params = df_gan_generator_params(ref_g.state_dict())
    model = df_gan.NetG(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)), jnp.zeros((1, 16)))
    merged, skipped = merge_partial(init["params"], params)
    assert not skipped, skipped

    rng = np.random.RandomState(1)
    noise = rng.randn(3, 8).astype(np.float32)
    sent = rng.randn(3, 16).astype(np.float32)

    with torch.no_grad():
        want = ref_g(torch.from_numpy(noise), torch.from_numpy(sent)).numpy()
    got = model.apply({"params": jax.tree.map(jnp.asarray, merged)},
                      jnp.asarray(noise), jnp.asarray(sent))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got_nchw.shape == want.shape == (3, 3, img_size, img_size)
    np.testing.assert_allclose(got_nchw, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("spec_norm", [False, True])
def test_discriminator_forward_matches_reference(ref_df_gan, spec_norm):
    import torch

    cfg = _cfg(64, spec_norm=spec_norm)
    torch.manual_seed(2)
    ref_d = ref_df_gan.NetD(_ref_cfg(cfg))
    ref_d.eval()

    params, spectral = df_gan_discriminator_params(ref_d.state_dict())
    model = df_gan.NetD(cfg)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      jnp.zeros((1, 24)), method="d_all")
    merged, skipped = merge_partial(init["params"], params)
    assert not skipped, skipped
    variables = {"params": jax.tree.map(jnp.asarray, merged)}
    if spec_norm:
        spec_merged, s_skipped = merge_partial(init["spectral"], spectral)
        assert not s_skipped, s_skipped
        variables["spectral"] = jax.tree.map(jnp.asarray, spec_merged)

    rng = np.random.RandomState(3)
    imgs = rng.uniform(-1, 1, (3, 3, 64, 64)).astype(np.float32)
    sent = rng.randn(3, 24).astype(np.float32)

    with torch.no_grad():
        want_feats = ref_d(torch.from_numpy(imgs))
        want_match, want_img_feat, _ = ref_d.COND_DNET(
            want_feats, torch.from_numpy(sent)
        )
    feats = model.apply(variables, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))))
    match, img_feat, _ = model.apply(variables, feats, jnp.asarray(sent),
                                     method="logits")
    np.testing.assert_allclose(
        np.transpose(np.asarray(feats), (0, 3, 1, 2)), want_feats.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(match), want_match.numpy().reshape(-1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(img_feat), want_img_feat.numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("img_size,spec_norm", [(128, True), (256, False)])
def test_discriminator_export_strict_loads_into_reference(
    ref_df_gan, img_size, spec_norm
):
    """Exported D state_dicts strict-load into the reference NetD at 128/256px,
    where the last downblocks have in_dim == out_dim and the reference still
    constructs (unused) conv_s modules (df_gan.py:281) that our ResD omits —
    the exporter must emit placeholder tensors for them."""
    import torch

    from xmc_gan_tpu.utils.convert import df_gan_discriminator_state_dict

    cfg = _cfg(img_size, spec_norm)
    model = df_gan.NetD(cfg)
    init = model.init(
        jax.random.PRNGKey(7),
        jnp.zeros((1, img_size, img_size, 3)),
        jnp.zeros((1, 24)),
        method="d_all",
    )
    sd = df_gan_discriminator_state_dict(init["params"], init.get("spectral"))
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
          if not k.startswith("region_proj")}

    torch.manual_seed(1)
    ref_d = ref_df_gan.NetD(_ref_cfg(cfg))
    ref_d.load_state_dict(sd, strict=True)

    # and the loaded reference model still agrees with ours on a forward
    ref_d.eval()
    rng = np.random.RandomState(5)
    imgs = rng.uniform(-1, 1, (2, 3, img_size, img_size)).astype(np.float32)
    sent = rng.randn(2, 24).astype(np.float32)
    with torch.no_grad():
        want_feats = ref_d(torch.from_numpy(imgs))
        want_match, _, _ = ref_d.COND_DNET(want_feats, torch.from_numpy(sent))
    variables = {"params": init["params"]}
    if spec_norm:
        variables["spectral"] = init["spectral"]
    feats = model.apply(variables, jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))))
    match, _, _ = model.apply(variables, feats, jnp.asarray(sent), method="logits")
    np.testing.assert_allclose(
        np.asarray(match), want_match.numpy().reshape(-1), rtol=1e-3, atol=1e-4
    )
