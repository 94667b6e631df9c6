"""Forward parity for the concept-DF family vs the actual reference
``df_concept_gan`` models (converted weights, identical inputs)."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.models import df_concept_gan
from xmc_gan_tpu.utils.convert import df_concept_generator_params, merge_partial

pytestmark = pytest.mark.slow

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_mod():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.utils.save_image = lambda *a, **k: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from xmc_gan.model import df_concept_gan as ref

    return ref


def _cfgs(normalize=True):
    ours = cfg_from_dict({
        "TRAIN": {"NCH": 4, "NEF": 24, "NOISE_DIM": 8},
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 16},
        "GEN": {"NORMALIZE": normalize},
    })
    ns = types.SimpleNamespace
    ref_cfg = ns(
        TRAIN=ns(NCH=4, NEF=24, NOISE_DIM=8),
        TEXT=ns(EMBEDDING_DIM=16),
        IMG=ns(SIZE=64),
        GEN=ns(NORMALIZE=normalize),
    )
    return ours, ref_cfg


@pytest.mark.parametrize("variant,normalize", [
    ("In", True), ("In", False), ("Out", True),
])
def test_concept_generator_forward_matches_reference(ref_mod, variant, normalize):
    import torch

    ours_cfg, ref_cfg = _cfgs(normalize)
    torch.manual_seed(0)
    ref_g = (ref_mod.InNetG if variant == "In" else ref_mod.OutNetG)(ref_cfg)
    ref_g.eval()

    converted = df_concept_generator_params(ref_g.state_dict())
    model = (df_concept_gan.InNetG if variant == "In" else df_concept_gan.OutNetG)(
        ours_cfg
    )
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)), jnp.zeros((1, 16)))
    merged, skipped = merge_partial(init["params"], converted)
    assert not skipped, skipped

    rng = np.random.RandomState(1)
    noise = rng.randn(2, 8).astype(np.float32)
    sent = rng.randn(2, 16).astype(np.float32)

    with torch.no_grad():
        want = ref_g(torch.from_numpy(noise), torch.from_numpy(sent)).numpy()
    got = model.apply({"params": jax.tree.map(jnp.asarray, merged)},
                      jnp.asarray(noise), jnp.asarray(sent))
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got_nchw.shape == want.shape == (2, 3, 64, 64)
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("variant", ["in", "out"])
def test_concept_fused_upsample_matches_unfused(variant):
    """The deferred-upsample fold (fuse_upsample) is an exact restructure of
    the concept generators too: the 1x1 split conv + LeakyReLU commute with
    nearest upsampling and the grouped 3x3 absorbs the fold."""
    cfg = cfg_from_dict({
        "TRAIN": {"NCH": 4, "NEF": 24, "NOISE_DIM": 16, "HE_INIT": True},
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 24},
        "GEN": {"NORMALIZE": True},
    })
    cls = df_concept_gan.InNetG if variant == "in" else df_concept_gan.OutNetG
    rs = np.random.RandomState(3)
    noise = jnp.asarray(rs.randn(2, 16), jnp.float32)
    sent = jnp.asarray(rs.randn(2, 24), jnp.float32)
    ref_model = cls(cfg, fuse_upsample=False)
    variables = ref_model.init(jax.random.PRNGKey(0), noise, sent)
    want = np.asarray(ref_model.apply(variables, noise, sent))
    got = np.asarray(cls(cfg, fuse_upsample=True).apply(variables, noise, sent))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
