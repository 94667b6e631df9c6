"""Word-attention concept GAN tests: shapes vs the concept_gan arch tables,
masked-attention invariants (padding positions get zero weight)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.models import concept_gan
from xmc_gan_tpu.models.common import concept_gen_arch
from xmc_gan_tpu.registry import get_generator


def _cfg(size=64):
    return cfg_from_dict({
        "TRAIN": {"NCH": 4, "NEF": 24, "NOISE_DIM": 16, "HE_INIT": True},
        "IMG": {"SIZE": size},
        "TEXT": {"EMBEDDING_DIM": 20, "MAX_LENGTH": 6},
    })


def _inputs(cfg, bs=2):
    rng = np.random.RandomState(0)
    noise = jnp.asarray(rng.randn(bs, cfg.TRAIN.NOISE_DIM), jnp.float32)
    sent = jnp.asarray(rng.randn(bs, cfg.TEXT.EMBEDDING_DIM), jnp.float32)
    words = jnp.asarray(
        rng.randn(bs, cfg.TEXT.MAX_LENGTH, cfg.TEXT.EMBEDDING_DIM), jnp.float32
    )
    mask = jnp.asarray(
        np.array([[False] * 4 + [True] * 2, [False] * 2 + [True] * 4])
    )
    return noise, sent, words, mask


@pytest.mark.parametrize("name", ["CONCEPT_INATTN_GEN", "CONCEPT_OUTATTN_GEN"])
def test_word_attention_generators_forward(name):
    cfg = _cfg(64)
    model = get_generator(name)(cfg)
    noise, sent, words, mask = _inputs(cfg)
    v = model.init(jax.random.PRNGKey(0), noise, sent, words, mask)
    img = model.apply(v, noise, sent, words, mask)
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.abs(np.asarray(img)).max() <= 1.0


def test_arch_table_matches_reference_values():
    a = concept_gen_arch(256, 2)
    assert a["in_channels"] == [32, 32, 16, 16, 8, 4, 2]
    assert a["out_channels"] == [32, 16, 16, 8, 4, 2, 2]
    assert a["attention"] == [False, False, True, True, True, True, True]
    assert a["depth"] == 7


def test_masked_words_do_not_influence_output():
    """Changing embeddings at padded positions must not change the image
    (the -inf mask kills their attention weight; this is the invariant the
    word-region loss relies on)."""
    cfg = _cfg(64)
    model = concept_gan.OutNetG(cfg)
    noise, sent, words, mask = _inputs(cfg)
    v = model.init(jax.random.PRNGKey(1), noise, sent, words, mask)
    img_a = model.apply(v, noise, sent, words, mask)
    perturbed = np.asarray(words).copy()
    perturbed[0, 4:, :] += 100.0  # masked positions of row 0
    perturbed[1, 2:, :] -= 50.0  # masked positions of row 1
    img_b = model.apply(v, noise, sent, jnp.asarray(perturbed), mask)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-5)

    # sanity: unmasked perturbation does change the output
    perturbed2 = np.asarray(words).copy()
    perturbed2[0, 0, :] += 5.0
    img_c = model.apply(v, noise, sent, jnp.asarray(perturbed2), mask)
    assert np.abs(np.asarray(img_a) - np.asarray(img_c)).max() > 1e-6


def test_in_variant_uses_image_query_attention():
    """InConceptBlock attends per spatial position (word context varies with
    the image); shapes flow through the wrapper with upsampling."""
    cfg = _cfg(64)
    blk = concept_gan._AttnResBlockUp(
        in_dim=16, out_dim=8, gc_dim=40, text_dim=24, upsample=True,
        normalize=True, he_init=True, inner="in",
    )
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    gc = jnp.asarray(rng.randn(2, 40), jnp.float32)
    words = jnp.asarray(rng.randn(2, 6, 24), jnp.float32)
    mask = jnp.zeros((2, 6), bool)
    v = blk.init(jax.random.PRNGKey(0), x, gc, words, mask)
    out = blk.apply(v, x, gc, words, mask)
    assert out.shape == (2, 16, 16, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_resblockup_fused_upsample_matches_unfused():
    """ResBlockUp's pre-conv upsample folds into c1 (and the shortcut's 1x1
    runs at low resolution) without changing the math."""
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(2, 8, 8, 12), jnp.float32)
    cond = jnp.asarray(rs.randn(2, 20), jnp.float32)
    ref_blk = concept_gan.ResBlockUp(
        in_dim=12, out_dim=8, cond_dim=20, upsample=True, normalize=True,
        he_init=True, fuse_upsample=False,
    )
    variables = ref_blk.init(jax.random.PRNGKey(0), x, cond)
    want = np.asarray(ref_blk.apply(variables, x, cond))
    fused_blk = concept_gan.ResBlockUp(
        in_dim=12, out_dim=8, cond_dim=20, upsample=True, normalize=True,
        he_init=True, fuse_upsample=True,
    )
    got = np.asarray(fused_blk.apply(variables, x, cond))
    assert got.shape == (2, 16, 16, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
