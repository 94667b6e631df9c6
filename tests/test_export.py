"""jax.export serving artifacts: round-trip parity with the in-process
sampler, symbolic batch, word-attention signature, CLI surface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.utils.export import (
    export_sampler,
    load_sampler,
    save_sampler,
    uses_words,
)


def tiny_cfg(gen="DF_GEN"):
    return cfg_from_dict({
        "TRAIN": {"NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True},
        "GEN": {"ENCODER_NAME": gen},
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8},
    })


def test_export_roundtrip_matches_direct_sampler(tmp_path):
    from xmc_gan_tpu.train import make_sample_fn

    cfg = tiny_cfg()
    exported, params_tpl = export_sampler(cfg)  # symbolic batch
    path = save_sampler(str(tmp_path / "sampler.jaxexport"), exported)
    serve = load_sampler(path)

    from xmc_gan_tpu.train import make_models

    g_model, _ = make_models(cfg, jnp.float32)
    rng = np.random.RandomState(0)
    noise3 = jnp.asarray(rng.randn(3, 16), jnp.float32)
    sent3 = jnp.asarray(rng.randn(3, 48), jnp.float32)
    params = g_model.init(jax.random.PRNGKey(1), noise3, sent3)["params"]
    # the artifact's parameter template matches the real init tree
    assert jax.tree.structure(params_tpl) == jax.tree.structure(params)

    want = make_sample_fn(cfg)(params, noise3, sent3)
    got = serve(params, noise3, sent3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # symbolic batch: the same artifact serves a different request size
    noise5 = jnp.asarray(rng.randn(5, 16), jnp.float32)
    sent5 = jnp.asarray(rng.randn(5, 48), jnp.float32)
    assert np.asarray(serve(params, noise5, sent5)).shape == (5, 64, 64, 3)


@pytest.mark.slow
def test_export_word_attention_family(tmp_path):
    from xmc_gan_tpu.train import make_models, make_sample_fn

    cfg = tiny_cfg("CONCEPT_OUTATTN_GEN")
    assert uses_words(cfg)
    exported, _ = export_sampler(cfg, batch_size=2)  # pinned batch
    serve = load_sampler(save_sampler(str(tmp_path / "s.jaxexport"), exported))

    g_model, _ = make_models(cfg, jnp.float32)
    rng = np.random.RandomState(1)
    noise = jnp.asarray(rng.randn(2, 16), jnp.float32)
    sent = jnp.asarray(rng.randn(2, 48), jnp.float32)
    words = jnp.asarray(rng.randn(2, 8, 48), jnp.float32)
    mask = jnp.asarray(rng.rand(2, 8) > 0.6)
    params = g_model.init(jax.random.PRNGKey(2), noise, sent, words, mask)["params"]

    want = make_sample_fn(cfg)(params, noise, sent, words, mask)
    got = serve(params, noise, sent, words, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cli_export_sampler_smoke(tmp_path):
    from xmc_gan_tpu import cli

    out = str(tmp_path / "artifact.jaxexport")
    rc = cli.main([
        "export-sampler", "--cfg", "xmc_gan_tpu/cfg/df_gan_damsm.yml",
        "--imsize", "64", "--out", out, "--platforms", "cpu",
    ])
    assert rc == 0
    import os

    assert os.path.getsize(out) > 1000
