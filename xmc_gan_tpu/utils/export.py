"""Portable serving artifacts for the sampler via ``jax.export`` (StableHLO).

The reference has no deployment story — inference is the eval loop's
in-process G forward (reference ``train_gan.py:361-365``).  The TPU-native
seam is ``jax.export``: the jitted sampler lowers once to a versioned,
platform-checked StableHLO artifact that any PJRT runtime (C++ serving
stacks, other hosts, later jax versions) can load and execute without the
Python model code.  Parameters remain call-time inputs, so one artifact
serves every checkpoint of a config; the batch axis is exported symbolically
by default, so one artifact serves any request size.

Word-attention generator families (``*ATTN*``) consume ``words/mask`` and
export with them; the DF-GAN / concept-DF families condition on the sentence
embedding only and export a 3-argument artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xmc_gan_tpu.config import Config

__all__ = ["uses_words", "export_sampler", "save_sampler", "load_sampler"]


def uses_words(cfg: Config) -> bool:
    """Whether the configured generator family consumes words/mask in G
    (the word-attention concept family, ``models/concept_gan.py:396``)."""
    return "ATTN" in cfg.GEN.ENCODER_NAME and "DF" not in cfg.GEN.ENCODER_NAME


def export_sampler(
    cfg: Config,
    *,
    batch_size: int | None = None,
    dtype=jnp.float32,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
):
    """Lower the jitted sampler to a serialized multi-platform artifact.

    ``batch_size=None`` exports a symbolic batch dimension (any request
    size); an int pins it.  Returns ``(exported, g_params_template)`` where
    the template is a shape/dtype pytree of the generator parameters the
    artifact expects (restore real values from a checkpoint).
    """
    from jax import export as jax_export

    from xmc_gan_tpu.train import make_models, make_sample_fn

    g_model, _ = make_models(cfg, dtype)
    sample = make_sample_fn(cfg, g_model=g_model, dtype=dtype)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch_size
    noise = jax.ShapeDtypeStruct((b, cfg.TRAIN.NOISE_DIM), jnp.float32)
    sent = jax.ShapeDtypeStruct((b, cfg.TEXT.EMBEDDING_DIM), jnp.float32)
    if uses_words(cfg):
        words = jax.ShapeDtypeStruct(
            (b, cfg.TEXT.MAX_LENGTH, cfg.TEXT.EMBEDDING_DIM), jnp.float32
        )
        mask = jax.ShapeDtypeStruct((b, cfg.TEXT.MAX_LENGTH), jnp.bool_)
    else:
        words = mask = None

    # concrete shapes for init (symbolic dims can't initialize), abstract for
    # the export trace itself
    def concrete(x):
        return (
            None
            if x is None
            else jnp.zeros((2,) + tuple(x.shape[1:]), x.dtype)
        )

    params = jax.eval_shape(
        lambda: g_model.init(
            jax.random.PRNGKey(0),
            concrete(noise),
            concrete(sent),
            concrete(words),
            concrete(mask),
        )["params"]
    )
    exported = jax_export.export(sample, platforms=list(platforms))(
        params, noise, sent, words, mask
    )
    return exported, params


def save_sampler(path: str, exported) -> str:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_sampler(path: str):
    """Deserialize an artifact into ``fn(g_params, noise, sent, words=None,
    mask=None) -> images`` (callable under jit or eagerly; no model code
    needed)."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    def call(g_params, noise, sent, words=None, mask=None):
        return exported.call(g_params, noise, sent, words, mask)

    return call
