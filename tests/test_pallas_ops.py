"""Pallas kernel correctness in interpreter mode (CPU) against jnp references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu


def test_modulate_lrelu_pallas_matches_xla():
    from xmc_gan_tpu.ops.fused import modulate_lrelu
    from xmc_gan_tpu.ops.pallas.fused_affine import modulate_lrelu_pallas

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    g = jnp.asarray(rng.randn(2, 32), jnp.float32)
    b = jnp.asarray(rng.randn(2, 32), jnp.float32)
    want = modulate_lrelu(x, g, b)
    with pltpu.force_tpu_interpret_mode():
        got = modulate_lrelu_pallas(x, g, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_double_modulate_lrelu_pallas_matches_xla():
    from xmc_gan_tpu.ops.fused import double_modulate_lrelu
    from xmc_gan_tpu.ops.pallas.fused_affine import double_modulate_lrelu_pallas

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 16), jnp.float32)
    mods = [jnp.asarray(rng.randn(2, 16), jnp.float32) for _ in range(4)]
    want = double_modulate_lrelu(x, *mods)
    with pltpu.force_tpu_interpret_mode():
        got = double_modulate_lrelu_pallas(x, *mods)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n,t", [(64, 20), (300, 260)])
def test_masked_cross_attention_blockwise_matches_xla(n, t):
    """Online-softmax blockwise kernel == dense masked softmax, including a
    T > TILE_T case (multi-block streaming) and ragged N/T padding."""
    from xmc_gan_tpu.ops.pallas.cross_attention import masked_cross_attention

    rng = np.random.RandomState(2)
    B, D = 2, 32
    q = jnp.asarray(rng.randn(B, n, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, t, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, t, D), jnp.float32)
    mask = np.zeros((B, t), bool)
    mask[0, t // 2 :] = True
    mask[1, 3:] = True
    mask = jnp.asarray(mask)

    want = masked_cross_attention(q, k, v, mask, scale=0.7, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = masked_cross_attention(q, k, v, mask, scale=0.7, backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_masked_cross_attention_ignores_padded_words():
    from xmc_gan_tpu.ops.pallas.cross_attention import masked_cross_attention

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
    k = rng.randn(1, 10, 8).astype(np.float32)
    v = rng.randn(1, 10, 8).astype(np.float32)
    mask = np.zeros((1, 10), bool)
    mask[0, 6:] = True
    a = masked_cross_attention(q, jnp.asarray(k), jnp.asarray(v),
                               jnp.asarray(mask), backend="xla")
    k2, v2 = k.copy(), v.copy()
    k2[0, 6:] += 50
    v2[0, 6:] -= 50
    b = masked_cross_attention(q, jnp.asarray(k2), jnp.asarray(v2),
                               jnp.asarray(mask), backend="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
