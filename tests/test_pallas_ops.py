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


class TestDamsmScoreKernel:
    """Fused pairwise DAMSM-score kernel (ops/pallas/damsm_score.py):
    forward + both custom-VJP backward kernels vs the XLA streaming path,
    in interpreter mode (CPU-runnable)."""

    def _problem(self, B=3, R=5, T=11, D=9, seed=0):
        rng = np.random.RandomState(seed)
        regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
        words = jnp.asarray(rng.randn(B, T, D), jnp.float32)
        mask = np.zeros((B, T), bool)
        lens = (rng.randint(1, T + 1, size=B)).tolist()
        for i, L in enumerate(lens):
            mask[i, L:] = True
        return regions, words, jnp.asarray(mask)

    def test_forward_matches_xla_path(self):
        from xmc_gan_tpu.ops.pallas.damsm_score import damsm_scores
        from xmc_gan_tpu import losses

        regions, words, mask = self._problem()
        want = losses.word_region_scores(regions, words, mask, block_elems=None)
        got = damsm_scores(regions, words, mask, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )

    def test_forward_fully_padded_caption_matches(self):
        from xmc_gan_tpu.ops.pallas.damsm_score import damsm_scores
        from xmc_gan_tpu import losses

        regions, words, mask = self._problem(B=4, T=6)
        mask = mask.at[2].set(True)  # caption 2 entirely padding
        want = losses.word_region_scores(regions, words, mask, block_elems=None)
        got = damsm_scores(regions, words, mask, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )

    def test_custom_vjp_matches_xla_grads(self):
        from xmc_gan_tpu.ops.pallas.damsm_score import damsm_scores
        from xmc_gan_tpu import losses

        regions, words, mask = self._problem(B=4, R=7, T=9, D=12, seed=3)

        # non-uniform upstream cotangent exercises the per-pair g_ij wiring
        def lp(r, w):
            return jnp.sum(jnp.sin(damsm_scores(r, w, mask, interpret=True)))

        def lx(r, w):
            return jnp.sum(jnp.sin(
                losses.word_region_scores(r, w, mask, block_elems=None)
            ))

        gp = jax.grad(lp, argnums=(0, 1))(regions, words)
        gx = jax.grad(lx, argnums=(0, 1))(regions, words)
        np.testing.assert_allclose(
            np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-4, atol=1e-6
        )

    def test_word_loss_through_kernel_backend(self):
        from xmc_gan_tpu import losses

        regions, words, mask = self._problem(B=5, R=6, T=8, D=10, seed=5)
        labels = jnp.eye(5)

        def loss(backend):
            def f(r, w):
                return losses.word_loss(
                    r, w, mask, labels, False, 0.5,
                    backend=backend, interpret=True,
                )
            return f

        vx, gx = jax.value_and_grad(loss("xla"), argnums=(0, 1))(regions, words)
        vp, gp = jax.value_and_grad(loss("pallas"), argnums=(0, 1))(regions, words)
        np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
