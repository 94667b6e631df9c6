"""uint8-through-the-wire input path: device-side normalization semantics.

The loader ships uint8 NHWC (4x less host->device traffic than float32 — the
measured wall-clock bottleneck of the full trainer loop); the reference's
host-side ``ToTensor + Normalize(.5,.5)`` (``dataset.py:32-37``) moves into
the jitted step via ``ops.images.to_unit_range``.  These tests pin (a) the
normalization formula bit-for-bit against the retired host version, and (b)
that a full train step on a uint8 batch is identical to the step on the
pre-normalized float32 batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from xmc_gan_tpu.ops.images import to_unit_range

from test_train_step import synthetic_batch, tiny_cfg


def test_to_unit_range_matches_host_formula():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    got = np.asarray(to_unit_range(jnp.asarray(u8)))
    # exact op-order parity with the retired host path (pipeline
    # _to_unit_range): /255 then *2 then -1, all in float32
    want = (u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32
    assert got.min() == -1.0 and got.max() == 1.0


def test_to_unit_range_float_passthrough_and_dtype_cast():
    f = jnp.asarray([[-1.0, 0.25, 1.0]], jnp.float32)
    out = to_unit_range(f)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(f))  # unchanged

    # uint8 -> bf16: normalize in f32 FIRST, cast after (matching what
    # .astype(bf16) did to host-normalized f32 batches)
    u8 = jnp.asarray([[0, 128, 255]], jnp.uint8)
    got = to_unit_range(u8, jnp.bfloat16)
    want = ((np.array([0, 128, 255], np.float32) / 255.0) * 2.0 - 1.0).astype(
        jnp.bfloat16
    )
    np.testing.assert_array_equal(np.asarray(got), want[None])
    assert got.dtype == jnp.bfloat16


def test_train_step_uint8_equals_prenormalized_float():
    from xmc_gan_tpu.train import create_train_state, make_train_step

    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # jit: eager CPU dispatch of the full step is ~4 min; the two compiled
    # programs (uint8 vs f32 batch) land in the persistent cache instead
    step_fn = jax.jit(make_train_step(cfg))

    batch = synthetic_batch(cfg, bs=4)
    u8 = np.random.RandomState(3).randint(
        0, 256, batch["imgs"].shape, np.uint8
    )
    batch_u8 = dict(batch, imgs=jnp.asarray(u8))
    batch_f32 = dict(
        batch, imgs=jnp.asarray((u8.astype(np.float32) / 255.0) * 2.0 - 1.0)
    )

    s_u8, m_u8 = step_fn(state, batch_u8, jax.random.PRNGKey(1))
    s_f32, m_f32 = step_fn(state, batch_f32, jax.random.PRNGKey(1))
    # the two compiled programs fuse the input normalization differently, so
    # equality is f32-ulp-scale, not bitwise (measured: metrics 2e-7 rel,
    # params 3e-11 abs)
    for k in m_f32:
        np.testing.assert_allclose(
            float(m_u8[k]), float(m_f32[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    for a, b in zip(jax.tree.leaves(s_u8.g_params), jax.tree.leaves(s_f32.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)
