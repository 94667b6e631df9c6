"""Golden tests for the loss suite against an independent NumPy oracle.

The oracle below is a from-scratch NumPy statement of the loss *math* described
by the reference (``train_gan.py:72-139``), written directly from the formulas:
symmetric label-weighted InfoNCE over a cosine-similarity matrix, soft
pseudo-positive labels, hinge D losses, and the MAGP penalty checked against
finite differences.  Every config branch (``B_GLOBAL`` on/off, ``SMOOTH.GLOBAL``
zero/nonzero) is exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xmc_gan_tpu import losses


# ---------------------------------------------------------------- NumPy oracle
def np_normalize(x, axis=1, eps=1e-12):
    n = np.sqrt((x**2).sum(axis=axis, keepdims=True))
    return x / np.maximum(n, eps)


def np_cosine(a, b):
    return np_normalize(a) @ np_normalize(b).T


def np_log_softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    z = x - m
    return z - np.log(np.exp(z).sum(axis=axis, keepdims=True))


def np_make_labels(sent, b_global, smooth_global, p=0.6):
    bs = sent.shape[0]
    labels = np.eye(bs, dtype=np.float64)
    if b_global:
        sim = np_cosine(sent, sent)
        np.fill_diagonal(sim, 3.0)
        pos = (sim > p) & (sim < 3.0)
        num_pos = np.clip(pos.sum(1), 1, None) + 1
        if smooth_global != 0.0:
            w = smooth_global
        else:
            # torch broadcast: [bs] reciprocal * [bs, bs] mask -> column-indexed
            w = (1.0 / num_pos.astype(np.float64))[None, :]
        labels = np.clip(labels + w * pos, None, 1.0)
    return labels


def np_num_pos(labels, b_global, smooth_global):
    if not b_global:
        return 1.0
    if smooth_global == 0.0:
        return 2.0
    return (labels > 0).sum(1).astype(np.float64)


def np_info_nce(a, b, labels, b_global, smooth_global):
    num_pos = np_num_pos(labels, b_global, smooth_global)
    scores = np_cosine(a, b)
    s0 = np_log_softmax(scores, axis=0) * labels
    s0 = (-(s0.sum(0)) / num_pos).mean()
    s1 = np_log_softmax(scores, axis=1) * labels
    s1 = (-(s1.sum(1)) / num_pos).mean()
    return s0 + s1


CASES = [
    (False, 0.5),  # B_GLOBAL off (num_pos = 1)
    (True, 0.0),  # adaptive weight, num_pos = 2
    (True, 0.5),  # fixed weight, per-row num_pos
]


@pytest.mark.parametrize("b_global,smooth_global", CASES)
def test_make_labels_golden(b_global, smooth_global):
    rng = np.random.RandomState(0)
    sent = rng.randn(16, 256).astype(np.float32)
    # force some highly-similar pairs so global positives exist
    sent[3] = sent[7] + 0.01 * rng.randn(256).astype(np.float32)
    sent[10] = sent[2] + 0.01 * rng.randn(256).astype(np.float32)
    got = losses.make_labels(jnp.asarray(sent), b_global, smooth_global)
    want = np_make_labels(sent.astype(np.float64), b_global, smooth_global)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    if b_global:
        assert (np.asarray(got).sum() > 16.0), "expected off-diagonal soft positives"


def test_make_labels_matches_torch_broadcast():
    """Pin the adaptive-weight orientation to actual torch broadcast semantics.

    The reference computes ``global_weight * global_pos`` where global_weight is
    a [bs] tensor (``torch.reciprocal(num_pos.float())``, train_gan.py:79-81);
    torch broadcasts it across rows, i.e. labels[i, j] uses 1/num_pos[j].  This
    test evaluates that exact torch expression (no reference import needed) on a
    batch with an unequal-count positive chain so row/column indexing differ.
    """
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(11)
    sent = rng.randn(8, 32).astype(np.float32)
    # chain: 0~1, 1~2 similar, so num_pos differs across rows (0:2, 1:3, 2:2)
    sent[1] = sent[0] + 0.01 * rng.randn(32).astype(np.float32)
    sent[2] = sent[1] + 0.01 * rng.randn(32).astype(np.float32)

    t = torch.from_numpy(sent)
    tn = torch.nn.functional.normalize(t, p=2, dim=1)
    sim = tn @ tn.t()
    sim.fill_diagonal_(3)
    pos = (sim > 0.6) & (sim < 3)
    num_pos = (pos > 0).sum(1).clamp_(min=1) + 1
    want = (torch.eye(8) + torch.reciprocal(num_pos.float()) * pos).clamp_(max=1)

    got = losses.make_labels(jnp.asarray(sent), True, 0.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)
    # the chain must actually produce unequal counts, or this test proves nothing
    assert len(set(num_pos.tolist())) > 1


@pytest.mark.parametrize("b_global,smooth_global", CASES)
def test_sent_and_img_loss_golden(b_global, smooth_global):
    rng = np.random.RandomState(1)
    bs, d = 12, 64
    img = rng.randn(bs, d).astype(np.float32)
    txt = rng.randn(bs, d).astype(np.float32)
    sent = rng.randn(bs, 32).astype(np.float32)
    sent[4] = sent[9] + 0.01 * rng.randn(32).astype(np.float32)
    labels = np_make_labels(sent.astype(np.float64), b_global, smooth_global)
    want = np_info_nce(
        img.astype(np.float64), txt.astype(np.float64), labels, b_global, smooth_global
    )
    got_s = losses.sent_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(labels, jnp.float32),
        b_global, smooth_global,
    )
    got_i = losses.img_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(labels, jnp.float32),
        b_global, smooth_global,
    )
    np.testing.assert_allclose(float(got_s), want, rtol=2e-4)
    np.testing.assert_allclose(float(got_i), want, rtol=2e-4)  # same body


def test_hinge_and_g_losses():
    x = jnp.asarray([-2.0, 0.0, 0.5, 3.0])
    np.testing.assert_allclose(
        float(losses.hinge_real(x)), np.mean(np.maximum(0, 1 - np.asarray(x))), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.hinge_fake(x)), np.mean(np.maximum(0, 1 + np.asarray(x))), rtol=1e-6
    )
    np.testing.assert_allclose(float(losses.generator_loss(x)), -float(np.mean(np.asarray(x))))


def test_magp_matches_finite_difference():
    """MAGP value check: for an analytic D, 2*mean(||grad||^6) is known exactly."""
    w = jnp.asarray(np.random.RandomState(2).randn(8, 3).astype(np.float32))
    v = jnp.asarray(np.random.RandomState(3).randn(5).astype(np.float32))

    def d_scalar(imgs, sent):
        # "D" = sum_b ( <imgs_b, w> + <sent_b, v> ) with imgs [B,2,2,? -> flat 3]
        return (imgs.reshape(imgs.shape[0], -1) @ w.reshape(-1)[: imgs[0].size]).sum() + (
            sent @ v
        ).sum()

    imgs = jnp.asarray(np.random.RandomState(4).randn(4, 1, 1, 3).astype(np.float32))
    sent = jnp.asarray(np.random.RandomState(5).randn(4, 5).astype(np.float32))
    got = float(losses.magp_penalty(d_scalar, imgs, sent))
    # gradient of a linear function is constant: grad_img = w (first 3), grad_sent = v
    gnorm_sq = float((np.asarray(w).reshape(-1)[:3] ** 2).sum() + (np.asarray(v) ** 2).sum())
    want = 2.0 * gnorm_sq**3
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_magp_nonlinear_finite_difference():
    """MAGP against numerical differentiation of a nonlinear D."""

    def d_scalar(imgs, sent):
        h = jnp.tanh(imgs.reshape(imgs.shape[0], -1))
        return (h.sum(axis=1) * jnp.cos(sent).sum(axis=1)).sum()

    rng = np.random.RandomState(6)
    imgs = rng.randn(3, 2, 2, 1).astype(np.float64)
    sent = rng.randn(3, 4).astype(np.float64)

    eps = 1e-6

    def d_np(i, s):
        return (np.tanh(i.reshape(3, -1)).sum(1) * np.cos(s).sum(1)).sum()

    gi = np.zeros_like(imgs)
    for idx in np.ndindex(imgs.shape):
        d = np.zeros_like(imgs); d[idx] = eps
        gi[idx] = (d_np(imgs + d, sent) - d_np(imgs - d, sent)) / (2 * eps)
    gs = np.zeros_like(sent)
    for idx in np.ndindex(sent.shape):
        d = np.zeros_like(sent); d[idx] = eps
        gs[idx] = (d_np(imgs, sent + d) - d_np(imgs, sent - d)) / (2 * eps)
    norms = np.sqrt((gi.reshape(3, -1) ** 2).sum(1) + (gs**2).sum(1))
    want = 2.0 * (norms**6).mean()

    got = float(
        losses.magp_penalty(
            d_scalar, jnp.asarray(imgs, jnp.float32), jnp.asarray(sent, jnp.float32)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_losses_bf16_inputs_stay_finite():
    """bf16 activations must not overflow the fp32 loss path."""
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(8, 32) * 50, jnp.bfloat16)
    b = jnp.asarray(rng.randn(8, 32) * 50, jnp.bfloat16)
    labels = jnp.eye(8)
    out = losses.sent_loss(a, b, labels, False, 0.5)
    assert out.dtype == jnp.float32 and bool(jnp.isfinite(out))


def test_cosine_scores_dim_mismatch_clear_error():
    """SENT loss without a shared projection (no IMG_MATCH/SENT_MATCH) must
    fail at trace time with flag guidance, not a bare dot_general error (the
    reference crashes the same way, train_gan.py:90)."""
    import pytest

    with pytest.raises(ValueError, match="DISC.IMG_MATCH or DISC.SENT_MATCH"):
        losses.cosine_scores(jnp.zeros((4, 512)), jnp.zeros((4, 256)))
