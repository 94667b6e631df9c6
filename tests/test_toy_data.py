"""Toy procedural dataset (data/toy.py): rendering, captions, and the
analytic conditioning classifiers that benchmarks/toy_learn.py relies on for
the learning-dynamics evidence.  The classifiers must be exact on rendered
ground truth — otherwise a learning curve says nothing."""

import numpy as np

from xmc_gan_tpu.data import toy


def test_render_and_classifiers_roundtrip():
    rng = np.random.RandomState(0)
    attrs = toy.sample_attrs(rng, 64)
    imgs = toy.render(attrs)
    assert imgs.shape == (64, 64, 64, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    # analytic classifiers recover the generating attributes exactly
    np.testing.assert_array_equal(toy.classify_color(imgs), attrs[:, 0])
    np.testing.assert_array_equal(toy.classify_position(imgs), attrs[:, 2])


def test_classifiers_robust_to_noise():
    """Mild pixel noise (a half-trained G's output is far from clean) must not
    break the classifiers."""
    rng = np.random.RandomState(1)
    attrs = toy.sample_attrs(rng, 64)
    imgs = toy.render(attrs) + rng.randn(64, 64, 64, 3).astype(np.float32) * 0.1
    assert (toy.classify_color(imgs) == attrs[:, 0]).mean() > 0.9
    assert (toy.classify_position(imgs) == attrs[:, 2]).mean() > 0.9


def test_captions_and_encoding():
    rng = np.random.RandomState(2)
    attrs = toy.sample_attrs(rng, 16)
    caps, lens = toy.make_captions(attrs, max_len=8)
    assert caps.shape == (16, 8) and (lens == 6).all()
    # same attributes -> same caption; different color -> different caption
    a2 = attrs.copy()
    caps2, _ = toy.make_captions(a2)
    np.testing.assert_array_equal(caps, caps2)
    a2[:, 0] = (a2[:, 0] + 1) % len(toy.COLORS)
    caps3, _ = toy.make_captions(a2)
    assert (caps3 != caps).any(axis=1).all()

    words, sent, mask = toy.encode_captions(caps, dim=32)
    assert words.shape == (16, 8, 32) and sent.shape == (16, 32)
    np.testing.assert_array_equal(mask, caps == 0)
    # deterministic across calls (frozen encoder)
    _, sent_b, _ = toy.encode_captions(caps, dim=32)
    np.testing.assert_array_equal(sent, sent_b)
    # distinct captions -> distinct sentence embeddings
    _, sent_c, _ = toy.encode_captions(caps3, dim=32)
    assert np.abs(sent - sent_c).max() > 1e-3
