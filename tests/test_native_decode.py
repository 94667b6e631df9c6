"""Native C++ decode path: builds, matches the PIL reference pipeline within
resampling tolerance, honors crop/flip parameters, and survives bad input."""

import io

import numpy as np
import pytest

from xmc_gan_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decoder unavailable (no g++/libjpeg)"
)


def _jpeg_bytes(arr: np.ndarray, quality: int = 95) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_test_mode_matches_pil():
    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (90, 70, 3), np.uint8)
    data = _jpeg_bytes(arr)

    got = native.decode_test(data, 64)
    assert got is not None and got.shape == (64, 64, 3)
    assert got.dtype == np.uint8

    with Image.open(io.BytesIO(data)) as img:
        want = np.asarray(img.convert("RGB").resize((64, 64), Image.BILINEAR))
    # same decode (both libjpeg); resize filters agree to a few uint8 LSBs
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() < 5


def test_train_mode_crop_flip_semantics():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (100, 80, 3), np.uint8)
    data = _jpeg_bytes(arr, quality=100)

    a = native.decode_train(data, 64, 76, u_x=0.0, u_y=0.0, flip=False)
    b = native.decode_train(data, 64, 76, u_x=0.0, u_y=0.0, flip=True)
    assert a is not None and b is not None
    assert a.dtype == np.uint8
    np.testing.assert_array_equal(a, b[:, ::-1, :])  # flip = mirror

    c = native.decode_train(data, 64, 76, u_x=0.999, u_y=0.999, flip=False)
    assert np.abs(a.astype(np.int32) - c.astype(np.int32)).max() > 0

    # determinism
    a2 = native.decode_train(data, 64, 76, u_x=0.0, u_y=0.0, flip=False)
    np.testing.assert_array_equal(a, a2)

    # crop-fused resize: shifting the crop by exactly one resized column must
    # reproduce the overlapping columns bitwise (each output pixel's taps are
    # built on the full resize grid, independent of the crop window)
    # h=100,w=80 -> rw=76,rh=95, max_x=12: u_x in [1/13, 2/13) lands cx=1
    d = native.decode_train(data, 64, 76, u_x=1.5 / 13, u_y=0.0, flip=False)
    np.testing.assert_array_equal(a[:, 1:], d[:, :-1])


def test_dct_scaled_decode_matches_exact_path():
    """DCT-scaled decode (large source, small target) stays within a few
    uint8 LSBs of the exact full-resolution path: the denominator cap keeps
    >= 2x oversampling for the triangle filter, so the only difference is
    IDCT-scaling's own low-pass, which the subsequent >= 2x downscale hides."""
    rng = np.random.RandomState(3)
    # smooth-ish content (realistic for photos; pure noise would overstate
    # the difference because JPEG itself destroys noise at any quality)
    base = rng.randint(0, 255, (40, 30, 3), np.uint8)
    from PIL import Image

    big = np.asarray(
        Image.fromarray(base).resize((480, 640), Image.BILINEAR)
    )  # 640x480: typical COCO size; short side 480 >= 4*76 -> scaling engages
    data = _jpeg_bytes(big, quality=90)

    exact = native.decode_train(data, 64, 76, 0.25, 0.25, False, fast=False)
    fast = native.decode_train(data, 64, 76, 0.25, 0.25, False, fast=True)
    assert exact is not None and fast is not None
    diff = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    assert diff.max() <= 6 and diff.mean() < 1.0

    et = native.decode_test(data, 64, fast=False)
    ft = native.decode_test(data, 64, fast=True)
    dt = np.abs(et.astype(np.int32) - ft.astype(np.int32))
    assert dt.max() <= 6 and dt.mean() < 1.0

    # below the 4x threshold the scaled path IS the exact path (bitwise)
    small = _jpeg_bytes(big[:200, :150], quality=90)  # short side 150 < 4*76
    np.testing.assert_array_equal(
        native.decode_train(small, 64, 76, 0.5, 0.5, False, fast=True),
        native.decode_train(small, 64, 76, 0.5, 0.5, False, fast=False),
    )


def test_pil_fallback_draft_matches_exact(tmp_path, monkeypatch):
    """The PIL fallback mirrors the native DCT-scaled decode via
    Image.draft() with the same >= 2x oversampling request, staying within a
    few LSBs of the exact PIL decode; XMC_DCT_SCALE=0 disables it there too."""
    from PIL import Image

    from xmc_gan_tpu.data import pipeline

    rng = np.random.RandomState(4)
    base = rng.randint(0, 255, (40, 30, 3), np.uint8)
    big = np.asarray(Image.fromarray(base).resize((640, 480), Image.BILINEAR))
    p = tmp_path / "big.jpg"
    Image.fromarray(big).save(p, quality=90)

    monkeypatch.setattr(native, "available", lambda: False)  # force PIL path
    monkeypatch.setenv("XMC_DCT_SCALE", "0")
    exact = pipeline.load_image(str(p), 64, "test")
    g_e = np.random.default_rng(3)
    exact_tr = pipeline.load_image(str(p), 64, "train", g_e)
    monkeypatch.setenv("XMC_DCT_SCALE", "1")
    fast = pipeline.load_image(str(p), 64, "test")
    g_f = np.random.default_rng(3)
    fast_tr = pipeline.load_image(str(p), 64, "train", g_f)

    d = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    assert d.max() <= 6 and d.mean() < 1.0
    dt = np.abs(exact_tr.astype(np.int32) - fast_tr.astype(np.int32))
    assert dt.max() <= 6 and dt.mean() < 1.0


def test_corrupt_jpeg_returns_none():
    assert native.decode_test(b"not a jpeg at all", 64) is None
    assert native.decode_train(b"\xff\xd8\xff\xe0garbage", 64, 76, 0.5, 0.5, 0) is None


def test_pipeline_uses_native_and_stays_deterministic(tmp_path):
    from PIL import Image

    from xmc_gan_tpu.data.pipeline import load_image

    rng = np.random.RandomState(2)
    arr = rng.randint(0, 255, (120, 90, 3), np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)

    g1 = np.random.default_rng(7)
    g2 = np.random.default_rng(7)
    a = load_image(str(p), 64, "train", g1)
    b = load_image(str(p), 64, "train", g2)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8

    t = load_image(str(p), 64, "test")
    assert t.shape == (64, 64, 3)
