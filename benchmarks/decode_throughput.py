"""Host decode-path throughput: exact vs DCT-scaled native decode vs PIL.

The 64-square trainer is host-bound on small-host containers (BASELINE.md:
818 img/s wall at 64^2 on 1 vCPU), so the JPEG decode+resize path IS the
end-to-end ceiling there.  This measures single-thread decode_train
throughput on a synthetic COCO-sized (640x480) photo for each image size,
A/B-ing the DCT-scaled decode (libjpeg scale_denom, native/decode.cpp)
against the exact full-resolution path and the PIL fallback.

Usage: python benchmarks/decode_throughput.py [n_iters] [quality]
Prints one JSON line per (size, path) plus speedup summaries.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def make_jpeg(quality: int) -> bytes:
    from PIL import Image

    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (40, 30, 3), np.uint8)
    big = Image.fromarray(base).resize((640, 480), Image.BILINEAR)
    buf = io.BytesIO()
    big.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def time_it(fn, n: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def pil_train(data: bytes, size: int, short: int) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(data)) as img:
        img = img.convert("RGB")
        w, h = img.size
        s = short / min(w, h)
        img = img.resize((max(short, round(w * s)), max(short, round(h * s))),
                         Image.BILINEAR)
        return np.asarray(img)[:size, :size]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    quality = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    from xmc_gan_tpu.data import native

    assert native.available(), "native decoder unavailable"
    data = make_jpeg(quality)

    for size in (64, 128, 256):
        short = int(size * 76 / 64)
        rows = {}
        for label, fn in (
            ("exact", lambda: native.decode_train(data, size, short, 0.3, 0.3,
                                                  False, fast=False)),
            ("dct_scaled", lambda: native.decode_train(data, size, short, 0.3,
                                                       0.3, False, fast=True)),
            ("pil", lambda: pil_train(data, size, short)),
        ):
            dt = time_it(fn, n)
            rows[label] = dt
            print(json.dumps({
                "size": size, "path": label,
                "ms_per_img": round(dt * 1e3, 3),
                "img_per_s": round(1.0 / dt, 1),
            }))
        print(json.dumps({
            "size": size,
            "speedup_vs_exact": round(rows["exact"] / rows["dct_scaled"], 2),
            "speedup_vs_pil": round(rows["pil"] / rows["dct_scaled"], 2),
        }))


if __name__ == "__main__":
    main()
