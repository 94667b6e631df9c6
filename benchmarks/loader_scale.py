"""Loader scale probe for LN-OpenImages (~507k captions; VERDICT r2 #8).

The loader (``data/pipeline.py``) holds all filenames + tokenized captions in
host memory and shards contiguously across processes; this probe shows that
design surviving LN-OpenImages scale: it synthesizes a ~500k-caption
``captions.pickle`` + ``filenames.pickle`` (keys cycle over a small pool of
real JPEG files so decode cost is the true per-image cost), then measures

* metadata resident-set cost of constructing the dataset (the all-in-memory
  part that grows with corpus size), and
* steady-state DataLoader throughput (decode + augment + collate, threaded),

which bounds the host-side input rate available to feed a chip.  Per-epoch
index shuffling is O(N) ints; at 500k that is ~4 MB — the design's memory
is dominated by the caption list itself (~60 B/caption of Python/numpy
overhead at T~15).

Usage: python benchmarks/loader_scale.py [N_CAPTIONS] [BATCHES] [THREADS]
       (default 500000 50 8)
"""

from __future__ import annotations

import gc
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def rss_mb() -> float:
    """Current (not peak) resident set, so deltas across phases are real."""
    gc.collect()
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 2 ** 20


def build_corpus(root: str, n: int, pool: int = 64) -> None:
    from PIL import Image

    os.makedirs(f"{root}/images", exist_ok=True)
    os.makedirs(f"{root}/train", exist_ok=True)
    os.makedirs(f"{root}/test", exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(pool):
        arr = rng.randint(0, 255, (321, 481, 3), np.uint8)  # COCO-ish size
        Image.fromarray(arr).save(f"{root}/images/img{i:03d}.jpg", quality=90)
    # 500k filename entries cycling over the pool; 1 caption per image (the
    # LN convention, CAPTIONS_PER_IMAGE=1)
    filenames = [f"img{i % pool:03d}" for i in range(n)]
    with open(f"{root}/train/filenames.pickle", "wb") as f:
        pickle.dump(filenames, f)
    with open(f"{root}/test/filenames.pickle", "wb") as f:
        pickle.dump(filenames[:1000], f)
    vocab = 27297
    caps = [
        rng.randint(1, vocab, rng.randint(8, 200)).astype(np.int64)
        for _ in range(n)
    ]
    i2w = {i: f"w{i}" for i in range(200)}  # token text is never materialized
    w2i = {v: k for k, v in i2w.items()}
    with open(f"{root}/captions.pickle", "wb") as f:
        pickle.dump((caps, caps[:1000], i2w, w2i), f)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from xmc_gan_tpu.config import cfg_from_dict
    from xmc_gan_tpu.data import DataLoader
    from xmc_gan_tpu.data.pipeline import WordTextDataset

    cfg = cfg_from_dict({
        "IMG": {"SIZE": 256},
        "TEXT": {"CAPTIONS_PER_IMAGE": 1, "MAX_LENGTH": 200, "TYPE": "WORD"},
    })

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        build_corpus(root, n)
        print(f"corpus build ({n} captions): {time.perf_counter() - t0:.1f}s",
              flush=True)

        r0 = rss_mb()
        t0 = time.perf_counter()
        ds = WordTextDataset(root, "train", cfg)
        t_load = time.perf_counter() - t0
        r1 = rss_mb()
        print(f"dataset construct: {t_load:.1f}s, metadata RSS +{r1 - r0:.0f} MB "
              f"({(r1 - r0) * 1024 / n:.1f} KB/caption), len={len(ds)}", flush=True)

        bs = 32
        loader = DataLoader(ds, bs, shuffle=True, drop_last=True, seed=0,
                            num_threads=threads)
        it = iter(loader)
        next(it)  # warm the thread pool
        t0 = time.perf_counter()
        for i, b in enumerate(it):
            if i + 1 >= batches:
                break
        dt = time.perf_counter() - t0
        print(f"loader throughput: {batches * bs / dt:.1f} img/s "
              f"({threads} threads, bs={bs}, 256 px), RSS {rss_mb():.0f} MB",
              flush=True)


if __name__ == "__main__":
    main()
