"""End-to-end Trainer throughput on the real chip.

Unlike ``bench.py`` — which times the jitted step in isolation with
pre-staged device buffers — this measures the *whole* trainer loop:
loader iteration, text-encode, H2D transfer, step dispatch, and metric
logging.  The gap between the two numbers is the host-side pipeline
overhead the trainer's dispatch pipelining is meant to hide.

Usage: python benchmarks/trainer_throughput.py [imsize] [bs] [steps] [K] [--real]
(K = steps_per_dispatch, default 1.)  Prints one JSON line with wall-clock
images/sec over the timed window.

``--real`` swaps the synthetic numpy batches for a generated on-disk
reference-format WORD dataset of COCO-sized (640x480, q90) JPEGs, so the
wall number includes the true host decode path (``native/decode.cpp``:
DCT-scaled decode + crop-fused resize; A/B the exact path with
``XMC_DCT_SCALE=0``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_real_dataset(root: str, n_examples: int, n_unique: int = 200) -> None:
    """Reference-format WORD dataset of COCO-sized JPEGs (names repeat past
    ``n_unique`` so disk stays bounded; decode cost is per-access either way)."""
    import pickle

    import numpy as np
    from PIL import Image

    os.makedirs(f"{root}/train")
    os.makedirs(f"{root}/test")
    os.makedirs(f"{root}/images")
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (40, 30, 3), np.uint8)
    uniq = [f"img_{i:04d}" for i in range(n_unique)]
    for i, name in enumerate(uniq):
        arr = np.asarray(
            Image.fromarray(np.roll(base, i, axis=0)).resize(
                (640, 480), Image.BILINEAR)
        )
        Image.fromarray(arr).save(f"{root}/images/{name}.jpg", quality=90)
    names = [uniq[i % n_unique] for i in range(n_examples)]
    for mode in ("train", "test"):
        with open(f"{root}/{mode}/filenames.pickle", "wb") as f:
            pickle.dump(names, f)
    i2w = {i: f"w{i}" for i in range(300)}
    caps = [rng.randint(1, 300, 12).tolist() for _ in range(n_examples * 5)]
    with open(f"{root}/captions.pickle", "wb") as f:
        pickle.dump((caps, caps, i2w, {v: k for k, v in i2w.items()}), f)


def main() -> None:
    real = "--real" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if a != "--real"]
    imsize = int(argv[0]) if len(argv) > 0 else 256
    bs = int(argv[1]) if len(argv) > 1 else 128
    steps = int(argv[2]) if len(argv) > 2 else 30
    k_disp = int(argv[3]) if len(argv) > 3 else 1
    # whole windows only, so the timed region never compiles the single-step
    # tail program (it would otherwise compile inside the measurement)
    steps = max(k_disp, steps // k_disp * k_disp)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmc_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import tempfile

    from xmc_gan_tpu.config import cfg_from_dict
    from xmc_gan_tpu.trainer import Trainer

    cfg = cfg_from_dict({
        "DATASET_NAME": "synthetic", "CONFIG_NAME": "TRAINER_TPUT",
        "TRAIN": {
            "NCH": 32, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "LOG_INTERVAL": 10_000,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": imsize},
        "TEXT": (
            {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20, "TYPE": "WORD",
             "ENCODER_NAME": "RNN", "VOCA_SIZE": 300,
             "CAPTIONS_PER_IMAGE": 5}
            if real else
            {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20, "TYPE": "SENT",
             "ENCODER_NAME": "SBERT"}
        ),
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })

    with tempfile.TemporaryDirectory() as root:
        data_dir = None
        if real:
            data_dir = f"{root}/ds"
            build_real_dataset(data_dir, bs * (steps + 12))
        tr = Trainer(
            cfg, seed=0, output_root=root, log_type="none",
            synthetic=not real, data_dir=data_dir,
            synthetic_len=bs * (steps + 12), num_threads=4, eval_fid=False,
            save_after=10**9, steps_per_dispatch=k_disp,
        )
        # the epoch-end fixed-noise grid (PNG + sampler compile) is trainer
        # bookkeeping, not loop throughput — keep it out of the timed region
        tr.sample_fixed_grid = lambda epoch: None
        # warmup epoch chunk: compile + first dispatches (>= one full window)
        tr.fit(max_epochs=1, max_steps=max(8, k_disp))
        t0 = time.perf_counter()
        tr.fit(max_epochs=1, max_steps=steps)
        dt = time.perf_counter() - t0
        windows = tr._multi_step_calls

    ips = steps * bs / dt
    tag = "_realjpeg" if real else ""
    print(json.dumps({
        "metric": f"trainer_wall_images_per_sec_{imsize}px_bs{bs}_k{k_disp}{tag}",
        "value": round(ips, 2),
        "unit": "images/sec",
        "steps": steps,
        "wall_s": round(dt, 3),
        "scan_windows": windows,
    }))


if __name__ == "__main__":
    main()
