"""End-to-end Trainer throughput on the real chip (synthetic data).

Unlike ``bench.py`` — which times the jitted step in isolation with
pre-staged device buffers — this measures the *whole* trainer loop:
loader iteration, text-encode, H2D transfer, step dispatch, and metric
logging.  The gap between the two numbers is the host-side pipeline
overhead the trainer's dispatch pipelining is meant to hide.

Usage: python benchmarks/trainer_throughput.py [imsize] [bs] [steps] [K]
(K = steps_per_dispatch, default 1.)  Prints one JSON line with wall-clock
images/sec over the timed window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    imsize = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    k_disp = int(sys.argv[4]) if len(sys.argv) > 4 else 1
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
        "TEXT": {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20, "TYPE": "SENT",
                 "ENCODER_NAME": "SBERT"},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })

    with tempfile.TemporaryDirectory() as root:
        tr = Trainer(
            cfg, seed=0, output_root=root, log_type="none", synthetic=True,
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
    print(json.dumps({
        "metric": f"trainer_wall_images_per_sec_{imsize}px_bs{bs}_k{k_disp}",
        "value": round(ips, 2),
        "unit": "images/sec",
        "steps": steps,
        "wall_s": round(dt, 3),
        "scan_windows": windows,
    }))


if __name__ == "__main__":
    main()
