"""One-config training-step measurement on the live accelerator.

Usage: python benchmarks/step_sweep.py NCH BATCH [dtype] [steps] [imsize]
Prints one JSON line: step time, images/sec/chip, XLA cost-analysis FLOPs and
bytes accessed (the roofline inputs for BASELINE.md).  Run one config per
process so an OOM kills only that probe.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.train import create_train_state, make_train_step


def main() -> None:
    nch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        sys.argv[3] if len(sys.argv) > 3 else "bf16"
    ]
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    imsize = int(sys.argv[5]) if len(sys.argv) > 5 else 256

    cfg = cfg_from_dict({
        "CONFIG_NAME": f"SWEEP_{nch}_{bs}_{imsize}",
        "TRAIN": {
            "NCH": nch, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": imsize},
        "TEXT": {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, dtype=dtype), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, imsize, imsize, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, 256), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, 20, 256), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, 20) > 0.7),
    }

    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", float("nan"))
    bytes_acc = cost.get("bytes accessed", float("nan"))

    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    assert np.isfinite(float(metrics["Loss_D"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    assert np.isfinite(float(metrics["Loss_G"]))  # completion barrier
    dt = (time.perf_counter() - t0) / n_steps

    print(json.dumps({
        "nch": nch, "bs": bs, "imsize": imsize, "dtype": str(dtype.__name__),
        "step_ms": round(dt * 1e3, 1),
        "img_per_s": round(bs / dt, 1),
        "tflops_per_step": round(flops / 1e12, 2),
        "gb_accessed_per_step": round(bytes_acc / 1e9, 1),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "achieved_gbps": round(bytes_acc / dt / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
