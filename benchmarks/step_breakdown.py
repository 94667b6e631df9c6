"""Step-time breakdown by feature ablation — the BASELINE.md "where does
the step go" table.  Usage: python benchmarks/step_breakdown.py [NCH] [BS]
(default 32 128, the flagship config).

Each row disables one loss family; the delta vs the full step attributes the
cost.  One process, sequential compiles (persistent cache makes reruns fast).
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

NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 128

VARIANTS = {
    "full": {},
    "no_magp": {"MAGP": False},
    "no_contrastive": {"ENCODER_LOSS": {"SENT": False, "DISC": False}},
    "adversarial_only": {
        "MAGP": False, "RMIS_LOSS": False,
        "ENCODER_LOSS": {"SENT": False, "DISC": False},
    },
}


def run(train_overrides: dict, n_steps: int = 15) -> dict:
    train = {
        "NCH": NCH, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
        "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": BS,
        "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
        "SMOOTH": {"GLOBAL": 0.0},
    }
    for k, v in train_overrides.items():
        if isinstance(v, dict):
            train[k] = {**train[k], **v}
        else:
            train[k] = v
    cfg = cfg_from_dict({
        "CONFIG_NAME": "BREAKDOWN",
        "TRAIN": train,
        "IMG": {"SIZE": 256},
        "TEXT": {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (BS, 256, 256, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(BS, 256), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(BS, 20, 256), jnp.float32),
        "mask": jnp.asarray(rng.rand(BS, 20) > 0.7),
    }
    lowered = step.lower(state, batch, jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    assert np.isfinite(float(metrics["Loss_D"]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    assert np.isfinite(float(metrics["Loss_D"]))  # completion barrier
    dt = (time.perf_counter() - t0) / n_steps
    return {
        "step_ms": round(dt * 1e3, 1),
        "tflops": round(cost.get("flops", float("nan")) / 1e12, 2),
        "gb": round(cost.get("bytes accessed", float("nan")) / 1e9, 1),
    }


def main() -> None:
    out = {}
    for name, ov in VARIANTS.items():
        out[name] = run(ov)
        print(json.dumps({name: out[name]}), flush=True)
    full = out["full"]["step_ms"]
    for name, r in out.items():
        r["share_of_full_pct"] = round(100 * (full - r["step_ms"]) / full, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
