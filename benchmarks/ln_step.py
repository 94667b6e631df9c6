"""Full train step at LN-COCO-style long-caption scale, on the live chip.

The per-chip slice of the LN deployment (`cfg/ln_coco_256.yml` under dp):
256x256 images, T=200-word captions, ENCODER_LOSS.WORD on — the word-region
loss crosses the blocking threshold, so on TPU it runs through the fused
Pallas DAMSM-score kernel (`ops/pallas/damsm_score.py`).

Usage: python benchmarks/ln_step.py [NCH] [BS] [D] (default 8 64 96 — tiny
trunk so the word-loss share is visible; NCH=96 bs32 matches the shipped
config's per-chip shard under dp=8).
"""

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
    nch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 96

    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": nch, "NEF": 256, "NOISE_DIM": 128, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "WORD": True,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0, "WORD": 1.0},
        },
        "IMG": {"SIZE": 256},
        "TEXT": {"EMBEDDING_DIM": d, "MAX_LENGTH": 200},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    print("backend:", jax.default_backend(), "nch", nch, "bs", bs, "D", d)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, 256, 256, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, d), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, 200, d), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, 200) > 0.7),
    }
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
    vals = {k2: float(v) for k2, v in m.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
    assert np.isfinite(float(m["Loss_D"]))  # completion barrier
    dt = (time.perf_counter() - t0) / n
    print(f"step: {dt * 1e3:.0f} ms  ({bs / dt:.1f} img/s/chip)  "
          f"ds_word={vals['ds_word']:.3f} gs_word={vals['gs_word']:.3f}")


if __name__ == "__main__":
    main()
