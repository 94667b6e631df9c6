"""A/B the exact conv/pool folds: fused vs reference-ordered programs.

Measures the full train step at a given config with both restructures ON
(deferred-upsample fold in G: nearest-2x becomes a stride-2 transposed conv
in the next block; shortcut fold in D: the 1x1 conv runs after the avg-pool)
versus both OFF (the reference ordering).  The folds are exact math — this
measures only what XLA makes of the two program shapes on the chip.

Usage: python benchmarks/fold_ab.py [NCH] [BATCH] [dtype] [steps] [imsize] [gen]
  gen: DF_GEN (default) | CONCEPT_IN_DF_GEN | CONCEPT_OUT_DF_GEN
Prints one JSON line per variant plus a speedup summary.
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
from xmc_gan_tpu.registry import get_discriminator, get_generator
from xmc_gan_tpu.train import create_train_state, make_train_step


def measure(cfg, dtype, bs, imsize, n_steps, fused: bool) -> dict:
    g_cls = get_generator(cfg.GEN.ENCODER_NAME or "DF_GEN")
    d_cls = get_discriminator(cfg.DISC.ENCODER_NAME or "DF_DISC")
    g_kw = {"fuse_upsample": fused} if "fuse_upsample" in g_cls.__dataclass_fields__ else {}
    d_kw = {"fuse_downsample": fused} if "fuse_downsample" in d_cls.__dataclass_fields__ else {}
    g_model = g_cls(cfg, dtype=dtype, **g_kw)
    d_model = d_cls(cfg, dtype=dtype, **d_kw)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(
        make_train_step(cfg, g_model=g_model, d_model=d_model, dtype=dtype),
        donate_argnums=(0,),
    )

    rng = np.random.RandomState(0)
    t_dim = cfg.TEXT.EMBEDDING_DIM
    t_len = cfg.TEXT.MAX_LENGTH
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, imsize, imsize, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, t_dim), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, t_len, t_dim), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, t_len) > 0.7),
    }

    cost = step.lower(state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})

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
    return {
        "fused": fused,
        "step_ms": round(dt * 1e3, 1),
        "img_per_s": round(bs / dt, 1),
        "tflops_per_step": round(cost.get("flops", float("nan")) / 1e12, 2),
        "gb_accessed_per_step": round(
            cost.get("bytes accessed", float("nan")) / 1e9, 1
        ),
    }


def main() -> None:
    nch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        sys.argv[3] if len(sys.argv) > 3 else "bf16"
    ]
    n_steps = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    imsize = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    gen = sys.argv[6] if len(sys.argv) > 6 else "DF_GEN"

    cfg = cfg_from_dict({
        "CONFIG_NAME": f"FOLDAB_{gen}_{nch}_{bs}_{imsize}",
        "TRAIN": {
            "NCH": nch, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "GEN": {"ENCODER_NAME": gen},
        "IMG": {"SIZE": imsize},
        "TEXT": {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20},
        # match each family's deployed D: concept_out_df_gan.yml pairs
        # CONCEPT_OUT_DF_GEN with CONCEPT_NETD (the IN variants use DF_DISC),
        # so the D-side fold numbers reflect a pairing a repo cfg actually runs
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True,
                 **({"ENCODER_NAME": "CONCEPT_NETD"}
                    if gen == "CONCEPT_OUT_DF_GEN" else {})},
    })

    results = [measure(cfg, dtype, bs, imsize, n_steps, fused)
               for fused in (False, True)]
    for r in results:
        print(json.dumps({"gen": gen, "nch": nch, "bs": bs, "imsize": imsize, **r}))
    off, on = results
    print(json.dumps({
        "speedup": round(off["step_ms"] / on["step_ms"], 3),
        "img_per_s_delta": round(on["img_per_s"] - off["img_per_s"], 1),
    }))


if __name__ == "__main__":
    main()
