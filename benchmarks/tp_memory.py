"""TP memory feasibility for the paper config (VERDICT r2 #6).

Real multi-chip hardware is unavailable here, so the evidence that tensor
parallelism buys the ch=96 256 px configuration memory headroom is produced
ahead-of-time: the FULL train step is AOT-compiled over an 8-virtual-device
mesh as dp=8 (no TP) and dp=4 x tp=2, and ``compiled.memory_analysis()``
reports the per-device buffer footprint (arguments = params + opt state +
batch shard, temps = activations/workspace) for each layout.  Per-device HBM
is what bounds the v4/v5 deployment; the dp=4 x tp=2 layout shards every
large kernel (and its Adam moments) over ``model``, halving the parameter
footprint and the widest activations.

Numbers are XLA buffer-assignment sizes, not measured device HBM — the
layout *difference* between the two meshes is the evidence (same compiler,
same graph, same batch).

Usage: python benchmarks/tp_memory.py [BS ...] [--devices N]
           [--mesh dpAxtpB ...] [--remat both|on|off]
       (default: BS 64 128, 8 devices, meshes dp8x tp1 + dp4xtp2, no remat)

The v4-32 north-star row (BASELINE.json config #3: effective batch 256,
NCH=96, 256px on 32 chips):
    python benchmarks/tp_memory.py 256 --devices 32 \
        --mesh dp32xtp1 dp16xtp2 --remat both
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

parser = argparse.ArgumentParser()
parser.add_argument("sizes", nargs="*", type=int, default=None)
parser.add_argument("--devices", type=int, default=8)
parser.add_argument("--mesh", nargs="*", default=None,
                    help="mesh specs like dp16xtp2 (default: dp{N}xtp1 and "
                         "dp{N//2}xtp2)")
parser.add_argument("--remat", choices=["both", "on", "off"], default="off")
ARGS = parser.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={ARGS.devices}"
    ).strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.parallel import batch_shardings, make_mesh, state_shardings
from xmc_gan_tpu.train import create_train_state, make_train_step

GB = 1024 ** 3


def build(bs: int):
    return cfg_from_dict({
        "TRAIN": {
            "NCH": 96, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 256},
        "TEXT": {"EMBEDDING_DIM": 256, "MAX_LENGTH": 20},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })


def analyze(bs: int, dp: int, tp: int, remat: bool = False) -> dict:
    cfg = build(bs)
    mesh = make_mesh(dp=dp, tp=tp)
    state_shapes = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0))
    )
    batch_shapes = {
        "imgs": jax.ShapeDtypeStruct((bs, 256, 256, 3), jnp.float32),
        "sent_embs": jax.ShapeDtypeStruct((bs, 256), jnp.float32),
        "words_embs": jax.ShapeDtypeStruct((bs, 20, 256), jnp.float32),
        "mask": jax.ShapeDtypeStruct((bs, 20), jnp.bool_),
    }
    st_shard = state_shardings(mesh, state_shapes)
    b_shard = batch_shardings(mesh, batch_shapes)
    st_shapes_sh = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes, st_shard,
    )
    b_shapes_sh = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        batch_shapes, b_shard,
    )
    step = make_train_step(cfg, dtype=jnp.bfloat16, mesh=mesh, remat=remat)
    compiled = (
        jax.jit(step, in_shardings=(st_shard, b_shard, None))
        .lower(st_shapes_sh, b_shapes_sh, jax.ShapeDtypeStruct((2,), jnp.uint32))
        .compile()
    )
    ma = compiled.memory_analysis()
    if ma is None:
        return {"error": "memory_analysis unsupported on this backend"}
    return {
        "bs": bs, "mesh": f"dp{dp}xtp{tp}", "remat": remat,
        "args_gb": round(ma.argument_size_in_bytes / GB, 3),
        "temps_gb": round(ma.temp_size_in_bytes / GB, 3),
        "out_gb": round(ma.output_size_in_bytes / GB, 3),
        "alias_gb": round(ma.alias_size_in_bytes / GB, 3),
        "total_gb": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.output_size_in_bytes - ma.alias_size_in_bytes) / GB, 3),
    }


def main() -> None:
    import time

    sizes = ARGS.sizes or [64, 128]
    n = ARGS.devices
    if ARGS.mesh:
        meshes = []
        for spec in ARGS.mesh:
            dp_s, tp_s = spec.replace("dp", "").split("xtp")
            meshes.append((int(dp_s), int(tp_s)))
    else:
        meshes = [(n, 1), (n // 2, 2)]
    remats = {"both": (False, True), "on": (True,), "off": (False,)}[ARGS.remat]
    for bs in sizes:
        for dp, tp in meshes:
            for remat in remats:
                t0 = time.time()
                try:
                    info = analyze(bs, dp, tp, remat)
                except Exception as e:  # OOM-at-compile etc. is a result too
                    info = {"bs": bs, "mesh": f"dp{dp}xtp{tp}", "remat": remat,
                            "error": f"{type(e).__name__}: {e}"}
                info["compile_s"] = round(time.time() - t0, 1)
                print(info, flush=True)


if __name__ == "__main__":
    main()
