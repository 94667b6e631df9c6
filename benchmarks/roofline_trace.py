"""Profiler-trace verification of the flagship roofline (VERDICT r2 #4).

Captures a ``jax.profiler`` trace over steady-state flagship steps (NCH=32,
bs128, bf16, full loss set) and aggregates the device-side event lanes from
the Perfetto trace.json.gz: per-lane busy time over the traced wall span.
On TPU the interesting lanes are the TensorCore op stream (MXU/VPU kernel
occupancy) vs the DMA/infeed streams — direct evidence for (or against) the
cost-analysis-derived claim that the step is HBM-bandwidth-dominated with
~69% sustained DMA and ~38% MXU.

Usage: python benchmarks/roofline_trace.py [STEPS] [OUTDIR] [NCH] [BS] [T_LEN] [T_DIM] [NOISE]
(defaults 5 /tmp/xmc_roofline_trace 32 128 20 256 100 — the flagship shape;
``96 32 200 768 128`` traces the LN deployment step's WORD-off remainder,
i.e. `benchmarks/ln_step.py` component 1 — NOISE=128 matches ln_step's
``cfg/ln_coco_256.yml`` NOISE_DIM so the two tools trace the same XLA
program.  The BASELINE.md 2026-08-20 LN trace predates the NOISE arg and ran
at noise 100; its device span (401 ms/step) matched ln_step's 405 ms because
the noise projection is a [BS, NOISE]x[NOISE, 8*NCH*16] matmul — sub-ms at
either width — but pass 128 for exact apples-to-apples.)
"""

from __future__ import annotations

import collections
import glob
import gzip
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


def run_traced_steps(n_steps: int, outdir: str, nch: int = 32, bs: int = 128,
                     t_len: int = 20, t_dim: int = 256,
                     noise_dim: int = 100) -> None:
    from xmc_gan_tpu.config import cfg_from_dict
    from xmc_gan_tpu.train import create_train_state, make_train_step

    cfg = cfg_from_dict({
        "TRAIN": {
            "NCH": nch, "NEF": 256, "NOISE_DIM": noise_dim, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 256},
        "TEXT": {"EMBEDDING_DIM": t_dim, "MAX_LENGTH": t_len},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    })
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16), donate_argnums=(0,))
    rng = np.random.RandomState(0)
    batch = {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (bs, 256, 256, 3)), jnp.float32),
        "sent_embs": jnp.asarray(rng.randn(bs, t_dim), jnp.float32),
        "words_embs": jnp.asarray(rng.randn(bs, t_len, t_dim), jnp.float32),
        "mask": jnp.asarray(rng.rand(bs, t_len) > 0.7),
    }
    key = jax.random.PRNGKey(1)
    for _ in range(3):  # compile + warm
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
    assert np.isfinite(float(m["Loss_D"]))

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, m = step(state, batch, k)
        assert np.isfinite(float(m["Loss_D"]))  # completion barrier in-trace
    dt = (time.perf_counter() - t0) / n_steps
    print(f"traced {n_steps} steps, {dt * 1e3:.1f} ms/step (incl. barrier)",
          flush=True)


def analyze(outdir: str) -> None:
    paths = sorted(
        glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no trace.json.gz found under", outdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tid_names = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    lanes = collections.defaultdict(float)
    cats = collections.defaultdict(lambda: [0.0, 0])  # hlo_category -> [us, B]
    t_min, t_max = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid = pid_names.get(e["pid"], str(e["pid"]))
        if "TPU" not in pid and "device" not in pid.lower():
            continue  # host threads are not the roofline question
        tid = tid_names.get((e["pid"], e["tid"]), str(e["tid"]))
        lanes[f"{pid} :: {tid}"] += e["dur"]
        if tid == "XLA Ops":
            a = e.get("args", {})
            c = cats[a.get("hlo_category", "?")]
            c[0] += e["dur"]
            c[1] += int(a.get("bytes_accessed", 0))
            t_min = min(t_min, e["ts"])
            t_max = max(t_max, e["ts"] + e["dur"])
    span = max(t_max - t_min, 1e-9)
    print(f"device trace span: {span / 1e3:.1f} ms "
          f"(file: {os.path.relpath(paths[-1], outdir)})")
    for lane, busy in sorted(lanes.items(), key=lambda kv: -kv[1]):
        print(f"  {busy / 1e3:9.1f} ms  {busy / span * 100:5.1f}%  {lane}")
    # per-op bytes_accessed telemetry -> sustained HBM bandwidth per category
    tot_d = sum(v[0] for v in cats.values()) or 1e-9
    tot_b = sum(v[1] for v in cats.values())
    print(f"{'hlo_category':24s} {'time ms':>9s} {'%time':>6s} "
          f"{'GB':>8s} {'GB/s':>6s}")
    for cat, (d, b) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if d < tot_d * 0.005:
            continue
        print(f"{cat:24s} {d / 1e3:9.1f} {d / tot_d * 100:5.1f}% "
              f"{b / 1e9:8.2f} {b / 1e9 / (d / 1e6):6.0f}")
    print(f"{'TOTAL (sustained/span)':24s} {tot_d / 1e3:9.1f} {'':6s} "
          f"{tot_b / 1e9:8.2f} {tot_b / 1e9 / (span / 1e6):6.0f}")


def main() -> None:
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/xmc_roofline_trace"
    nch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    bs = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    t_len = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    t_dim = int(sys.argv[6]) if len(sys.argv) > 6 else 256
    noise_dim = int(sys.argv[7]) if len(sys.argv) > 7 else 100
    run_traced_steps(n_steps, outdir, nch, bs, t_len, t_dim, noise_dim)
    analyze(outdir)


if __name__ == "__main__":
    main()
