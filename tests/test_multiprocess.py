"""Multi-process distributed test (SURVEY.md §4 "multi-process tests via
jax.distributed on localhost"): two JAX processes, each with 2 simulated CPU
devices, form one 4-device data mesh; the global-batch contrastive loss and a
full train-step metric must equal the single-process 4-device result.

This exercises the actual multi-controller path (coordinator service,
cross-process device addressing) that the in-process 8-device tests cannot."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

from xmc_gan_tpu import losses
from xmc_gan_tpu.parallel import make_mesh

assert jax.device_count() == 4 and jax.local_device_count() == 2

mesh = make_mesh(dp=4, tp=1)
rng = np.random.RandomState(0)
B, D = 16, 8
img = rng.randn(B, D).astype(np.float32)
txt = rng.randn(B, D).astype(np.float32)

spec = NamedSharding(mesh, P("data", None))
img_g = multihost_utils.host_local_array_to_global_array(
    img[jax.process_index() * 8 : jax.process_index() * 8 + 8], mesh, P("data", None)
)
txt_g = multihost_utils.host_local_array_to_global_array(
    txt[jax.process_index() * 8 : jax.process_index() * 8 + 8], mesh, P("data", None)
)

@jax.jit
def loss_fn(i, t):
    labels = losses.make_labels(t, False, 0.5)
    return losses.sent_loss(i, t, labels, False, 0.5)

val = float(loss_fn(img_g, txt_g))
want = float(loss_fn(jnp.asarray(img), jnp.asarray(txt)))
assert abs(val - want) < 1e-5, (val, want)

# the shard_map row-block word loss across the process boundary AT THE LN
# DEPLOYMENT GEOMETRY (T=200 captions, forced onto the multi-block streaming
# path): regions stay on each process's devices, words all_gather over a
# data axis that spans both processes (the DCN path of the LN deployment).
# Loss AND input gradient must match the single-process blockwise oracle.
from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

R, T = 64, 200
regions = rng.randn(B, R, D).astype(np.float32)
words = rng.randn(B, T, D).astype(np.float32)
mask = rng.rand(B, T) > 0.7
mask[:, 0] = False
sl = slice(jax.process_index() * 8, jax.process_index() * 8 + 8)
r_g = multihost_utils.host_local_array_to_global_array(
    regions[sl], mesh, P("data", None, None))
w_g = multihost_utils.host_local_array_to_global_array(
    words[sl], mesh, P("data", None, None))
m_g = multihost_utils.host_local_array_to_global_array(
    mask[sl], mesh, P("data", None))
# block_elems 1<<14 -> per-row-block score buffers of B*R*T=16*64*200 elems
# stream in >=13 blocks: genuinely exercises the lax.scan streaming path
sharded_scores = make_sharded_word_scores(mesh, block_elems=1 << 14)

def wloss(r, w, m, t):
    labels = losses.make_labels(t, False, 0.5)
    return losses.word_loss_from_scores(
        sharded_scores(r, w, m), labels, False, 0.5)

wv, wg = jax.jit(jax.value_and_grad(wloss))(r_g, w_g, m_g, txt_g)
wv, wgn = float(wv), float(jnp.vdot(wg, wg))

def wref(r):
    return losses.word_loss(
        r, jnp.asarray(words), jnp.asarray(mask),
        losses.make_labels(jnp.asarray(txt), False, 0.5), False, 0.5,
        block_elems=1 << 14)

wwant, wgref = jax.jit(jax.value_and_grad(wref))(jnp.asarray(regions))
wwant, wgrefn = float(wwant), float(jnp.vdot(wgref, wgref))
assert abs(wv - wwant) < 1e-5, (wv, wwant)
assert abs(wgn - wgrefn) < 1e-5 * max(1.0, abs(wgrefn)), (wgn, wgrefn)
# elementwise on the locally-addressable gradient shards: a shard-offset bug
# that permutes per-row gradient blocks across the process boundary would
# preserve the total norm exactly, so the norm check alone cannot catch it —
# each shard must match the oracle's slice at the SAME global rows
wgref_np = np.asarray(wgref)
for shard in wg.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), wgref_np[shard.index], rtol=3e-5, atol=1e-6)

print(f"proc {jax.process_index()} loss {val:.6f} word {wv:.6f} ok", flush=True)
"""


TRAINER_WORKER = r"""
import os, sys, tempfile
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import numpy as np
from jax.experimental import multihost_utils

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.parallel import make_mesh
from xmc_gan_tpu.trainer import Trainer

assert jax.device_count() == 4 and jax.local_device_count() == 2

# On this 1-vCPU container the two processes can skew tens of seconds apart
# (imports/compiles are serialized); jax.device_put's cross-process
# consistency check uses a 30s Gloo timeout, so re-align right before the
# Trainer builds its sharded state.
multihost_utils.sync_global_devices("pre_trainer_init")

# Minimal model: this test pins cross-process SEQUENCING (window
# boundaries, grid dispatches, scan across hosts) — loss/SN/MAGP numerics
# under the mesh are covered by the in-process 8-device tests.  Every
# distinct multihost program's first dispatch must form a Gloo context
# within a fixed 30s timeout, and compile skew between the serialized
# processes counts against it, so compiles must stay well under that.
cfg = cfg_from_dict({
    "CONFIG_NAME": "MP_K",
    "TRAIN": {
        "NCH": 4, "NEF": 16, "NOISE_DIM": 8, "HE_INIT": True,
        "RMIS_LOSS": True, "MAGP": False, "N_CRITIC": 1, "BATCH_SIZE": 8,
        "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
        "SMOOTH": {"GLOBAL": 0.0},
        # LOG_INTERVAL stays at the default 1: grid saves are rank-0-local
        # and must NOT affect the cross-process dispatch sequence
    },
    "IMG": {"SIZE": 64},
    "TEXT": {"EMBEDDING_DIM": 16, "MAX_LENGTH": 4, "VOCA_SIZE": 50,
             "ENCODER_NAME": "RNN", "TYPE": "WORD"},
    "DISC": {"SPEC_NORM": False, "IMG_MATCH": True},
})
mesh = make_mesh(dp=4, tp=1)
# watch=True: _log_watch's fetch is a COLLECTIVE (process_allgather of the
# cross-process-replicated params) that every rank must join — this pins the
# regression where a rank-0-only watch gate left rank 0 alone in the
# collective and deadlocked the run at epoch end.  log_type stays "none"
# (writes are no-ops; the fetch still runs) so no TB import skews the ranks
# ahead of the collective's 30s Gloo window.
tr = Trainer(
    cfg, seed=23, output_root=tempfile.mkdtemp(), log_type="none",
    synthetic=True, synthetic_len=32, save_after=50, num_threads=1,
    mesh=mesh, eval_fid=False, steps_per_dispatch=2, watch=True,
)
metrics = tr.fit(max_epochs=1)  # 4 global steps = 2 scan windows
assert tr._multi_step_calls == 2, tr._multi_step_calls
assert all(np.isfinite(v) for v in metrics.values()), metrics
print(f"proc {jax.process_index()} Loss_D {metrics['Loss_D']:.6f} ok", flush=True)
"""


PREEMPT_WORKER = r"""
import os, signal, sys, tempfile
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ["CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import numpy as np
from jax.experimental import multihost_utils

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.parallel import make_mesh
from xmc_gan_tpu.trainer import Trainer

multihost_utils.sync_global_devices("pre_trainer_init")

# Same minimal geometry as MP_K: 4 steps/epoch, K=2 windows at steps 2 and 4.
cfg = cfg_from_dict({
    "CONFIG_NAME": "MP_PRE",
    "TRAIN": {
        "NCH": 4, "NEF": 16, "NOISE_DIM": 8, "HE_INIT": True,
        "RMIS_LOSS": True, "MAGP": False, "N_CRITIC": 1, "BATCH_SIZE": 8,
        "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
        "SMOOTH": {"GLOBAL": 0.0},
    },
    "IMG": {"SIZE": 64},
    "TEXT": {"EMBEDDING_DIM": 16, "MAX_LENGTH": 4, "VOCA_SIZE": 50,
             "ENCODER_NAME": "RNN", "TYPE": "WORD"},
    "DISC": {"SPEC_NORM": False, "IMG_MATCH": True},
})
mesh = make_mesh(dp=4, tp=1)
out_root = os.environ["OUT_ROOT"]  # shared: both processes' managers see it
tr = Trainer(
    cfg, seed=23, output_root=out_root, log_type="none",
    synthetic=True, synthetic_len=32, save_after=50, num_threads=1,
    mesh=mesh, eval_fid=False, steps_per_dispatch=2, save_every_steps=1000,
)
assert tr.ckpt_on_preempt, "multi-host preemption must be enabled"

# SIGTERM lands on process 1 ONLY, between window boundaries: delivered while
# prepping global step 3 (the flag is host-local until the step-4 boundary's
# collective poll propagates it to process 0).
orig_prep = tr._prep_batch
def prep(batch):
    if jax.process_index() == 1 and tr.global_step == 2:
        os.kill(os.getpid(), signal.SIGTERM)
    return orig_prep(batch)
tr._prep_batch = prep

tr.fit(max_epochs=2)  # 8 steps uninterrupted; preemption must stop at 4
assert tr._preempted == (jax.process_index() == 1), tr._preempted
assert tr.global_step == 4, tr.global_step
assert tr.auto_ckpt.latest_epoch() == 4, tr.auto_ckpt.latest_epoch()

# both hosts resume the collective save losslessly
tr2 = Trainer(
    cfg, seed=23, output_root=out_root, log_type="none",
    synthetic=True, synthetic_len=32, save_after=50, num_threads=1,
    mesh=mesh, eval_fid=False, steps_per_dispatch=2, save_every_steps=1000,
)
step = tr2.resume_latest_auto()
assert step == 4, step
print(f"proc {jax.process_index()} preempt ok step {step}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("XMC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
@pytest.mark.slow
def test_two_process_preemption(tmp_path):
    """SIGTERM on ONE host of a two-process run: the host-local flag is
    all-reduced at the next dispatch-window boundary, BOTH hosts save the
    same step-4 auto checkpoint collectively and exit cleanly (the
    single-host-only caveat this replaces would deadlock or lose the run)."""
    script = tmp_path / "preempt_worker.py"
    script.write_text(PREEMPT_WORKER)

    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["COORD"] = f"localhost:{port}"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["OUT_ROOT"] = str(tmp_path / f"out{attempt}")
        env["CACHE_DIR"] = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["PYTHONPATH"] = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir)
        )

        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
        gloo_flake = any(
            "Gloo context initialization failed" in out
            and "DEADLINE_EXCEEDED" in out
            for out in outs
        )
        if not (gloo_flake and attempt < 2):
            for i, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    for out in outs:
        assert "preempt ok step 4" in out


@pytest.mark.skipif(os.environ.get("XMC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
@pytest.mark.slow
def test_two_process_trainer_with_dispatch_window(tmp_path):
    """The full Trainer across 2 real processes with steps_per_dispatch=2:
    window boundaries must be rank-independent (rank-0 grid saves run every
    step at LOG_INTERVAL=1) or the processes issue mismatched collective
    programs and deadlock — the exact failure mode of chopping windows on
    rank-local events.

    Flake guard: the first dispatch of every distinct multihost program
    must form a Gloo context within a fixed 30s key-value timeout, and this
    1-vCPU container serializes the two processes' compiles — a pure
    environment timeout (DEADLINE_EXCEEDED in Gloo context init) is retried
    twice.  Real sequencing bugs fail deterministically on every attempt."""
    script = tmp_path / "trainer_worker.py"
    script.write_text(TRAINER_WORKER)

    for attempt in range(3):
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env["COORD"] = f"localhost:{port}"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["CACHE_DIR"] = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["PYTHONPATH"] = os.path.abspath(
            os.path.join(os.path.dirname(__file__), os.pardir)
        )

        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            break
        gloo_flake = any(
            "Gloo context initialization failed" in out
            and "DEADLINE_EXCEEDED" in out
            for out in outs
        )
        if not (gloo_flake and attempt < 2):
            for i, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    for out in outs:
        assert "ok" in out
    # replicated metrics agree across processes
    v0 = [l for l in outs[0].splitlines() if "Loss_D" in l][-1].split()[3]
    v1 = [l for l in outs[1].splitlines() if "Loss_D" in l][-1].split()[3]
    assert v0 == v1


@pytest.mark.skipif(os.environ.get("XMC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
@pytest.mark.slow  # spawns 2 fresh JAX processes (cold imports + compiles)
def test_two_process_global_contrastive_loss(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["COORD"] = f"localhost:{port}"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir)
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "ok" in out
    # both processes computed the identical replicated global loss
    v0 = [l for l in outs[0].splitlines() if "loss" in l][-1].split()[3]
    v1 = [l for l in outs[1].splitlines() if "loss" in l][-1].split()[3]
    assert v0 == v1
