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

# the shard_map row-block word loss across the process boundary: regions
# stay on each process's devices, words all_gather over a data axis that
# spans both processes (the DCN path of the LN deployment)
from xmc_gan_tpu.parallel.collectives import make_sharded_word_scores

R, T = 6, 5
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
sharded_scores = make_sharded_word_scores(mesh, block_elems=32)

@jax.jit
def wloss(r, w, m, t):
    labels = losses.make_labels(t, False, 0.5)
    return losses.word_loss_from_scores(
        sharded_scores(r, w, m), labels, False, 0.5)

wv = float(wloss(r_g, w_g, m_g, txt_g))
wwant = float(losses.word_loss(
    jnp.asarray(regions), jnp.asarray(words), jnp.asarray(mask),
    losses.make_labels(jnp.asarray(txt), False, 0.5), False, 0.5,
    block_elems=32))
assert abs(wv - wwant) < 1e-5, (wv, wwant)

print(f"proc {jax.process_index()} loss {val:.6f} word {wv:.6f} ok", flush=True)
"""


@pytest.mark.skipif(os.environ.get("XMC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
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
