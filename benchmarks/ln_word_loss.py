"""Memory-bounded word-region loss at the shipped LN-COCO shapes, on TPU.

Validates VERDICT/SURVEY's LN north-star point on the real chip: the blockwise
``losses.word_region_scores`` path (cfg/ln_coco_256.yml: BATCH_SIZE=256,
MAX_LENGTH=200, R=256 regions, SBERT D=768) fits on a 16 GB chip — the naive
[B, B, T, R] formulation is ~13 GB for one intermediate and cannot.

Run: ``python benchmarks/ln_word_loss.py [f32|bf16] [xla|pallas]``
(einsum operand dtype; backend default = auto, which picks the fused Pallas
kernel on TPU at blocking scale).  Measured 2026-08-16 on 1x TPU
v5 lite (axon tunnel): value+grad ≈ 0.94 s/steady call at full LN shape.
Timing note: under the tunnel, only host fetches force completion
(block_until_ready is a no-op) — hence the ``float(...)`` fetches.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmc_jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from xmc_gan_tpu import losses

B, R, T, D = 256, 256, 200, 768  # cfg/ln_coco_256.yml shapes


def main() -> None:
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.RandomState(0)
    regions = jnp.asarray(rng.randn(B, R, D), jnp.float32)
    words = jnp.asarray(rng.randn(B, T, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, T) > 0.5)
    labels = jnp.eye(B)

    cd = {"bf16": jnp.bfloat16, "f32": None}[
        sys.argv[1] if len(sys.argv) > 1 else "f32"
    ]
    backend = sys.argv[2] if len(sys.argv) > 2 else None  # xla | pallas | auto

    def f(r, w):
        return losses.word_loss(r, w, mask, labels, True, 0.0, compute_dtype=cd,
                                backend=backend)

    vg = jax.jit(jax.value_and_grad(f, argnums=(0, 1)))
    t0 = time.time()
    val, _ = vg(regions, words)
    v = float(val)  # host fetch forces completion under the axon tunnel
    print(f"compile+run: {time.time() - t0:.1f}s value={v:.4f}")
    for _ in range(3):
        t0 = time.time()
        val, (gr, gw) = vg(regions, words)
        v = float(val)
        finite = np.isfinite(float(jnp.sum(gr))) and np.isfinite(float(jnp.sum(gw)))
        print(f"steady: {time.time() - t0:.3f}s value={v:.4f} grads finite: {finite}")


if __name__ == "__main__":
    main()
