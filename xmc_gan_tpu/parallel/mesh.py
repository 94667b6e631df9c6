"""Device mesh and sharding layout for data/tensor-parallel GAN training.

The reference is strictly single-process single-GPU (``train_gan.py:427``,
SURVEY.md §2.2); this module is the new first-class parallelism stack:

* ``make_mesh(dp, tp)`` — 2-axis ``Mesh(('data', 'model'))`` over ICI.
* **DP** — the batch is sharded over ``data``; the train step is written over
  the global batch, so XLA's GSPMD partitioner inserts the gradient ``psum``
  and the contrastive-negatives ``all_gather`` (the global-negative-pool
  semantics of XMC-GAN's effective-batch-256 config) automatically.
* **TP** — large kernels are sharded on their output-feature axis over
  ``model``; GSPMD inserts the activation collectives.  Worth enabling at the
  256PX/ch=96 scale; a no-op with ``tp=1``.
* **FSDP-style state sharding** — optimizer moments follow their parameters'
  shardings by construction (the rule is applied per-leaf by shape).
* **PP/SP/EP** — not used by this workload (models are ~tens of MB; captions
  are <=20 tokens; no MoE).  The mesh API accepts extra axes so a future
  pipeline/sequence axis slots in without restructuring; see SURVEY.md §2.2.

Collectives ride ICI within a slice; ``jax.distributed.initialize`` (driven by
the CLI) extends the same code path across hosts over DCN.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_shardings",
    "state_shardings",
    "shard_batch",
    "replicate",
]


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. ``dp`` defaults to ``n_devices // tp``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, ("data", "model"))


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Shard every batch array on its leading (batch) axis over ``data``."""

    def spec(x):
        return NamedSharding(mesh, P("data", *([None] * (np.ndim(x) - 1))))

    return jax.tree.map(spec, batch)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with per-array data sharding."""
    return jax.device_put(batch, batch_shardings(mesh, batch))


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully-replicated sharding tree."""
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def state_shardings(
    mesh: Mesh,
    state: Any,
    tp_min_size: int = 1 << 16,
) -> Any:
    """Sharding layout for a TrainState (or any pytree of arrays).

    Tensor-parallel rule: shard the trailing (output-feature) axis over
    ``model`` for any leaf that is large enough and divisible; everything else
    (scalars, small kernels, power-iteration vectors) is replicated.  Because
    Adam moments mirror parameter shapes, they pick up the same layout, giving
    FSDP-like optimizer-state sharding along the ``model`` axis for free.
    """
    tp = mesh.shape["model"]

    def spec(x):
        shape = getattr(x, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        if (
            tp > 1
            and len(shape) >= 1
            and size >= tp_min_size
            and shape[-1] % tp == 0
        ):
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), "model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, state)
