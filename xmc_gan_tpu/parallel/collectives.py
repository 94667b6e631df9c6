"""Explicit-collective (shard_map) variant of the cross-replica contrastive loss.

The production train step relies on GSPMD to insert the contrastive-negatives
``all_gather``; this module states the communication pattern *explicitly* with
``shard_map`` so it can be unit-tested for equivalence (tests/test_parallel.py)
and serves as the reference for the ICI layout: one ``all_gather`` of the
[B_local, D] feature pair over the ``data`` axis before the similarity matrix,
nothing else.  Gradient correctness follows from the all_gather transpose
(psum_scatter): each replica computes the identical global loss, and the mean
over replicas of the per-replica parameter gradients equals the gradient of
the global loss (the N identical loss copies cancel the 1/N of the mean).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 (check_rep became check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from xmc_gan_tpu import losses

__all__ = ["global_sent_loss", "make_sharded_sent_loss", "shard_map"]


def global_sent_loss(
    img_feats: jax.Array,
    txt_feats: jax.Array,
    sent_embs: jax.Array,
    b_global: bool,
    smooth_global: float,
    axis_name: str = "data",
) -> jax.Array:
    """Per-replica body: gather local features over ``axis_name`` and compute
    the global-batch sentence-image InfoNCE. Call inside shard_map/pmap."""
    img_g = jax.lax.all_gather(img_feats, axis_name, tiled=True)
    txt_g = jax.lax.all_gather(txt_feats, axis_name, tiled=True)
    sent_g = jax.lax.all_gather(sent_embs, axis_name, tiled=True)
    labels = losses.make_labels(sent_g, b_global, smooth_global)
    return losses.sent_loss(img_g, txt_g, labels, b_global, smooth_global)


def make_sharded_sent_loss(mesh: Mesh, b_global: bool, smooth_global: float):
    """shard_map-wrapped global contrastive loss: takes data-sharded
    [B, D] features, returns the replicated global-batch loss."""
    fn = functools.partial(
        global_sent_loss, b_global=b_global, smooth_global=smooth_global
    )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None)),
        out_specs=P(),
        check_rep=False,
    )
