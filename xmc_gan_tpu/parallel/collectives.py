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

try:  # jax >= 0.8 exports jax.shard_map (check_rep became check_vma there,
    # but probe the actual signature rather than assuming the export and the
    # kwarg rename landed in the same release)
    import inspect

    from jax import shard_map as _shard_map

    _CHECK_KW = ("check_vma"
                 if "check_vma" in inspect.signature(_shard_map).parameters
                 else "check_rep")

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            **{_CHECK_KW: check_rep},
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from xmc_gan_tpu import losses

__all__ = [
    "global_sent_loss",
    "make_sharded_sent_loss",
    "make_sharded_word_scores",
    "shard_map",
]


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


def make_sharded_word_scores(
    mesh: Mesh,
    gamma1: float = 4.0,
    gamma2: float = 5.0,
    block_elems: int | None = losses.WORD_LOSS_BLOCK_ELEMS,
    compute_dtype=None,
    backend: str | None = None,
    interpret: bool = False,
):
    """Distributed word-region matching scores: the row-block formulation.

    The word loss's score matrix is [B_global, B_global] over *all* images x
    *all* captions (XMC-GAN's global-negative-pool semantics; masked-attention
    spec anchor ``/root/reference/xmc_gan/model/concept_gan.py:516-580``), but
    its compute — ``losses.word_region_scores`` — is by far the heaviest loss
    term at LN scale and must not be replicated.  GSPMD cannot partition it
    when it routes through the Pallas kernel (``pallas_call`` is opaque to the
    partitioner), so the communication pattern is stated explicitly:

    * regions stay **local**: each chip keeps its [B_local, R, D] shard;
    * words/mask **all_gather** over ``data`` (operands are small:
      [B_global, T, D] bf16 at LN scale is ~78 MB, one ICI pass);
    * each chip computes its [B_local, B_global] row block — 1/dp of the
      pairwise work — through the same backend seam as single-device
      (fused Pallas kernel on TPU at blocking scale, streamed XLA otherwise);
    * under tensor parallelism the caption axis additionally splits over
      ``model`` (another 1/tp of the work) and regroups with an ``all_gather``;
    * the returned value is the *global* score matrix, row-sharded over
      ``data`` (``out_specs=P('data', None)``) — the cheap [B, B] InfoNCE on
      top stays in GSPMD land, which inserts the cross-chip log-softmax
      collectives for the image axis.

    Gradients: d(scores)/d(regions) is local by construction; word cotangents
    flow through the ``all_gather`` transposes (``psum_scatter`` over ``data``,
    a ``psum`` over ``model`` for the replicated broadcast) — equivalence with
    the single-device loss *and gradient* is tested on the simulated 8-device
    mesh (``tests/test_parallel.py``).
    """
    tp = mesh.shape.get("model", 1)

    def body(regions, words, mask):
        words_g = jax.lax.all_gather(words, "data", tiled=True)
        mask_g = jax.lax.all_gather(mask, "data", tiled=True)
        b_loc, r_regions, _ = regions.shape
        b_glob, t, _ = words_g.shape
        cols = b_glob // tp if (tp > 1 and b_glob % tp == 0) else b_glob
        if backend is None:
            be = losses.word_scores_backend(
                b_loc, cols, t, r_regions, block_elems, in_shard_map=True
            )
        else:
            be = backend
        if cols < b_glob:
            j = jax.lax.axis_index("model")
            w_j = jax.lax.dynamic_slice_in_dim(words_g, j * cols, cols, 0)
            m_j = jax.lax.dynamic_slice_in_dim(mask_g, j * cols, cols, 0)
            block = losses.word_region_scores(
                regions, w_j, m_j, gamma1, gamma2, block_elems,
                compute_dtype, be, interpret,
            )  # [B_local, B_global/tp]
            return jax.lax.all_gather(block, "model", axis=1, tiled=True)
        return losses.word_region_scores(
            regions, words_g, mask_g, gamma1, gamma2, block_elems,
            compute_dtype, be, interpret,
        )

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", None, None), P("data", None, None), P("data", None)),
        out_specs=P("data", None),
        check_rep=False,
    )


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
