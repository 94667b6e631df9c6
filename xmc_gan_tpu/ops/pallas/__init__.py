"""Pallas TPU kernels for the framework's hot ops.

``damsm_score`` — the production LN-scale kernel: fused pairwise
word-region (DAMSM) matching scores with custom-VJP backward kernels;
selected through the explicit ``losses.word_scores_backend`` seam on TPU at
blocking scale (1.6x the XLA streaming path at LN-COCO shape, BASELINE.md);
under a mesh it runs per-device inside the ``shard_map`` row-block
formulation (``parallel.collectives.make_sharded_word_scores``).

``cross_attention`` — **documented experiment, not a production path**:
blockwise masked word attention (online-softmax, forward-only), standalone
1.76x vs XLA at an LN-like [B, N=H*W, T] shape.  Its intended production
role — the long-caption word-region loss — was superseded by
``damsm_score``, whose pairwise all-images-x-all-captions structure (and
custom VJP) the attention kernel cannot express; and the only other masked
word attention in the model zoo (``models/concept_gan.py`` samplers) is
grouped with state_dim=4 per group, a shape that pads 32x on the MXU lane
axis and would lose to XLA.  Kept with tests as a seam for future
single-pair attention workloads.

``fused_affine`` — modulation-epilogue kernel kept as a documented
experiment: standalone 1.32x vs the unfused XLA epilogue, but no in-step win
because XLA fuses the pattern into the producing convs (BASELINE.md);
production code uses the plain-jnp ``ops/fused.py``.
"""
