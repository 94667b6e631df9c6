"""Pallas TPU kernels for the framework's hot ops.

``damsm_score`` — the production LN-scale kernel: fused pairwise
word-region (DAMSM) matching scores with custom-VJP backward kernels;
auto-selected by ``losses.word_region_scores`` on TPU at blocking scale
(1.6x the XLA streaming path at LN-COCO shape, BASELINE.md).

``cross_attention`` — blockwise masked word attention for long captions
(online-softmax, forward-only; public seam
``masked_cross_attention(backend=...)`` with a jnp fallback off-TPU).

``fused_affine`` — modulation-epilogue kernel kept as a documented
experiment: standalone 1.32x vs the unfused XLA epilogue, but no in-step win
because XLA fuses the pattern into the producing convs (BASELINE.md);
production code uses the plain-jnp ``ops/fused.py``.
"""
