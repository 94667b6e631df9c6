"""Pallas TPU kernels for the framework's hot ops.

Kernels here are optional accelerations behind stable jnp-fallback seams:
``fused_affine`` (modulation epilogues, seam in ``ops/fused.py``) and
``cross_attention`` (blockwise masked word attention for long captions,
seam in ``ops.pallas.cross_attention.masked_cross_attention``).
"""
