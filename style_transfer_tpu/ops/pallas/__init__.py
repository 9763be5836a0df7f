"""Fused Pallas (Mosaic) TPU kernels for the style-transfer objective.

This package is the build's native-kernel tier (SURVEY.md section 2 row 15):
where the reference leans on Caffe's C++/CUDA for all heavy math, the hot
non-conv ops here are hand-fused TPU kernels, each unit-checked against the
plain-jnp oracle in :mod:`style_transfer_tpu.ops.losses`.
"""
