"""Pallas TPU kernels — the hand-written hot paths.

Counterparts of the reference's CUDA kernels (src/ops/kernels/*.cu); each
module documents which kernel it replaces.
"""
