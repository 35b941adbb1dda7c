"""Pallas TPU kernels for the hot ops."""

from phiseg_tpu.ops.fused_residual_ce import fused_residual_ce

__all__ = ["fused_residual_ce"]
