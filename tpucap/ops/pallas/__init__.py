"""Pallas TPU kernels."""

from tpucap.ops.pallas.lstm_step import fused_lstm_step

__all__ = ["fused_lstm_step"]
