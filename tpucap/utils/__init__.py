"""Utilities: structured metrics logging, profiling hooks, debug guards."""

from tpucap.utils.logging import MetricsLogger
from tpucap.utils.profiling import profile_trace, StepTimer
from tpucap.utils.debug import debug_mode

__all__ = ["MetricsLogger", "profile_trace", "StepTimer", "debug_mode"]
