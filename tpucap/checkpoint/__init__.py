"""Checkpointing: orbax manager + Keras weight import."""

from tpucap.checkpoint.keras_import import params_from_keras
from tpucap.checkpoint.manager import CheckpointManager

__all__ = ["params_from_keras", "CheckpointManager"]
