"""Checkpointing: orbax manager + Keras weight import/export."""

from tpucap.checkpoint.keras_export import export_h5, merge_decoder_to_keras
from tpucap.checkpoint.keras_import import params_from_keras
from tpucap.checkpoint.manager import CheckpointManager

__all__ = [
    "params_from_keras",
    "export_h5",
    "merge_decoder_to_keras",
    "CheckpointManager",
]
