"""Checkpointing: orbax manager, Keras weight import/export, AOT
(StableHLO) serving artifacts."""

from tpucap.checkpoint.aot import AotCaptioner, export_decode
from tpucap.checkpoint.keras_export import (
    attention_decoder_to_keras,
    decoder_to_keras,
    export_h5,
    gru_merge_decoder_to_keras,
    inject_decoder_to_keras,
    merge_decoder_to_keras,
)
from tpucap.checkpoint.keras_import import (
    attention_decoder_params_from_keras,
    gru_merge_decoder_params_from_keras,
    inject_decoder_params_from_keras,
    merge_decoder_params_from_keras,
    params_from_keras,
)
from tpucap.checkpoint.manager import CheckpointManager

__all__ = [
    "AotCaptioner",
    "export_decode",
    "params_from_keras",
    "merge_decoder_params_from_keras",
    "gru_merge_decoder_params_from_keras",
    "inject_decoder_params_from_keras",
    "attention_decoder_params_from_keras",
    "export_h5",
    "decoder_to_keras",
    "merge_decoder_to_keras",
    "gru_merge_decoder_to_keras",
    "inject_decoder_to_keras",
    "attention_decoder_to_keras",
    "CheckpointManager",
]
