"""Caption decoder zoo.

All decoders expose a uniform interface (tpucap.models.decoders.base) so the
batched greedy/beam engines in tpucap.decode drive any of them:

- ``lstm.MergeDecoder``   — the reference's merge model (SURVEY.md §2.1 #6),
                            1- or 2-layer LSTM branch added to the image branch
- ``lstm.InjectDecoder``  — image feature injected as the LSTM initial state
                            (SURVEY.md §2.1 #7)
- ``gru.GruMergeDecoder`` — merge topology over a GRU stack (beyond
                            parity; Keras GRU-v2 cell numerics)
- ``attention.AttentionDecoder`` — Show-Attend-Tell soft attention over a
                            spatial feature grid (SURVEY.md §2.1 #8)
- ``adaptive.AdaptiveAttentionDecoder`` — adaptive attention with a
                            visual sentinel (Lu et al. 2017; beyond
                            parity — the model learns WHEN to look)
- ``transformer.TransformerDecoder`` — beyond-parity pre-LN causal
                            Transformer with cross-attention + incremental
                            KV cache (MXU-first; no recurrence)
"""

from tpucap.models.decoders.base import CaptionDecoder
from tpucap.models.decoders.lstm import MergeDecoder, InjectDecoder
from tpucap.models.decoders.gru import GruMergeDecoder
from tpucap.models.decoders.attention import AttentionDecoder
from tpucap.models.decoders.adaptive import AdaptiveAttentionDecoder
from tpucap.models.decoders.transformer import TransformerDecoder


def build_decoder(
    name: str,
    vocab_size: int,
    feature_dim: int,
    embed_dim: int = 256,
    hidden_dim: int = 256,
    num_layers: int = 1,
    dropout_rate: float = 0.5,
    attention_dim: int = 256,
    num_heads: int = 4,
    mlp_dim: int = 1024,
    max_positions: int = 40,
    num_experts: int = 0,
    moe_top_k: int = 2,
) -> CaptionDecoder:
    """Factory keyed by config.DecoderConfig.name."""
    if name in ("lstm1", "lstm2"):
        layers = 2 if name == "lstm2" else num_layers
        return MergeDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            num_layers=layers,
            dropout_rate=dropout_rate,
        )
    if name in ("gru1", "gru2"):
        return GruMergeDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            num_layers=2 if name == "gru2" else num_layers,
            dropout_rate=dropout_rate,
        )
    if name == "inject":
        return InjectDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            dropout_rate=dropout_rate,
        )
    if name == "attention":
        return AttentionDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            attention_dim=attention_dim,
            dropout_rate=dropout_rate,
        )
    if name == "adaptive":
        return AdaptiveAttentionDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            embed_dim=embed_dim,
            hidden_dim=hidden_dim,
            attention_dim=attention_dim,
            dropout_rate=dropout_rate,
        )
    if name == "transformer":
        return TransformerDecoder(
            vocab_size=vocab_size,
            feature_dim=feature_dim,
            hidden_dim=hidden_dim,
            num_layers=num_layers,
            num_heads=num_heads,
            mlp_dim=mlp_dim,
            max_positions=max_positions,
            dropout_rate=dropout_rate,
            num_experts=num_experts,
            moe_top_k=moe_top_k,
        )
    raise ValueError(f"unknown decoder {name!r}")


__all__ = [
    "CaptionDecoder",
    "MergeDecoder",
    "GruMergeDecoder",
    "InjectDecoder",
    "AttentionDecoder",
    "AdaptiveAttentionDecoder",
    "TransformerDecoder",
    "build_decoder",
]
