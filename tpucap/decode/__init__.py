"""Decode engines: batched greedy and beam search, fully on-device.

The reference's generation loops re-run the whole model per token from the
host (SURVEY.md §3.3-3.4 — k model.predict calls per step for beam width k).
Here the entire decode is ONE compiled XLA program: a ``lax.while_loop``
carrying (state, last-token, done-mask) for the whole batch, with
``lax.top_k`` beam bookkeeping on-device and early exit when every sequence
has finished.
"""

from tpucap.decode.greedy import greedy_decode, DecodeResult
from tpucap.decode.beam import beam_decode, BeamResult
from tpucap.decode.constrained import (
    constrained_beam_decode,
    ConstrainedBeamResult,
)
from tpucap.decode.diverse import diverse_beam_decode, DiverseBeamResult
from tpucap.decode.ensemble import EnsembleDecoder
from tpucap.decode.mbr import mbr_select
from tpucap.decode.sample import sample_decode
from tpucap.decode.speculative import speculative_greedy_decode, SpecStats
from tpucap.decode.text import ids_to_captions

__all__ = [
    "greedy_decode",
    "beam_decode",
    "constrained_beam_decode",
    "ConstrainedBeamResult",
    "diverse_beam_decode",
    "DiverseBeamResult",
    "sample_decode",
    "speculative_greedy_decode",
    "DecodeResult",
    "BeamResult",
    "EnsembleDecoder",
    "mbr_select",
    "SpecStats",
    "ids_to_captions",
]
