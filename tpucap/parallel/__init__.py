"""Data-parallel training/inference over a TPU mesh.

The reference is single-device with no parallelism of its own
(SURVEY.md §2.4); this module is the rebuild's replacement for the entire
missing distributed tier: a 1-D ``("data",)`` mesh, ``shard_map`` bodies with
XLA collectives over ICI — ``psum`` for gradient/metric reduction — and
sharded batch placement. Gradients are reduced in sum form and normalized by
the psum'd global token count, so the DP-N step is bit-for-bit the
single-device step on the concatenated batch
(tests/test_distributed.py::test_dp_gradients_match_single_device).
"""

from tpucap.parallel.dp import make_dp_train_step, make_dp_decode_fn
from tpucap.parallel.multihost import (
    free_coordinator_address,
    initialize_distributed,
    local_worker_env,
    process_info,
    shard_for_host,
)
from tpucap.parallel.ep import make_ep_train_step
from tpucap.parallel.fsdp import (
    fsdp_gather_tree,
    fsdp_specs,
    make_fsdp_train_step,
    shard_fsdp_tree,
)
from tpucap.parallel.pp import (
    make_pp_train_step,
    stack_pp_layers,
    unstack_pp_layers,
)
from tpucap.parallel.sp import make_sp_train_step
from tpucap.parallel.tp import (
    make_tp_beam_fn,
    make_tp_train_step,
    pad_vocab_params,
    unpad_vocab_params,
)

__all__ = [
    "initialize_distributed",
    "process_info",
    "shard_for_host",
    "free_coordinator_address",
    "local_worker_env",
    "make_dp_train_step",
    "make_dp_decode_fn",
    "make_ep_train_step",
    "make_fsdp_train_step",
    "shard_fsdp_tree",
    "fsdp_gather_tree",
    "fsdp_specs",
    "make_pp_train_step",
    "make_sp_train_step",
    "stack_pp_layers",
    "unstack_pp_layers",
    "make_tp_beam_fn",
    "make_tp_train_step",
    "pad_vocab_params",
    "unpad_vocab_params",
]
