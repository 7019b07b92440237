"""Fused merge-decoder step kernel (Pallas, TPU).

One pallas_call per decode step computes LSTM gates + cell update + the
merge head + the vocab projection without round-tripping intermediates
through HBM:

    grid = (cdiv(V, TILE_V),)
    step 0:   z = [x h] @ [W; U] + b  -> gates -> (h', c')        (MXU+VPU)
              merged = relu((fe + h') @ W_p + b_p)      -> VMEM scratch
    step j:   logits[:, j*T:(j+1)*T] = merged @ W_o[:, tile] + b_o[tile]

The hidden state lives in VMEM scratch across the sequential grid steps, so
the big W_o (hidden x vocab) streams through VMEM exactly once per step
while everything else stays on-chip. Numerics match the unfused step
exactly on f32 (tests/test_ops.py::TestPallasDecoderStep).

Embedding lookup stays an XLA gather outside the kernel (token-indexed row
gathers are cheap there and awkward in Mosaic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,      # (B, E) embedded tokens
    h_ref,      # (B, U)
    c_ref,      # (B, U)
    fe_ref,     # (B, U) image branch
    wk_ref,     # (E, 4U)
    wr_ref,     # (U, 4U)
    b_ref,      # (1, 4U)
    wp_ref,     # (U, U) merge head
    bp_ref,     # (1, U)
    wo_ref,     # (U, TILE_V) vocab tile
    bo_ref,     # (1, TILE_V)
    logits_ref,  # (B, TILE_V) out tile
    h_out_ref,  # (B, U)
    c_out_ref,  # (B, U)
    merged_ref,  # VMEM scratch (B, U)
):
    @pl.when(pl.program_id(0) == 0)
    def _first():
        z = (
            jnp.dot(x_ref[...], wk_ref[...], preferred_element_type=jnp.float32)
            + jnp.dot(
                h_ref[...], wr_ref[...], preferred_element_type=jnp.float32
            )
            + b_ref[...]
        )
        U = h_ref.shape[-1]
        i = jax.nn.sigmoid(z[:, :U])
        f = jax.nn.sigmoid(z[:, U : 2 * U])
        g = jnp.tanh(z[:, 2 * U : 3 * U])
        o = jax.nn.sigmoid(z[:, 3 * U :])
        c_new = f * c_ref[...].astype(jnp.float32) + i * g
        h_new = o * jnp.tanh(c_new)
        h_out_ref[...] = h_new.astype(h_out_ref.dtype)
        c_out_ref[...] = c_new.astype(c_out_ref.dtype)
        pre = jnp.dot(
            fe_ref[...].astype(jnp.float32) + h_new,
            wp_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + bp_ref[...]
        merged_ref[...] = jnp.maximum(pre, 0.0).astype(merged_ref.dtype)

    logits_ref[...] = (
        jnp.dot(
            merged_ref[...],
            wo_ref[...],
            preferred_element_type=jnp.float32,
        )
        + bo_ref[...]
    ).astype(logits_ref.dtype)


@partial(jax.jit, static_argnames=("tile_v", "interpret"))
def fused_merge_step(
    params, state, x, *, tile_v: int = 512, interpret: bool = False
):
    """Fused MergeDecoder (1-layer) step after embedding lookup.

    params: MergeDecoder params (cells[0], pre_out, out). state: {fe, h, c}
    with h/c shaped (B, 1, U). x: (B, E) embedded last tokens.
    -> (logits (B, V) f32, new_state).
    """
    cell = params["cells"][0]
    B, E = x.shape
    U = state["fe"].shape[-1]
    V = params["out"]["kernel"].shape[-1]
    h = state["h"][:, 0]
    c = state["c"][:, 0]

    grid = (pl.cdiv(V, tile_v),)
    logits, h_new, c_new = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E, 4 * U), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (U, 4 * U), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4 * U), lambda j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((U, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (U, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (B, tile_v), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((B, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, U), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, V), jnp.float32),
            jax.ShapeDtypeStruct((B, U), h.dtype),
            jax.ShapeDtypeStruct((B, U), c.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((B, U), jnp.float32)],
        interpret=interpret,
    )(
        x,
        h,
        c,
        state["fe"],
        cell["kernel"],
        cell["recurrent"],
        cell["bias"][None, :],
        params["pre_out"]["kernel"],
        params["pre_out"]["bias"][None, :],
        params["out"]["kernel"],
        params["out"]["bias"][None, :],
    )
    new_state = {
        "fe": state["fe"],
        "h": h_new[:, None, :],
        "c": c_new[:, None, :],
    }
    return logits, new_state


def make_fused_merge_step(decoder, *, tile_v: int = 512, interpret=False):
    """Drop-in step_fn for the decode engines (1-layer MergeDecoder only)."""
    if decoder.num_layers != 1:
        raise ValueError("fused step supports single-layer MergeDecoder")

    from tpucap.models.layers import embed

    def step(params, state, token):
        x = embed(params["embedding"], token)
        return fused_merge_step(
            params, state, x, tile_v=tile_v, interpret=interpret
        )

    return step
