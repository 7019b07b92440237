"""Fused LSTM decode-step kernel (SURVEY.md §2.3 "fused LSTM" row).

One pallas_call computes the whole cell update for a batch tile:
    z = [x h] @ [W; U] + b ; i,f,g,o gates ; c' = f*c + i*tanh(g) ;
    h' = sigmoid(o) * tanh(c')
keeping z and the gate nonlinearities in VMEM (the XLA default emits the
same matmuls but round-trips the 4U-wide z through HBM between the matmul
and the elementwise stage when fusion heuristics decline). Numerics match
tpucap.models.layers.lstm_cell_step exactly on f32 — tests/test_ops.py.

NOT wired into the decode engines: measured on real v5e hardware the XLA
fusion of the scan-based cell was faster (docs/PERF.md, pallas section),
so this kernel stays a standalone opt-in — call `fused_lstm_step(...)`
directly
(as tests/test_ops.py and `bench.py --mode pallas-lstm` do) — per the
pallas_guide "measure before writing it" rule (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(x_ref, h_ref, c_ref, wk_ref, wr_ref, b_ref, ho_ref, co_ref):
    x = x_ref[...]
    h = h_ref[...]
    c = c_ref[...]
    z = (
        jnp.dot(x, wk_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(h, wr_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    )
    units = h.shape[-1]
    zi = z[:, :units]
    zf = z[:, units : 2 * units]
    zg = z[:, 2 * units : 3 * units]
    zo = z[:, 3 * units :]
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    c_new = f * c + i * jnp.tanh(zg)
    h_new = jax.nn.sigmoid(zo) * jnp.tanh(c_new)
    co_ref[...] = c_new
    ho_ref[...] = h_new


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_lstm_step(p, x, h, c, *, block_b: int = 256, interpret: bool = False):
    """Drop-in replacement for lstm_cell_step. x (B, E), h/c (B, U)."""
    B, E = x.shape
    U = h.shape[-1]
    bias = p["bias"][None, :]  # (1, 4U)

    grid = (pl.cdiv(B, block_b),)
    bb = min(block_b, B)
    out_shape = [
        jax.ShapeDtypeStruct((B, U), h.dtype),
        jax.ShapeDtypeStruct((B, U), c.dtype),
    ]
    h_new, c_new = pl.pallas_call(
        _lstm_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (E, 4 * U), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (U, 4 * U), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4 * U), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((bb, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, U), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(x, h, c, p["kernel"], p["recurrent"], bias)
    return h_new, c_new
