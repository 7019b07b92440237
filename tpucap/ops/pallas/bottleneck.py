"""Fused ResNet identity-bottleneck block as one Pallas kernel.

Targets the measured encoder ceiling (docs/PERF.md round-2 roofline
trace): ResNet-50's large-spatial stages are HBM-bandwidth-bound, and the
XLA graph for an identity block

    out = relu(x + conv1x1_3(relu(conv3x3_2(relu(conv1x1_1(x))))))

round-trips every intermediate through HBM — per block it reads ~2.5x and
writes ~1.5x the block's activation footprint even with XLA's elementwise
fusion (x read twice: once by conv1, once by the residual add). This
kernel keeps y1/y2 entirely in VMEM: per image tile it reads x once and
writes out once (~2.07x with the 3x3 halo), a ~2x traffic cut exactly
where the roofline says the time goes (SURVEY.md §2.3 "native tier";
pallas_guide.md "fuse elementwise into matmuls / minimise HBM traffic").

Scope: stride-1 blocks WITHOUT a conv shortcut (13 of ResNet-50's 16
blocks) on BN-folded params (kernel+bias convs — pipeline.fold_bn). The
1x1 convs are matmuls over the flattened (G*H*W, C) pixels; the 3x3 is
nine shifted matmuls accumulated in f32 over a zero-halo'd VMEM scratch
— all MXU work, no im2col materialization.

MEASURED (v5e, batch 256 bf16 — docs/PERF.md): beats XLA standalone at
56x56 (-10%) and 7x7 (-28%) block shapes, but embedded in the full
encoder every configuration LOSES (e.g. conv2-only: 26.8 ms vs 21.9) —
in-graph XLA executes the same blocks faster than standalone (cross-op
fusion/overlap a custom-call region can't join; compiled HLO shows zero
layout copies, so it is scheduling, not layout). Ships OPT-IN
(`ResNet50(fused_blocks=True)`); the XLA path stays the default.

Numerics mirror the unfused path op-for-op: each conv accumulates in f32
and downcasts to the activation dtype BEFORE the bias add (exactly what
`encoders/common.conv` + XLA's bf16 MXU pass produce), so fused vs
unfused agree to float-rounding tolerance (tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, y1p_ref
):
    G, H, W, C = x_ref.shape
    M = w1_ref.shape[-1]
    dt = x_ref.dtype

    x = x_ref[...].reshape(G * H * W, C)

    # conv1: 1x1 bottleneck-in projection. f32 accumulate, downcast, bias
    # in activation dtype (the unfused conv() order), relu.
    y1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1.astype(dt) + b1_ref[...])

    # Zero-halo'd scratch for the 3x3: zero the 1-pixel border strips,
    # write the interior. (The interior is fully overwritten every grid
    # step; only the border must be (re)zeroed.)
    zrow = jnp.zeros((G, 1, W + 2, M), dt)
    zcol = jnp.zeros((G, H, 1, M), dt)
    y1p_ref[:, 0:1, :, :] = zrow
    y1p_ref[:, H + 1 : H + 2, :, :] = zrow
    y1p_ref[:, 1 : H + 1, 0:1, :] = zcol
    y1p_ref[:, 1 : H + 1, W + 1 : W + 2, :] = zcol
    y1p_ref[:, 1 : H + 1, 1 : W + 1, :] = y1.reshape(G, H, W, M)

    # conv2: 3x3 as nine shifted matmuls, accumulated in f32 (one f32
    # accumulator == XLA's in-conv accumulation; downcast once at the end).
    acc = jnp.zeros((G * H * W, M), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = y1p_ref[:, dy : dy + H, dx : dx + W, :]
            acc += jnp.dot(
                patch.reshape(G * H * W, M),
                w2_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    y2 = jax.nn.relu(acc.astype(dt) + b2_ref[...])

    # conv3: 1x1 expand + residual + relu, fused into the output write.
    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
    out = jax.nn.relu(y3.astype(dt) + b3_ref[...] + x)
    out_ref[...] = out.reshape(G, H, W, C)


def _group_for(
    h: int, w: int, c: int, m: int, batch: int, itemsize: int
) -> int:
    """Images per grid step: as many as fit the 16 MB VMEM budget (with
    headroom for Mosaic's own scratch), so small-spatial stages still
    feed the MXU wide matmuls. Accounts for double-buffered x/out
    blocks, the halo scratch, the f32 3x3 accumulator, y1/y2 temps, and
    the resident weights."""
    budget = 12 * 2**20
    weights = (2 * c * m + 9 * m * m) * itemsize
    per_g = (
        4 * h * w * c * itemsize  # x + out blocks, double-buffered
        + (h + 2) * (w + 2) * m * itemsize  # halo scratch
        + h * w * m * 4  # f32 conv2 accumulator
        + 2 * h * w * m * itemsize  # y1 / y2 temporaries
    )
    g = max(1, min(batch, int((budget - weights) // per_g)))
    while batch % g:
        g -= 1
    return g


@partial(jax.jit, static_argnames=("group", "interpret"))
def fused_identity_block(
    p1, p2, p3, x, *, group: int | None = None, interpret: bool | None = None
):
    """relu(x + c3(relu(c2(relu(c1(x)))))) for BN-folded 1x1/3x3/1x1 convs.

    p1/p2/p3: {"kernel", "bias"} with shapes (1,1,C,M)/(3,3,M,M)/(1,1,M,C).
    x: (B, H, W, C). Grid tiles the batch ``group`` images at a time.
    ``interpret`` defaults to True off-TPU so tests run on CPU.
    """
    B, H, W, C = x.shape
    M = p1["kernel"].shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    G = (
        group
        if group is not None
        else _group_for(H, W, C, M, B, jnp.dtype(x.dtype).itemsize)
    )
    if B % G:
        raise ValueError(f"batch {B} not divisible by group {G}")

    w1 = p1["kernel"].reshape(C, M).astype(x.dtype)
    w2 = p2["kernel"].astype(x.dtype)  # (3, 3, M, M)
    w3 = p3["kernel"].reshape(M, C).astype(x.dtype)
    b1 = p1["bias"].reshape(1, M).astype(x.dtype)
    b2 = p2["bias"].reshape(1, M).astype(x.dtype)
    b3 = p3["bias"].reshape(1, C).astype(x.dtype)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _block_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(
                (G, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            full((C, M)),
            full((1, M)),
            full((3, 3, M, M)),
            full((1, M)),
            full((M, C)),
            full((1, C)),
        ],
        out_specs=pl.BlockSpec(
            (G, H, W, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((G, H + 2, W + 2, M), x.dtype)],
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
