"""Post-training int8 quantization for frozen encoder serving.

v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 FLOP rate, and the
judged pipeline only ever runs encoders frozen (the reference never
fine-tunes them — SURVEY.md §2.1 #2), so the weights can be quantized
once offline:

- weights: symmetric per-output-channel int8 (`kernel_scale[c] =
  max|K[..., c]| / 127`) — standard PTQ; per-channel keeps InceptionV3's
  wildly varying filter magnitudes from collapsing onto one scale.
- activations: symmetric per-tensor DYNAMIC int8 — each conv computes
  `sx = max|x| / 127` on device and requantizes its input. No calibration
  dataset needed (none exists offline); the extra abs-max reduction +
  requantize per conv is elementwise work XLA fuses into neighbors.
  CONSEQUENCE: the scale — and therefore low-order rounding — depends on
  BATCH COMPOSITION. The same image encoded in different batches (other
  images, different batch size, reordered dataset) can round differently
  and occasionally flip a borderline caption token. Exact run-to-run
  reproducibility under int8 requires fixed batching; the float paths
  keep per-image determinism.
  Under data-parallel serving (shard_map) the abs-max is computed over
  each shard's LOCAL batch slice, so the dynamic scales — and therefore
  borderline low-order bits — can differ from the single-device int8 run.
  That is still correct quantization (every shard quantizes the
  activations it actually sees); it just means int8+dp parity with
  single-device int8 is approximate, unlike the float paths' exact
  caption parity.

The compute path lives in `common.conv` / `layers.dense`, which dispatch
on `kernel.dtype == int8`; everything around the convs (BN when unfolded,
concat, pooling) stays in the float flow, so topology code is untouched.

Opt-in via `CaptioningPipeline.quantize_encoder()`. Accuracy: features
drift ~1% relative vs f32 (tests/test_quantize.py); caption parity on
trained fixture models is asserted there too. Fold BatchNorms first —
folding after quantization would perturb the already-rounded kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_kernel(kernel: np.ndarray):
    """float kernel (..., cout) -> (int8 kernel, f32 per-cout scale)."""
    k = np.asarray(kernel, np.float32)
    axes = tuple(range(k.ndim - 1))
    scale = np.maximum(np.abs(k).max(axis=axes), 1e-12) / 127.0
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_encoder_params(params):
    """Quantize every conv (ndim-4) and dense (ndim-2) kernel in an
    encoder param tree to int8 + per-output-channel scale, in place of the
    float kernel. Non-kernel leaves (biases, BN stats) are untouched; the
    runtime dequantizes conv outputs back to the activation dtype."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for name, child in node.items():
                if (
                    name == "kernel"
                    and hasattr(child, "ndim")
                    and child.ndim in (2, 4)
                    and np.asarray(child).dtype != np.int8
                ):
                    q, scale = _quantize_kernel(np.asarray(child))
                    out["kernel"] = jnp.asarray(q)
                    out["kernel_scale"] = jnp.asarray(scale)
                else:
                    out[name] = walk(child)
            return out
        if isinstance(node, (list, tuple)):
            # Repeated-block params (e.g. the ViT's `blocks`) are lists of
            # per-layer dicts — recurse, preserving the container type.
            return type(node)(walk(child) for child in node)
        return node

    return walk(params)


def quantize_dense_params(p):
    """Quantize one dense param dict (kernel (in, out) [+ bias]) to the
    int8 serving form `layers.dense` dispatches on: int8 kernel + f32
    per-output-channel scale. Other leaves pass through. No-op if the
    kernel is already int8."""
    if np.asarray(p["kernel"]).dtype == np.int8:
        return dict(p)
    q, scale = _quantize_kernel(np.asarray(p["kernel"]))
    out = dict(p)
    out["kernel"] = jnp.asarray(q)
    out["kernel_scale"] = jnp.asarray(scale)
    return out


def quantize_decoder_projection(params):
    """Quantize a decoder's output (vocab) projection head to int8.

    Different cost model from the encoder convs (FLOP-bound; int8 measured
    ~neutral on this toolchain — docs/PERF.md): inside the decode loop the
    (hidden x vocab) kernel (256 x 7,579 ≈ 3.9 MB bf16) is re-read from HBM
    for EVERY generated token while the row count (batch x beam) is small,
    so at serving batch sizes the projection is weight-traffic-bound and
    int8 halves the per-step HBM read vs bf16. Only the `out` head is
    touched — the LSTM/merge kernels are small, and rounding the logits
    head perturbs a linear readout (argmax/top-k ordering) rather than the
    recurrent state dynamics.

    Serving-only (training keeps float params). Works for every decoder in
    the zoo (they all expose `params['out']` via ``init_dense``). The
    vocab-sharded TP serving path does not accept a quantized head
    (`pad_vocab_params` raises) — use single-device or DP serving.
    """
    out = dict(params)
    out["out"] = quantize_dense_params(params["out"])
    return out


def cast_bf16_preserving_quant(tree):
    """Cast a param tree to bf16 for serving while leaving int8 kernels
    and their f32 `kernel_scale`s untouched (casting either would silently
    undo or degrade the quantization)."""

    def cast_leaf(path, a):
        if a.dtype == jnp.int8:
            return a
        if getattr(path[-1], "key", None) == "kernel_scale":
            return a
        return jnp.asarray(a, jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast_leaf, tree)


def quantize_input(x, dtype=jnp.int8):
    """Dynamic symmetric per-tensor quantization of an activation tensor:
    -> (int8 tensor, f32 scalar scale). Computed on device inside the
    compiled program (a data-dependent *value*, not shape — jit-safe)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(dtype), scale


def dequantize_output(y_int32, p, sx, x_dtype):
    """Shared epilogue for the int8 conv/dense paths: int32 accumulator ->
    (input scale x per-channel kernel scale) -> activation dtype -> +bias.
    One definition so the conv and dense recipes cannot drift."""
    y = (y_int32 * (p["kernel_scale"] * sx)).astype(x_dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x_dtype)
    return y
