"""Fused on-device image preprocessing (SURVEY.md §2.3 row 1-2).

uint8 NHWC batches (from the C++ JPEG decoder) are shipped to the device as
bytes — 4x less PCIe/ICI traffic than float32 — and converted + normalized
on-device in one VMEM pass by a Pallas kernel (scale*x + bias per channel
column), then fed straight to the encoder. Nearest resize (PIL convention,
keras load_img parity [keras/src/utils/image_utils.py:200-204]) runs as an
XLA gather when the host decoder hasn't already resized.

Every preprocessing mode reduces to an affine per-channel transform of the
(possibly channel-flipped) uint8 input:
    caffe: BGR(x) - mean_bgr        (flip + bias)
    tf:    x/127.5 - 1              (scale + bias)
    torch: (x/255 - mean)/std       (scale + bias)
Numerics match tpucap.data.preprocess (host oracle) exactly — see
tests/test_ops.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.data.preprocess import CAFFE_MEAN_BGR, TORCH_MEAN, TORCH_STD


def _mode_scale_bias(mode: str) -> tuple[np.ndarray, np.ndarray, bool]:
    """-> (scale (3,), bias (3,), flip_channels). y = scale * x' + bias where
    x' is the channel-flipped input when flip_channels."""
    if mode == "caffe":
        return (
            np.ones(3, np.float32),
            -CAFFE_MEAN_BGR.astype(np.float32),
            True,
        )
    if mode == "tf":
        return (
            np.full(3, 1 / 127.5, np.float32),
            np.full(3, -1.0, np.float32),
            False,
        )
    if mode == "torch":
        return (
            (1.0 / (255.0 * TORCH_STD)).astype(np.float32),
            (-TORCH_MEAN / TORCH_STD).astype(np.float32),
            False,
        )
    raise ValueError(f"unknown preprocess mode {mode!r}")


def _normalize_kernel(x_ref, scale_ref, bias_ref, o_ref):
    """One image as (H, W*3): y = x * scale_col + bias_col, single VMEM pass
    (uint8 load -> f32 multiply-add -> store). Mosaic has no direct
    uint8->f32 cast; widen through int32."""
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
    o_ref[...] = x * scale_ref[...] + bias_ref[...]


@partial(jax.jit, static_argnames=("mode", "use_pallas", "out_dtype"))
def normalize_images(
    images, mode: str = "caffe", *, use_pallas: bool = True, out_dtype=None
):
    """(B, H, W, 3) uint8 RGB -> (B, H, W, 3) float, mode-normalized."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = images.shape
    scale, bias, flip = _mode_scale_bias(mode)
    if flip:
        images = images[..., ::-1]

    if not use_pallas or jax.default_backend() != "tpu":
        y = images.astype(jnp.float32) * scale + bias
        return y.astype(out_dtype) if out_dtype else y

    # Column-expanded scale/bias for the (H, W*3) flattened layout.
    scale_col = jnp.asarray(np.tile(scale, W), jnp.float32)[None, :]
    bias_col = jnp.asarray(np.tile(bias, W), jnp.float32)[None, :]
    x2 = images.reshape(B, H, W * C)

    out = pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, W * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, W * C), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, W * C), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W * C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )(x2, scale_col, bias_col)
    out = out.reshape(B, H, W, C)
    return out.astype(out_dtype) if out_dtype else out


def _nearest_indices(dst: int, src: int) -> np.ndarray:
    """PIL-convention nearest map: floor((i + 0.5) * src/dst), clipped."""
    idx = np.floor((np.arange(dst) + 0.5) * (src / dst)).astype(np.int32)
    return np.minimum(idx, src - 1)


def resize_nearest(images, size: int):
    """(B, H, W, C) -> (B, size, size, C) nearest resize (XLA gather)."""
    B, H, W, C = images.shape
    if H == size and W == size:
        return images
    rows = jnp.asarray(_nearest_indices(size, H))
    cols = jnp.asarray(_nearest_indices(size, W))
    return images[:, rows][:, :, cols]


@partial(jax.jit, static_argnames=("size", "mode", "use_pallas", "out_dtype"))
def fused_preprocess(
    images,
    size: int,
    mode: str = "caffe",
    *,
    use_pallas: bool = True,
    out_dtype=None,
):
    """uint8 (B, H, W, 3) -> normalized float (B, size, size, 3), one
    compiled program (resize gather fuses with the normalize pass)."""
    images = resize_nearest(images, size)
    return normalize_images(
        images, mode, use_pallas=use_pallas, out_dtype=out_dtype
    )
