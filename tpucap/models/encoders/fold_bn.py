"""Fold inference BatchNorm into the preceding conv's weights.

For frozen pretrained encoders (the reference never fine-tunes them,
SURVEY.md §2.1 #2), BN(conv(x)) is an affine function of conv(x):

    scale  = gamma / sqrt(var + eps)        (gamma = 1 when scale=False)
    kernel' = kernel * scale                (per output channel)
    bias'   = beta + (bias - mean) * scale

so every BN disappears from the inference graph — one fewer full-activation
elementwise pass per conv (~94 in InceptionV3, ~53 in ResNet-50).
Numerically exact up to float rounding (tests/test_fold_bn.py).

After folding, the bn entries are replaced with None; the encoders' apply
methods skip BN when its params are None.
"""

from __future__ import annotations

import numpy as np

from tpucap.models.encoders.inception_v3 import BN_EPS as INCEPTION_EPS
from tpucap.models.encoders.resnet50 import BN_EPS as RESNET_EPS


def _fold(conv_p: dict, bn_p: dict, eps: float) -> dict:
    kernel = np.asarray(conv_p["kernel"], np.float32)
    var = np.asarray(bn_p["var"], np.float32)
    mean = np.asarray(bn_p["mean"], np.float32)
    beta = np.asarray(bn_p["beta"], np.float32)
    scale = 1.0 / np.sqrt(var + eps)
    if "gamma" in bn_p:
        scale = scale * np.asarray(bn_p["gamma"], np.float32)
    bias = np.asarray(conv_p.get("bias", 0.0), np.float32)
    return {
        "kernel": kernel * scale,  # broadcast over the cout axis
        "bias": beta + (bias - mean) * scale,
    }


def fold_inception_v3(params: dict) -> dict:
    """conv_i: {conv, bn} -> {conv (with bias), bn: None}. Idempotent:
    already-folded entries (bn None) pass through, so fold_bn() followed
    by quantize_encoder() — or calling either twice — is safe."""
    out = {}
    for name, p in params.items():
        if p.get("bn") is None:
            out[name] = p
            continue
        out[name] = {
            "conv": _fold(p["conv"], p["bn"], INCEPTION_EPS),
            "bn": None,
        }
    return out


def fold_resnet50(params: dict) -> dict:
    """name_conv / name_bn pairs -> folded name_conv, name_bn dropped."""
    out = {}
    for name, p in params.items():
        if name.endswith("_bn"):
            continue
        if name.endswith("_conv"):
            bn_name = name[: -len("_conv")] + "_bn"
            if bn_name in params:
                out[name] = _fold(p, params[bn_name], RESNET_EPS)
                continue
        out[name] = p
    return out


def fold_batch_norms(encoder_name: str, params: dict) -> dict:
    if encoder_name == "inception_v3":
        return fold_inception_v3(params)
    if encoder_name == "resnet50":
        return fold_resnet50(params)
    return params  # vgg16 / tiny_cnn have no BN
