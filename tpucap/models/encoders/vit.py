"""Vision Transformer encoder (beyond-parity family, TPU-first).

The reference's encoder zoo is CNN-only (SURVEY.md §2.2: VGG16 /
InceptionV3 / ResNet-50, frozen feature extractors); this family adds the
modern counterpart. A ViT is the best-case encoder for the MXU: after one
patchify convolution, EVERY op is a large batched matmul over a static
(B, 196, H) token grid — no branchy reductions, no odd spatial shapes, and
the attention/MLP blocks reuse exactly the fused-QKV primitives the
transformer decoder runs (models/layers.sdpa).

Same frozen-extractor contract as the CNN zoo:
- ``init(key)`` -> param pytree, ``apply(params, x)`` with x NHWC already
  preprocessed ('tf' mode: x/127.5 - 1 — the standard ViT [-1, 1] input).
- 'pooled' features: mean over the token grid (B, hidden_dim) — GAP-style,
  matching how the CNN zoo pools; no CLS token (a class token only earns
  its extra sequence position when a pretrained classifier head is the
  target, and keeping the grid CLS-free makes 'spatial' a pure reshape).
- 'spatial' features: the (B, g, g, hidden_dim) token grid, flattened to
  (B, g*g, hidden_dim) by the pipeline like every other spatial encoder —
  feeds the SAT attention decoder and the transformer decoder's
  cross-attention directly.

int8 PTQ (``CaptioningPipeline.quantize_encoder``) works unchanged: the
quantizer walks ndim-2/4 ``kernel`` leaves, and both ``common.conv``
(patchify) and ``layers.dense`` (everything else) dispatch on int8
kernels. fold-BN is a structural no-op (no BatchNorm in the family).

No Keras .h5 bridge: the reference genre (tf.keras.applications of the
Keras-2 era) ships no ViT, so there is no checkpoint format to be
compatible with — weights come from tpucap training / orbax checkpoints.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpucap.models.encoders.common import KeyGen, conv, init_conv
from tpucap.models.layers import (
    dense,
    init_dense,
    init_layer_norm,
    layer_norm,
    merge_heads,
    sdpa,
    split_heads,
)


def _flash_ctx(q, k, v, scale: float):
    """Token-grid attention via the stock TPU Pallas flash kernel.

    q/k/v (B, L, h, d) -> ctx (B, L, h, d). The kernel wants (B, h, L, d)
    with L a multiple of its 128-wide blocks, so the 196-token ViT grid is
    zero-padded to 256 and masked with segment ids (pad tokens form their
    own segment — real queries never see pad keys; pad rows are sliced
    off). TPU-only and opt-in: XLA's fused sdpa is the portable default
    (A/B numbers in docs/PERF.md).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, L, h, d = q.shape
    Lp = -(-L // 128) * 128
    qT = jnp.moveaxis(q, 1, 2)
    kT = jnp.moveaxis(k, 1, 2)
    vT = jnp.moveaxis(v, 1, 2)
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        qT, kT, vT = (jnp.pad(a, pad) for a in (qT, kT, vT))
    seg = jnp.broadcast_to(
        (jnp.arange(Lp) < L).astype(jnp.int32), (B, Lp)
    )
    out = flash_attention(
        qT,
        kT,
        vT,
        segment_ids=SegmentIds(q=seg, kv=seg),
        sm_scale=scale,
    )
    return jnp.moveaxis(out[:, :, :L, :], 1, 2)


@dataclasses.dataclass(frozen=True)
class ViT:
    """Pre-LN ViT. Defaults are ViT-B/16 (224 input, 12x768, 12 heads)."""

    features: str = "pooled"  # 'pooled' (hidden_dim) | 'spatial' (g x g grid)
    input_size: int = 224
    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    preprocess_mode: str = "tf"
    attention_impl: str = "xla"  # 'xla' | 'flash' (TPU Pallas, opt-in)

    def __post_init__(self):
        if self.input_size % self.patch_size:
            raise ValueError(
                f"input_size {self.input_size} not divisible by "
                f"patch_size {self.patch_size}"
            )
        if self.hidden_dim % self.num_heads:
            raise ValueError(
                f"hidden_dim {self.hidden_dim} not divisible by "
                f"num_heads {self.num_heads}"
            )
        if self.attention_impl not in ("xla", "flash"):
            raise ValueError(
                f"attention_impl must be 'xla' or 'flash', got "
                f"{self.attention_impl!r}"
            )

    @property
    def feature_dim(self) -> int:
        return self.hidden_dim

    @property
    def grid(self) -> int:
        return self.input_size // self.patch_size

    @property
    def spatial_positions(self) -> int:
        return self.grid**2

    def init(self, key):
        kg = KeyGen(key)
        H, M, P = self.hidden_dim, self.mlp_dim, self.patch_size
        blocks = []
        for _ in range(self.num_layers):
            blocks.append(
                {
                    "ln1": init_layer_norm(H),
                    # Fused H -> 3H projection, same shape as the
                    # transformer decoder's (one big MXU matmul).
                    "qkv": init_dense(kg(), H, 3 * H),
                    "o": init_dense(kg(), H, H),
                    "ln2": init_layer_norm(H),
                    "mlp_in": init_dense(kg(), H, M),
                    "mlp_out": init_dense(kg(), M, H),
                }
            )
        return {
            # Patchify = a P-stride PxP conv: one matmul per patch row on
            # the MXU, and the one place `common.conv` (with its int8
            # dispatch) is reused.
            "patch_embed": init_conv(kg(), P, P, 3, H),
            "pos_embedding": 0.02
            * jax.random.normal(kg(), (self.spatial_positions, H)),
            "blocks": blocks,
            "ln_f": init_layer_norm(H),
        }

    def apply(self, params, x):
        """x (B, S, S, 3) preprocessed -> pooled (B, H) or spatial
        (B, g, g, H) token grid (NHWC like the CNN zoo; the pipeline
        flattens spatial grids to (B, L, H))."""
        P, H, g = self.patch_size, self.hidden_dim, self.grid
        t = conv(params["patch_embed"], x, stride=(P, P), padding="VALID")
        B = t.shape[0]
        t = t.reshape(B, g * g, H)
        t = t + params["pos_embedding"].astype(t.dtype)

        scale = 1.0 / float(H // self.num_heads) ** 0.5
        for block in params["blocks"]:
            h1 = layer_norm(block["ln1"], t)
            qkv = dense(block["qkv"], h1)  # (B, L, 3H)
            q = split_heads(qkv[..., :H], self.num_heads)
            k = split_heads(qkv[..., H : 2 * H], self.num_heads)
            v = split_heads(qkv[..., 2 * H :], self.num_heads)
            if self.attention_impl == "flash":
                ctx = _flash_ctx(q, k, v, scale)
            else:
                ctx, _ = sdpa(q, k, v, None, scale)  # dense attention
            t = t + dense(block["o"], merge_heads(ctx))
            h2 = layer_norm(block["ln2"], t)
            t = t + dense(
                block["mlp_out"], dense(block["mlp_in"], h2, jax.nn.gelu)
            )

        t = layer_norm(params["ln_f"], t)
        if self.features == "spatial":
            return t.reshape(B, g, g, H)
        return jnp.mean(t, axis=1)


def vit_tiny(features: str = "pooled") -> ViT:
    """Test-scale ViT (32px, 4x4 patches -> 8x8 grid, 2x64, 4 heads) — the
    transformer-family analog of TinyCNN: lets the e2e pipeline exercise a
    full ViT on CPU fixtures in milliseconds."""
    return ViT(
        features=features,
        input_size=32,
        patch_size=4,
        hidden_dim=64,
        num_layers=2,
        num_heads=4,
        mlp_dim=128,
    )
