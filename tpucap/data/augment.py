"""On-device image augmentation for encoder fine-tuning.

The reference cannot augment at all: its CNN is frozen behind one-shot
feature extraction (SURVEY.md §2.1 #2), so every epoch sees identical
features. Fine-tuning (train/finetune.py) puts the encoder INSIDE the
step, which makes augmentation meaningful again — and on TPU it belongs
inside the jitted step (pure jax.random ops on the already-transferred
batch), not in the host input pipeline: zero extra host->device traffic,
a fresh draw per step from the step's PRNG, and XLA fuses the flips and
shifts into the encoder's first convolution's input processing.

Ops are restricted to ones that COMMUTE with the per-encoder
preprocessing already applied to the batch (caffe BGR mean-subtract /
tf scaling — data/preprocess.py): horizontal flip and reflect-padded
random translation are pixel PERMUTATIONS, so augment-then-normalize
equals normalize-then-augment exactly. Photometric jitter would have to
run before normalization and is deliberately not offered here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_images(
    images,
    rng,
    *,
    flip: bool = True,
    max_shift: int = 0,
):
    """(B, H, W, C) -> (B, H, W, C), randomly flipped/shifted per image.

    flip: per-image horizontal mirror with probability 1/2 (safe for
    captioning despite left/right words — Flickr8k-genre captions are
    overwhelmingly orientation-free, and the standard SAT/Show-and-Tell
    recipes flip).
    max_shift: per-image integer translation, dx/dy drawn uniformly from
    [-max_shift, max_shift], reflect-padded so no synthetic border value
    enters the (mean-subtracted) distribution.

    Pure function of (images, rng): jit/vmap/shard_map-safe, same key ->
    same batch. Cost is a handful of VPU ops — invisible next to the
    encoder matmuls it feeds.
    """
    if not flip and max_shift == 0:
        return images
    B, H, W, _ = images.shape
    k_flip, k_dx, k_dy = jax.random.split(rng, 3)
    if flip:
        do = jax.random.bernoulli(k_flip, 0.5, (B,))
        images = jnp.where(
            do[:, None, None, None], images[:, :, ::-1, :], images
        )
    if max_shift:
        if max_shift >= min(H, W):
            raise ValueError(
                f"max_shift {max_shift} must be smaller than the "
                f"image ({H}x{W})"
            )
        pad = max_shift
        padded = jnp.pad(
            images,
            ((0, 0), (pad, pad), (pad, pad), (0, 0)),
            mode="reflect",
        )
        dx = jax.random.randint(k_dx, (B,), 0, 2 * pad + 1)
        dy = jax.random.randint(k_dy, (B,), 0, 2 * pad + 1)

        def crop(img, ox, oy):
            return jax.lax.dynamic_slice(
                img, (oy, ox, 0), (H, W, img.shape[-1])
            )

        images = jax.vmap(crop)(padded, dx, dy)
    return images


def make_augment_fn(*, flip: bool = True, max_shift: int = 0):
    """-> augment_fn(images, rng) for train/finetune.py's ``augment_fn``
    hook (None when every op is off, so the step compiles augmentation-
    free)."""
    if not flip and max_shift == 0:
        return None

    def fn(images, rng):
        return augment_images(
            images, rng, flip=flip, max_shift=max_shift
        )

    return fn
