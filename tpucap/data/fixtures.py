"""Synthetic dataset generator (SURVEY.md §4 golden-artifact fixtures).

No network exists in this environment, so tests and benchmarks run on
generated data: deterministic tiny JPEGs + a toy caption corpus in Flickr8k
format (token file + split files). Seed-pinned so goldens are stable.
"""

from __future__ import annotations

import os

import numpy as np

_SUBJECTS = ["dog", "cat", "man", "woman", "child", "bird"]
_VERBS = ["runs", "jumps", "sits", "walks", "plays", "sleeps"]
_PLACES = ["park", "grass", "street", "beach", "room", "field"]
_COLORS = ["red", "blue", "green", "brown", "black", "white"]


def _caption(rng) -> str:
    return (
        f"a {rng.choice(_COLORS)} {rng.choice(_SUBJECTS)} "
        f"{rng.choice(_VERBS)} in the {rng.choice(_PLACES)}"
    )


def _image(rng, size: int) -> np.ndarray:
    """A deterministic color-gradient + noise image (JPEG-compressible)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.stack(
        [
            128 + 127 * np.sin(2 * np.pi * (xx * rng.uniform(0.5, 2.0))),
            128 + 127 * np.cos(2 * np.pi * (yy * rng.uniform(0.5, 2.0))),
            rng.uniform(0, 255) * np.ones_like(xx),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 12, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def generate_fixture_dataset(
    root,
    *,
    n_images: int = 16,
    captions_per_image: int = 5,
    image_size: int = 64,
    seed: int = 0,
    train_frac: float = 0.75,
):
    """Create <root>/images/*.jpg, tokens.txt, train.txt, test.txt.

    Returns (image_dir, token_file, train_split_file, test_split_file).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    ids = [f"img{i:04d}" for i in range(n_images)]
    token_lines = []
    for image_id in ids:
        Image.fromarray(_image(rng, image_size)).save(
            os.path.join(img_dir, f"{image_id}.jpg"), quality=90
        )
        for c in range(captions_per_image):
            token_lines.append(f"{image_id}.jpg#{c}\t{_caption(rng)}")

    token_file = os.path.join(root, "tokens.txt")
    with open(token_file, "w") as f:
        f.write("\n".join(token_lines) + "\n")

    n_train = max(1, int(n_images * train_frac))
    train_file = os.path.join(root, "train.txt")
    test_file = os.path.join(root, "test.txt")
    with open(train_file, "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in ids[:n_train]) + "\n")
    with open(test_file, "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in ids[n_train:]) + "\n")
    return img_dir, token_file, train_file, test_file
