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


# Correlated-fixture vocabulary: caption words are a deterministic
# function of attributes rendered INTO the image, so a model must
# generalize image -> words (not memorize) to caption held-out images.
_C_COLORS = ["red", "green", "blue", "white"]
_C_RGB = {
    "red": (220, 40, 40),
    "green": (40, 200, 40),
    "blue": (40, 60, 220),
    "white": (230, 230, 230),
}
_C_SUBJECTS = ["dog", "cat", "bird", "horse"]
_C_FREQ = {"dog": 1, "cat": 3, "bird": 6, "horse": 12}  # stripe frequency
_C_VERBS = {"dog": "runs", "cat": "sits", "bird": "flies", "horse": "walks"}
_C_PLACES = {
    "red": "park",
    "green": "field",
    "blue": "beach",
    "white": "snow",
}


def _correlated_image(rng, size: int, color: str, subject: str) -> np.ndarray:
    """Top half: the caption's color as a solid patch. Bottom half:
    vertical stripes whose frequency encodes the subject. Mild noise
    makes every render unique, so a held-out image is a NEW view of a
    seen attribute combination — generalization, not memorization."""
    img = np.zeros((size, size, 3), np.float32)
    img[: size // 2] = _C_RGB[color]
    xx = np.arange(size, dtype=np.float32) / size
    stripes = 128 + 120 * np.sin(2 * np.pi * xx * _C_FREQ[subject])
    img[size // 2 :] = stripes[None, :, None]
    img += rng.normal(0, 10, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_correlated_dataset(
    root,
    *,
    n_images: int = 64,
    captions_per_image: int = 3,
    image_size: int = 32,
    seed: int = 0,
    train_frac: float = 0.75,
):
    """Image-conditioned fixture corpus for the HELD-OUT quality gate
    (VERDICT r2 weak #4): caption = f(color, subject) where both
    attributes are rendered into the image (_correlated_image), so
    held-out BLEU measures whether the model learned the image->word
    mapping — a regression the memorization golden test can't see.

    Attribute combinations cycle round-robin so the train split covers
    every combo; held-out images are fresh noisy renders of seen
    combos. Returns (image_dir, token_file, train_file, test_file)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    ids = [f"img{i:04d}" for i in range(n_images)]
    combos = [
        (c, s) for c in _C_COLORS for s in _C_SUBJECTS
    ]  # 16 combos; 64 images = 4 renders each
    token_lines = []
    for i, image_id in enumerate(ids):
        color, subject = combos[i % len(combos)]
        Image.fromarray(
            _correlated_image(rng, image_size, color, subject)
        ).save(os.path.join(img_dir, f"{image_id}.jpg"), quality=92)
        cap = (
            f"a {color} {subject} {_C_VERBS[subject]} "
            f"in the {_C_PLACES[color]}"
        )
        for c in range(captions_per_image):
            token_lines.append(f"{image_id}.jpg#{c}\t{cap}")

    token_file = os.path.join(root, "tokens.txt")
    with open(token_file, "w") as f:
        f.write("\n".join(token_lines) + "\n")
    # Interleaved split: train sees every combo, test gets fresh renders.
    n_train = max(1, int(n_images * train_frac))
    train_ids, test_ids = ids[:n_train], ids[n_train:]
    train_file = os.path.join(root, "train.txt")
    test_file = os.path.join(root, "test.txt")
    with open(train_file, "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in train_ids) + "\n")
    with open(test_file, "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in test_ids) + "\n")
    return img_dir, token_file, train_file, test_file


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
