"""Reference-API compatibility layer.

Function-for-function mirror of the reference's public script surface
(SURVEY.md §2.1, provisional names tagged [R] there), implemented on the
TPU-native engines, so code written against the reference can port by
changing one import. The signatures follow the genre-standard shapes:

    load_doc, load_set, load_descriptions, clean_descriptions,
    load_clean_descriptions, to_vocabulary, save_descriptions,
    extract_features, create_tokenizer, max_length, create_sequences,
    define_model, word_for_id, generate_desc, beam_search_desc,
    evaluate_model

Performance note: generate_desc / beam_search_desc accept a single image's
feature like the reference, but are thin wrappers over the batched on-device
engines — for throughput use tpucap.pipeline.CaptioningPipeline.generate on
whole batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpucap.data.flickr8k import load_descriptions as _load_descriptions
from tpucap.decode import beam_decode, greedy_decode, ids_to_captions
from tpucap.text import Tokenizer
from tpucap.text.clean import END_TOKEN, START_TOKEN, clean_descriptions
from tpucap.text.padding import to_categorical
from tpucap.train.evaluate import evaluate_captions
from tpucap.train.sequences import build_prefix_samples

__all__ = [
    "load_doc",
    "load_set",
    "load_descriptions",
    "clean_descriptions",
    "load_clean_descriptions",
    "save_descriptions",
    "to_vocabulary",
    "extract_features",
    "create_tokenizer",
    "max_length",
    "create_sequences",
    "define_model",
    "word_for_id",
    "generate_desc",
    "beam_search_desc",
    "evaluate_model",
]


# -- corpus handling (reference layer A) -----------------------------------


def load_doc(filename) -> str:
    with open(filename) as f:
        return f.read()


def load_set(filename) -> set[str]:
    """Split file -> set of image ids (no extension)."""
    ids = set()
    for line in load_doc(filename).split("\n"):
        if line.strip():
            ids.add(line.split(".")[0])
    return ids


def load_descriptions(doc_or_path) -> dict[str, list[str]]:
    """Token file (path or contents) -> {image_id: [raw captions]}."""
    import os

    if isinstance(doc_or_path, str) and not os.path.exists(doc_or_path):
        # Treat as file contents (the reference passes load_doc output).
        out: dict[str, list[str]] = {}
        for line in doc_or_path.split("\n"):
            line = line.strip()
            if not line:
                continue
            tag, _, caption = line.partition("\t")
            if not caption:
                parts = line.split()
                tag, caption = parts[0], " ".join(parts[1:])
            image_id = tag.split("#")[0].rsplit(".", 1)[0]
            out.setdefault(image_id, []).append(caption)
        return out
    return _load_descriptions(doc_or_path)


def load_clean_descriptions(filename, dataset) -> dict[str, list[str]]:
    """Reference artifact: 'id w1 w2 ...' lines -> wrapped descriptions."""
    out: dict[str, list[str]] = {}
    for line in load_doc(filename).split("\n"):
        tokens = line.split()
        if len(tokens) < 2:
            continue
        image_id, caption = tokens[0], " ".join(tokens[1:])
        if image_id in dataset:
            out.setdefault(image_id, []).append(
                f"{START_TOKEN} {caption} {END_TOKEN}"
            )
    return out


def save_descriptions(descriptions, filename) -> None:
    lines = [
        f"{image_id} {c}"
        for image_id, caps in descriptions.items()
        for c in caps
    ]
    with open(filename, "w") as f:
        f.write("\n".join(lines))


def to_vocabulary(descriptions) -> set[str]:
    vocab: set[str] = set()
    for caps in descriptions.values():
        for c in caps:
            vocab.update(c.split())
    return vocab


# -- features / tokenizer ---------------------------------------------------


def extract_features(directory, encoder: str = "vgg16", batch_size: int = 32):
    """Run the encoder over every .jpg in a directory -> {id: feature}.

    Reference: per-image model.predict (SURVEY.md §3.1); here batched on
    device. Encoder weights are random-initialized unless imported
    separately (no network access in this environment)."""
    import glob
    import os

    from tpucap.models.encoders import build_encoder
    from tpucap.data.preprocess import preprocess_batch

    enc = build_encoder(encoder)
    params = enc.init(jax.random.key(0))
    apply = jax.jit(enc.apply)
    paths = sorted(glob.glob(os.path.join(str(directory), "*.jpg")))
    features = {}
    for s in range(0, len(paths), batch_size):
        chunk = paths[s : s + batch_size]
        x = preprocess_batch(
            chunk, size=enc.input_size, mode=enc.preprocess_mode
        )
        out = np.asarray(apply(params, x))
        for p, f in zip(chunk, out):
            features[os.path.splitext(os.path.basename(p))[0]] = f
    return features


def create_tokenizer(descriptions) -> Tokenizer:
    lines = [c for caps in descriptions.values() for c in caps]
    tok = Tokenizer()
    tok.fit_on_texts(lines)
    return tok


def max_length(descriptions) -> int:
    return max(
        len(c.split()) for caps in descriptions.values() for c in caps
    )


def create_sequences(tokenizer, max_len, descriptions, photos, vocab_size=None):
    """Reference training-sample builder: per-prefix samples with pre-padded
    inputs and one-hot targets (SURVEY.md §2.1 #5)."""
    vocab_size = vocab_size or tokenizer.vocab_size
    X1, X2, y = build_prefix_samples(
        tokenizer, descriptions, photos, max_len
    )
    return X1, X2, to_categorical(y, num_classes=vocab_size)


# -- model / generation -----------------------------------------------------


def define_model(vocab_size, max_len, feature_dim: int = 4096, seed: int = 0):
    """The reference's merge model as (decoder, params).

    Returns the tpucap equivalents instead of a keras.Model; pass the pair
    to generate_desc / beam_search_desc / evaluate_model below.
    """
    from tpucap.models.decoders import build_decoder

    decoder = build_decoder(
        "lstm1", vocab_size=vocab_size, feature_dim=feature_dim
    )
    params = decoder.init(jax.random.key(seed))
    return decoder, params


def word_for_id(integer, tokenizer):
    return tokenizer.word_for_id(integer)


def _ids(tokenizer):
    return tokenizer.word_index[START_TOKEN], tokenizer.word_index[END_TOKEN]


def generate_desc(model, tokenizer, photo, max_len) -> str:
    """Greedy caption for one photo feature; returns the reference's
    'startseq ... endseq' string."""
    decoder, params = model
    start_id, end_id = _ids(tokenizer)
    feats = jnp.asarray(np.asarray(photo)[None])
    res = greedy_decode(
        decoder.step,
        params,
        decoder.init_state(params, feats),
        start_id=start_id,
        end_id=end_id,
        max_len=max_len,
    )
    [body] = ids_to_captions(tokenizer, res.tokens, res.lengths, end_id=end_id)
    return f"{START_TOKEN} {body} {END_TOKEN}".replace("  ", " ")


def beam_search_desc(model, tokenizer, photo, max_len, beam_width=3) -> str:
    decoder, params = model
    start_id, end_id = _ids(tokenizer)
    feats = jnp.asarray(np.asarray(photo)[None])
    res = beam_decode(
        decoder.step,
        params,
        decoder.init_state(params, feats),
        start_id=start_id,
        end_id=end_id,
        max_len=max_len,
        beam_width=beam_width,
    )
    [body] = ids_to_captions(tokenizer, res.tokens, res.lengths, end_id=end_id)
    return f"{START_TOKEN} {body} {END_TOKEN}".replace("  ", " ")


def evaluate_model(model, descriptions, photos, tokenizer, max_len,
                   beam_width=None):
    """Generate for every image and print BLEU-1..4 (reference §3.5)."""
    decoder, params = model
    start_id, end_id = _ids(tokenizer)
    ids = list(descriptions.keys())
    feats = jnp.asarray(np.stack([np.asarray(photos[i]) for i in ids]))
    state = decoder.init_state(params, feats)
    if beam_width:
        res = beam_decode(
            decoder.step, params, state,
            start_id=start_id, end_id=end_id, max_len=max_len,
            beam_width=beam_width,
        )
    else:
        res = greedy_decode(
            decoder.step, params, state,
            start_id=start_id, end_id=end_id, max_len=max_len,
        )
    caps = ids_to_captions(tokenizer, res.tokens, res.lengths, end_id=end_id)
    # The reference computes corpus BLEU over the *wrapped* captions —
    # startseq/endseq count as tokens on both sides (SURVEY.md §3.5);
    # tpucap.pipeline.evaluate strips them instead (the cleaner metric).
    generated = {
        i: f"{START_TOKEN} {c} {END_TOKEN}" for i, c in zip(ids, caps)
    }
    scores = evaluate_captions(
        descriptions, generated, strip_sentinels=False
    )
    print(f"BLEU-1: {scores['bleu1']:.6f}")
    print(f"BLEU-2: {scores['bleu2']:.6f}")
    print(f"BLEU-3: {scores['bleu3']:.6f}")
    print(f"BLEU-4: {scores['bleu4']:.6f}")
    return scores
