"""Caption cleaning — the reference's `clean_descriptions` stage.

Standard Flickr8k-genre cleaning (SURVEY.md §2.1 #3): lowercase, strip
punctuation, drop single-character words and words containing digits, then
wrap with ``startseq``/``endseq`` sentinels for teacher forcing. The filter
set mirrors the Keras tokenizer default so cleaning and tokenization agree.
"""

from __future__ import annotations

import string

START_TOKEN = "startseq"
END_TOKEN = "endseq"

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def clean_caption(caption: str) -> str:
    """Lowercase, de-punctuate, drop 1-char and numeric-containing words."""
    words = caption.split()
    words = [w.lower() for w in words]
    words = [w.translate(_PUNCT_TABLE) for w in words]
    words = [w for w in words if len(w) > 1]
    words = [w for w in words if w.isalpha()]
    return " ".join(words)


def wrap_caption(caption: str) -> str:
    """Add the start/end sentinels the decoder is trained on."""
    return f"{START_TOKEN} {caption} {END_TOKEN}"


def clean_descriptions(descriptions: dict[str, list[str]]) -> dict[str, list[str]]:
    """Clean every caption in an {image_id: [captions]} mapping in place."""
    for image_id, captions in descriptions.items():
        descriptions[image_id] = [clean_caption(c) for c in captions]
    return descriptions
