"""Text layer: Keras-parity tokenizer, padding, and caption cleaning.

Replaces the reference's dependency on ``tf_keras.preprocessing.text.Tokenizer``
and ``keras.utils.pad_sequences`` (SURVEY.md §2.1 #3-4, §2.2) with pure-Python /
numpy implementations whose semantics are bit-identical — verified by
differential tests against tf_keras in tests/test_tokenizer.py.
"""

from tpucap.text.tokenizer import Tokenizer, text_to_word_sequence
from tpucap.text.bpe import BpeTokenizer, load_tokenizer
from tpucap.text.padding import pad_sequences, to_categorical
from tpucap.text.clean import clean_caption, clean_descriptions, wrap_caption
from tpucap.text.embeddings import build_embedding_matrix, load_word_vectors

__all__ = [
    "Tokenizer",
    "BpeTokenizer",
    "load_tokenizer",
    "build_embedding_matrix",
    "load_word_vectors",
    "text_to_word_sequence",
    "pad_sequences",
    "to_categorical",
    "clean_caption",
    "clean_descriptions",
    "wrap_caption",
]
