"""tpucap decode-quality toolkit tour: one tiny trained model, every
decode dial — greedy/beam/sampling, n-best lists, length penalties,
min_len, bad_words, no-repeat-ngram, forced-prefix completion, diverse
beam, MBR reranking.

Runs on CPU or TPU as available:

    JAX_PLATFORMS=cpu python examples/decode_toolkit.py
"""

import os
import sys

if "JAX_PLATFORMS" in os.environ:
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import tempfile

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.data import (
    generate_fixture_dataset,
    load_descriptions,
    load_split,
    prepare_descriptions,
)
from tpucap.pipeline import CaptioningPipeline

root = tempfile.mkdtemp(prefix="tpucap_toolkit_")
img_dir, token_file, train_file, _ = generate_fixture_dataset(
    root, n_images=8, image_size=32
)
descriptions = prepare_descriptions(
    load_descriptions(token_file), load_split(train_file)
)

config = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
    decoder=DecoderConfig(name="lstm1", embed_dim=16, hidden_dim=32,
                          dropout_rate=0.0),
    decode=DecodeConfig(method="beam", beam_width=3, max_len=12),
    train=TrainConfig(batch_size=8, learning_rate=5e-3),
)
pipe = CaptioningPipeline(config)
pipe.fit_tokenizer(descriptions)
pipe.build()

ids = list(descriptions)
paths = [f"{img_dir}/{i}.jpg" for i in ids]
feats = pipe.extract_features(paths[:2])
pipe.fit(descriptions, dict(zip(ids, pipe.extract_features(paths))),
         epochs=40, log=None)

print("greedy:        ", pipe.generate(feats, method="greedy"))
print("beam 3:        ", pipe.generate(feats, method="beam"))
print("sample t=0.8:  ", pipe.generate(feats, method="sample",
                                       temperature=0.8, top_p=0.9,
                                       seed=7))

# n-best lists: the engine's full beam set, best-first.
for cap, score in pipe.generate_n_best(feats[:1], n=3)[0]:
    print(f"n-best:         {score:7.3f}  {cap}")

# Forced-prefix completion ("continue this caption"): mixed per-row
# prefixes batch into one program; "" rows decode from scratch.
vocab_word = next(
    w for w in pipe.tokenizer.word_index
    if w not in ("startseq", "endseq")
)
print(f"prefix {vocab_word!r}:",
      pipe.generate_continuation(feats, [vocab_word, ""], method="beam"))

# Diverse beam: G groups pushed off each other's word choices.
for g, (cap, score) in enumerate(pipe.generate_diverse(
        feats[:1], num_groups=2, group_width=2, diversity=0.7)[0]):
    print(f"diverse group {g}: {score:7.3f}  {cap}")

# MBR / consensus reranking over a sampled pool.
print("mbr (cider):   ",
      pipe.generate_mbr(feats[:1], n_candidates=4, metric="cider"))

# Config-level dials ride every engine (incl. the serving layers):
# a GNMT length penalty, a 4-token length floor, a blocklist word,
# and bigram no-repeat blocking.
banned = sorted(pipe.tokenizer.word_index)[-1]
dialed = dataclasses.replace(
    config,
    decode=dataclasses.replace(
        config.decode,
        length_penalty="gnmt",
        min_len=4,
        bad_words=(banned,),
        no_repeat_ngram_size=2,
    ),
)
pipe2 = CaptioningPipeline(dialed, tokenizer=pipe.tokenizer)
pipe2.build()
pipe2.params = pipe.params
caps = pipe2.generate(feats, method="beam")
print(f"dialed (no {banned!r}, min 4, gnmt, no-repeat-2gram):", caps)
for c in caps:
    ws = c.split()
    assert banned not in ws
    bigrams = [tuple(ws[i:i + 2]) for i in range(len(ws) - 1)]
    assert len(bigrams) == len(set(bigrams))
print("decode toolkit OK")
