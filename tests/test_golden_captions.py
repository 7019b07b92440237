"""Golden-caption reproducibility (SURVEY.md §4 integration test):
a pinned-seed train + decode run must reproduce the checked-in captions
and BLEU exactly. Regenerate goldens after an intentional numerics change
with: TPUCAP_REGEN_GOLDENS=1 python -m pytest tests/test_golden_captions.py
"""

import json
import os

import numpy as np
import pytest

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

GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_captions.json"
)


def run_pinned(tmp_path):
    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=8, image_size=32, seed=123
    )
    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)
    prepared = prepare_descriptions(desc, train_ids)

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
        decode=DecodeConfig(max_len=12),
        train=TrainConfig(batch_size=6, learning_rate=5e-3, seed=42),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    pipe.fit_tokenizer(prepared)
    pipe.build()
    paths = [f"{img_dir}/{i}.jpg" for i in train_ids]
    feats_arr = pipe.extract_features(paths, batch_size=6)
    feats = dict(zip(train_ids, feats_arr))
    pipe.fit(prepared, feats, epochs=25, log=None)

    greedy = pipe.generate(feats_arr, method="greedy")
    beam = pipe.generate(feats_arr, method="beam", beam_width=3)
    scores = pipe.evaluate(prepared, feats, method="greedy")
    return {
        "ids": train_ids,
        "greedy": greedy,
        "beam": beam,
        "bleu": {k: round(v, 6) for k, v in scores.items()},
    }


def test_pinned_seed_reproduces_goldens(tmp_path):
    result = run_pinned(tmp_path)
    # Absolute quality bar FIRST (VERDICT r1 #3): a trained model on the
    # fixture corpus must reach BLEU-4 ~0.48; this can't be silently
    # weakened by regenerating goldens from a broken run.
    assert result["bleu"]["bleu4"] > 0.40, (
        f"trained-model BLEU-4 gate failed: {result['bleu']}"
    )
    if os.environ.get("TPUCAP_REGEN_GOLDENS"):
        with open(GOLDEN, "w") as f:
            json.dump(result, f, indent=2)
        pytest.skip("goldens regenerated")
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert result["ids"] == golden["ids"]
    assert result["greedy"] == golden["greedy"]
    assert result["beam"] == golden["beam"]
    for k, v in golden["bleu"].items():
        np.testing.assert_allclose(result["bleu"][k], v, atol=1e-6)
