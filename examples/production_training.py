"""Production training recipe: every training/serving dial in one run.

Demonstrates, on synthetic fixtures, the knobs a production run
composes — none of which exist in the reference:

- mixed-precision bf16 training (f32 master weights),
- gradient accumulation (exact full-batch update at 1/A memory),
- EMA weight shadowing + post-hoc checkpoint averaging,
- decode-metric validation monitoring (CIDEr-keyed best checkpoint),
- n-best beam lists, length floor, GNMT length penalty,
- full metric panel (BLEU / CIDEr-D / ROUGE-L / METEOR).

    python examples/production_training.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpucap.checkpoint import CheckpointManager  # noqa: E402
from tpucap.config import (  # noqa: E402
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.data import (  # noqa: E402
    generate_fixture_dataset,
    load_descriptions,
    load_split,
    prepare_descriptions,
)
from tpucap.pipeline import CaptioningPipeline  # noqa: E402

root = tempfile.mkdtemp(prefix="tpucap_prod_")
img_dir, token_file, train_file, test_file = generate_fixture_dataset(
    root, n_images=12, image_size=32
)
train_desc = prepare_descriptions(
    load_descriptions(token_file), load_split(train_file)
)
test_desc = prepare_descriptions(
    load_descriptions(token_file), load_split(test_file)
)

cfg = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
    decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
    decode=DecodeConfig(
        method="beam", beam_width=3, max_len=12,
        length_penalty="gnmt", alpha=0.7, min_len=2,
    ),
    train=TrainConfig(
        batch_size=8,
        learning_rate=1e-2,
        epochs=12,
        precision="bf16",        # bf16 compute, f32 master weights
        grad_accum_steps=2,      # exact full-batch update, half memory
        ema_decay=0.9,           # shadow weights for serving
        val_metric="cider",      # best-checkpoint keyed on dev CIDEr
    ),
    precision="f32",
)
pipe = CaptioningPipeline(cfg)
pipe.fit_tokenizer(train_desc)
pipe.build()

paths = [f"{img_dir}/{i}.jpg" for i in train_desc]
feats = dict(zip(train_desc, pipe.extract_features(paths, batch_size=8)))
test_paths = [f"{img_dir}/{i}.jpg" for i in test_desc]
test_feats = dict(
    zip(test_desc, pipe.extract_features(test_paths, batch_size=8))
)

mgr = CheckpointManager(
    f"{root}/ckpt", best_metric="val_cider", best_mode="max",
    async_save=True,  # overlap writes with the next epoch
)
pipe.fit(
    train_desc, feats,
    val_data=(test_desc, test_feats),
    checkpoint_manager=mgr,
    log=None,
)
mgr.close()

scores = pipe.evaluate(
    test_desc, test_feats, batch_size=8,
    metrics=("bleu", "cider", "rouge_l", "meteor"),
)
print("final-epoch weights:", {k: round(v, 3) for k, v in scores.items()})

# Post-hoc checkpoint averaging — works on any finished run.
pipe.use_averaged_weights(f"{root}/ckpt", last_k=2)
avg_scores = pipe.evaluate(
    test_desc, test_feats, batch_size=8, metrics=("bleu", "cider")
)
print("averaged weights:   ", {k: round(v, 3) for k, v in avg_scores.items()})

# n-best lists for the first two test images.
rows = np.stack([test_feats[i] for i in list(test_desc)[:2]])
for img, nbest in zip(list(test_desc)[:2], pipe.generate_n_best(rows)):
    print(img, [(c or "(empty)", round(s, 2)) for c, s in nbest])
print("ok")
