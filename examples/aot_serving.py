"""AOT deployment walkthrough: train -> export StableHLO bundle ->
serve from the artifact with ZERO model code.

The bundle contains serialized XLA programs (jax.export) for every
serving batch bucket, plus the tokenizer and params. The serving side
(AotCaptioner + CaptionServer/CaptionHTTPServer) never imports
tpucap.models or tpucap.decode — the programs ARE the model, pinned at
export time.

    python examples/aot_serving.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpucap.checkpoint import AotCaptioner, export_decode  # noqa: E402
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

root = tempfile.mkdtemp(prefix="tpucap_aot_")

# -- train a tiny model on synthetic fixtures (the quickstart flow) ------
img_dir, token_file, train_file, _ = generate_fixture_dataset(
    root, n_images=8, image_size=32
)
descriptions = prepare_descriptions(
    load_descriptions(token_file), load_split(train_file)
)
cfg = Config(
    encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
    decoder=DecoderConfig(embed_dim=16, hidden_dim=32, dropout_rate=0.0),
    decode=DecodeConfig(method="beam", beam_width=3, max_len=12),
    train=TrainConfig(batch_size=8, epochs=10, learning_rate=1e-2),
    precision="f32",
)
pipe = CaptioningPipeline(cfg)
pipe.fit_tokenizer(descriptions)
pipe.build()
paths = [f"{img_dir}/{i}.jpg" for i in descriptions]
feats = pipe.extract_features(paths, batch_size=8)
pipe.fit(descriptions, dict(zip(descriptions, feats)), log=None)

# -- export: one StableHLO program per serving bucket + encoder ---------
bundle = f"{root}/bundle"
manifest = export_decode(
    pipe,
    bundle,
    batch_size=8,
    ladder=True,          # programs for buckets 1, 2, 4, 8
    include_encoder=True,  # JPEG /caption path works too
)
print(
    f"exported {manifest['method']} programs for buckets "
    f"{manifest['batch_sizes']} targeting {manifest['platforms']}"
)

# -- serve from the artifact (no model code loads from here on) ---------
cap = AotCaptioner.load(bundle)
offline = cap.caption(np.asarray(feats[:5]))
live = pipe.generate(np.asarray(feats[:5]), method="beam")
assert offline == live, (offline, live)
print("artifact == live pipeline on", len(offline), "captions")

# The ordinary micro-batching server runs unchanged on the artifact:
from tpucap.serve import CaptionServer  # noqa: E402

with CaptionServer(cap, max_batch=8, max_delay_ms=2.0) as srv:
    futs = [srv.submit(np.asarray(feats[i])) for i in range(5)]
    served = [f.result(timeout=120) for f in futs]
assert served == live
print("micro-batched serving from the artifact:", served[0] or "(empty)")
print("ok")
