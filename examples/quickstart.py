"""tpucap quickstart: synthetic data -> train -> caption -> BLEU.

Runs on CPU or TPU as available:

    python examples/quickstart.py
"""

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

root = tempfile.mkdtemp(prefix="tpucap_quickstart_")
img_dir, token_file, train_file, test_file = generate_fixture_dataset(
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
features = dict(zip(ids, pipe.extract_features(paths)))

pipe.fit(descriptions, features, epochs=40, log=None)

print("captions:")
for path, cap in zip(paths[:3], pipe.caption_images(paths[:3])):
    print(f"  {path.rsplit('/', 1)[-1]}: {cap}")
print("BLEU:", pipe.evaluate(descriptions, features, method="greedy"))

# Full-pipeline serving path (C++ JPEG decode -> device preprocess ->
# encoder -> beam), and a persistence round trip:
caps = pipe.caption_dataset(paths, batch_size=8)
pipe.save(f"{root}/bundle")
reloaded = CaptioningPipeline.load(f"{root}/bundle")
assert reloaded.generate(pipe.extract_features(paths[:1]))[0]
print("quickstart OK")
