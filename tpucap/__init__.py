"""tpucap — a TPU-native image-captioning framework.

A brand-new JAX/XLA/Pallas rebuild of the capability surface of the
reference ``frosinastojanovska/image-captioning`` (a Keras-2 CNN-encoder +
LSTM-decoder Flickr8k captioning pipeline; see SURVEY.md for the full
component inventory this package implements):

- ``tpucap.text``    — Keras-parity tokenizer / padding / caption cleaning
- ``tpucap.data``    — dataset parsers, preprocessing, synthetic fixtures
- ``tpucap.models``  — flax encoder zoo (VGG16 / InceptionV3 / ResNet-50) and
                       decoder zoo (merge / inject / 2-layer / soft-attention)
- ``tpucap.decode``  — batched greedy and beam-search engines (lax.while_loop)
- ``tpucap.train``   — masked-CE teacher-forced training, BLEU evaluation
- ``tpucap.parallel``— mesh / shard_map data-parallel step with psum
- ``tpucap.ops``     — Pallas kernels + C++ JPEG decode extension
- ``tpucap.checkpoint`` — orbax checkpoint manager, Keras .h5 import
- ``tpucap.cli``     — extract / train / caption / evaluate / bench entry points
- ``tpucap.serve`` / ``tpucap.serve_http`` — micro-batching caption servers
- ``tpucap.client`` — stdlib Python SDK for the HTTP serving layer
"""

from tpucap.version import __version__

__all__ = ["__version__"]
