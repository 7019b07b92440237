"""Data layer: parsers, preprocessing, fixtures, input pipeline."""

from tpucap.data.preprocess import (
    preprocess_input,
    load_image,
    preprocess_batch,
)
from tpucap.data.flickr8k import (
    load_coco_annotations,
    load_descriptions,
    load_descriptions_json,
    load_karpathy_json,
    load_split,
    prepare_descriptions,
)
from tpucap.data.fixtures import (
    generate_correlated_dataset,
    generate_fixture_dataset,
)

__all__ = [
    "preprocess_input",
    "load_image",
    "preprocess_batch",
    "load_coco_annotations",
    "load_descriptions",
    "load_descriptions_json",
    "load_karpathy_json",
    "load_split",
    "prepare_descriptions",
    "generate_fixture_dataset",
    "generate_correlated_dataset",
]
