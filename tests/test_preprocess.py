"""Differential tests: preprocessing vs keras.applications numpy path."""

import numpy as np
import pytest

from tpucap.data.preprocess import load_image, preprocess_input

keras_iu = pytest.importorskip("keras.src.applications.imagenet_utils")


@pytest.mark.parametrize("mode", ["caffe", "tf", "torch"])
def test_preprocess_matches_keras(mode, rng):
    x = rng.uniform(0, 255, size=(2, 8, 8, 3)).astype(np.float32)
    ours = preprocess_input(x.copy(), mode)
    theirs = keras_iu.preprocess_input(x.copy(), mode=mode)
    np.testing.assert_allclose(ours, np.asarray(theirs), atol=1e-5)


def test_caffe_is_bgr_mean_subtract(rng):
    x = rng.uniform(0, 255, size=(4, 4, 3)).astype(np.float32)
    out = preprocess_input(x, "caffe")
    np.testing.assert_allclose(out[..., 0], x[..., 2] - 103.939, atol=1e-5)
    np.testing.assert_allclose(out[..., 2], x[..., 0] - 123.68, atol=1e-5)


def test_load_image_matches_keras_load_img(tmp_path, rng):
    from PIL import Image

    keras_img = pytest.importorskip("keras.src.utils.image_utils")

    arr = rng.integers(0, 255, size=(37, 53, 3)).astype(np.uint8)
    path = tmp_path / "x.png"
    Image.fromarray(arr).save(path)

    ours = load_image(path, target_size=(24, 24))
    theirs = keras_img.img_to_array(
        keras_img.load_img(path, target_size=(24, 24))
    )
    np.testing.assert_array_equal(ours, np.asarray(theirs))


def test_fixture_dataset_round_trip(tmp_path):
    from tpucap.data import (
        generate_fixture_dataset,
        load_descriptions,
        load_split,
        prepare_descriptions,
    )

    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32
    )
    desc = load_descriptions(token_file)
    assert len(desc) == 6
    assert all(len(v) == 5 for v in desc.values())

    train_ids = load_split(train_file)
    test_ids = load_split(test_file)
    assert len(train_ids) + len(test_ids) == 6

    prepared = prepare_descriptions(desc, train_ids)
    assert set(prepared) == set(train_ids)
    for caps in prepared.values():
        for c in caps:
            assert c.startswith("startseq ") and c.endswith(" endseq")

    img = load_image(f"{img_dir}/{train_ids[0]}.jpg", target_size=(32, 32))
    assert img.shape == (32, 32, 3)


def test_coco_annotations_parser(tmp_path):
    import json

    from tpucap.data.flickr8k import load_coco_annotations

    payload = {
        "images": [
            {"id": 42, "file_name": "COCO_val2014_000000000042.jpg"},
            {"id": 7, "file_name": "COCO_val2014_000000000007.jpg"},
        ],
        "annotations": [
            {"image_id": 42, "caption": "a cat on a mat"},
            {"image_id": 42, "caption": "feline resting"},
            {"image_id": 7, "caption": "a dog"},
        ],
    }
    p = tmp_path / "captions.json"
    p.write_text(json.dumps(payload))
    out = load_coco_annotations(p)
    assert out["COCO_val2014_000000000042"] == [
        "a cat on a mat",
        "feline resting",
    ]
    assert out["COCO_val2014_000000000007"] == ["a dog"]


def test_karpathy_json_parser(tmp_path):
    import json

    from tpucap.data import load_karpathy_json

    payload = {
        "dataset": "flickr8k",
        "images": [
            {
                "filename": "100.jpg",
                "split": "train",
                "sentences": [
                    {"raw": "A dog runs.", "tokens": ["a", "dog", "runs"]},
                    {"raw": "", "tokens": ["the", "dog"]},  # raw fallback
                ],
            },
            {
                "filename": "200.jpg",
                "split": "val",
                "sentences": [{"raw": "Two cats.", "tokens": ["two", "cats"]}],
            },
            {
                "filename": "300.jpg",
                "split": "test",
                "sentences": [{"raw": "A bird.", "tokens": ["a", "bird"]}],
            },
            {
                "filename": "400.jpg",
                "split": "restval",
                "sentences": [{"raw": "A fish.", "tokens": ["a", "fish"]}],
            },
        ],
    }
    p = tmp_path / "dataset_flickr8k.json"
    p.write_text(json.dumps(payload))

    desc, splits = load_karpathy_json(p)
    assert desc["100"] == ["A dog runs.", "the dog"]  # raw + token fallback
    assert desc["200"] == ["Two cats."]
    # restval folds into train by default (the 113k-COCO convention) ...
    assert splits["train"] == ["100", "400"]
    assert splits["val"] == ["200"]
    assert splits["test"] == ["300"]
    # ... and stays separate when asked.
    _, raw_splits = load_karpathy_json(p, restval_to_train=False)
    assert raw_splits["train"] == ["100"]
    assert raw_splits["restval"] == ["400"]

    # The split ids feed prepare_descriptions like any split file's.
    from tpucap.data import prepare_descriptions

    prepared = prepare_descriptions(desc, splits["train"])
    assert set(prepared) == {"100", "400"}
    for caps in prepared.values():
        for c in caps:
            assert c.startswith("startseq ") and c.endswith(" endseq")
