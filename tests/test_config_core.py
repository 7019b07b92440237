"""Config presets + core mesh helper tests."""

import jax
import numpy as np
import pytest

from tpucap.config import PRESETS, Config
from tpucap.core import make_mesh, replicated_sharding, shard_batch
from tpucap.core.mesh import pad_to_multiple


def test_presets_cover_the_five_judged_configs():
    assert set(PRESETS) == {f"config{i}" for i in range(1, 6)}
    c1 = PRESETS["config1"]
    assert c1.encoder.name == "vgg16" and c1.decode.method == "greedy"
    c2 = PRESETS["config2"]
    assert c2.encoder.name == "inception_v3" and c2.decode.beam_width == 3
    assert c2.train.batch_size == 32
    c3 = PRESETS["config3"]
    assert c3.encoder.name == "resnet50" and c3.decoder.num_layers == 2
    assert c3.decode.beam_width == 5
    c4 = PRESETS["config4"]
    assert c4.decoder.name == "attention" and c4.encoder.features == "spatial"
    c5 = PRESETS["config5"]
    assert c5.train.batch_size == 256


def test_config_replace():
    c = Config().replace(vocab_size=123)
    assert c.vocab_size == 123
    assert Config().vocab_size != 123  # frozen original untouched


def test_make_mesh_sizes():
    mesh = make_mesh(4)
    assert mesh.shape == {"data": 4}
    with pytest.raises(ValueError):
        make_mesh(100)


def test_shard_batch_places_on_mesh():
    mesh = make_mesh(8)
    x = np.arange(16, dtype=np.float32).reshape(16, 1)
    sharded = shard_batch(mesh, x)
    assert sharded.shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(sharded), x)
    assert len(sharded.sharding.device_set) == 8


def test_replicated_sharding():
    mesh = make_mesh(8)
    s = replicated_sharding(mesh)
    x = jax.device_put(np.ones((4,)), s)
    assert len(x.sharding.device_set) == 8


def test_pad_to_multiple():
    assert pad_to_multiple(10, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(1, 8) == 8
