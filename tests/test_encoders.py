"""Differential tests: flax-functional encoders vs tf_keras.applications
with copied (random) weights — architecture-level parity without network
access (SURVEY.md §7 step 5)."""

import numpy as np
import pytest

from tpucap.checkpoint import params_from_keras
from tpucap.models.encoders import InceptionV3, ResNet50, TinyCNN, VGG16

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")


def _keras_feature_model(name):
    apps = tf_keras.applications
    if name == "vgg16":
        full = apps.VGG16(weights=None, include_top=True)
        return tf_keras.Model(full.input, full.get_layer("fc2").output), full
    if name == "resnet50":
        m = apps.ResNet50(weights=None, include_top=False, pooling="avg")
        return m, m
    if name == "inception_v3":
        m = apps.InceptionV3(weights=None, include_top=False, pooling="avg")
        return m, m
    raise ValueError(name)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,enc,atol",
    [
        ("vgg16", VGG16(), 5e-4),
        ("resnet50", ResNet50(), 5e-4),
        ("inception_v3", InceptionV3(), 5e-4),
    ],
)
def test_encoder_matches_keras(name, enc, atol, rng):
    feat_model, weight_model = _keras_feature_model(name)
    params = params_from_keras(weight_model, name)

    size = enc.input_size
    x = rng.normal(0, 1, size=(2, size, size, 3)).astype(np.float32)

    ref = feat_model(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))

    assert ours.shape == ref.shape == (2, enc.feature_dim)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-3)


@pytest.mark.slow
def test_vgg16_spatial_matches_keras(rng):
    full = tf_keras.applications.VGG16(weights=None, include_top=False)
    feat = tf_keras.Model(
        full.input, full.get_layer("block5_conv3").output
    )
    enc = VGG16(features="spatial")
    params = params_from_keras(full, "vgg16", features="spatial")
    x = rng.normal(0, 1, size=(1, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 14, 14, 512)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_tiny_cnn_shapes(rng):
    import jax

    enc = TinyCNN()
    params = enc.init(jax.random.key(0))
    x = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    out = np.asarray(enc.apply(params, x))
    assert out.shape == (3, 128)

    enc_sp = TinyCNN(features="spatial")
    out = np.asarray(enc_sp.apply(enc_sp.init(jax.random.key(0)), x))
    assert out.shape == (3, 4, 4, 128)


def test_encoder_init_shapes_match_keras_import():
    """init() must produce the same tree structure the importer emits."""
    import jax

    enc = VGG16()
    ours = enc.init(jax.random.key(0))
    full = tf_keras.applications.VGG16(weights=None, include_top=True)
    theirs = params_from_keras(full, "vgg16")
    assert set(ours) == set(theirs)
    for k in ours:
        for sub in ours[k]:
            assert ours[k][sub].shape == theirs[k][sub].shape, (k, sub)


@pytest.mark.slow
def test_inception_spatial_matches_keras(rng):
    """spatial mode == keras mixed7 output (17x17x768)."""
    m = tf_keras.applications.InceptionV3(weights=None, include_top=False)
    feat = tf_keras.Model(m.input, m.get_layer("mixed7").output)
    enc = InceptionV3(features="spatial")
    params = params_from_keras(m, "inception_v3")
    x = rng.normal(0, 1, size=(1, 299, 299, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 17, 17, 768)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_resnet_spatial_matches_keras(rng):
    """spatial mode == keras conv4 block output (14x14x1024)."""
    m = tf_keras.applications.ResNet50(weights=None, include_top=False)
    feat = tf_keras.Model(m.input, m.get_layer("conv4_block6_out").output)
    enc = ResNet50(features="spatial")
    params = params_from_keras(m, "resnet50")
    x = rng.normal(0, 1, size=(1, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 14, 14, 1024)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
