"""Differential tests: flax-functional encoders vs tf_keras.applications
with copied (random) weights — architecture-level parity without network
access (SURVEY.md §7 step 5). The tf_keras model builds are expensive, so
each architecture is built once per module and shared between the pooled
and spatial tests."""

import numpy as np
import pytest

from tpucap.checkpoint import params_from_keras
from tpucap.models.encoders import InceptionV3, ResNet50, TinyCNN, VGG16

tf = pytest.importorskip("tensorflow")
tf_keras = pytest.importorskip("tf_keras")


@pytest.fixture(scope="module")
def keras_vgg16():
    return tf_keras.applications.VGG16(weights=None, include_top=True)


@pytest.fixture(scope="module")
def keras_resnet50():
    return tf_keras.applications.ResNet50(weights=None, include_top=False)


@pytest.fixture(scope="module")
def keras_inception():
    return tf_keras.applications.InceptionV3(weights=None, include_top=False)


def _pooled(model):
    import tf_keras.layers as L

    return tf_keras.Model(
        model.input, L.GlobalAveragePooling2D()(model.output)
    )


@pytest.mark.slow
def test_vgg16_matches_keras(keras_vgg16, rng):
    feat = tf_keras.Model(
        keras_vgg16.input, keras_vgg16.get_layer("fc2").output
    )
    enc = VGG16()
    params = params_from_keras(keras_vgg16, "vgg16")
    x = rng.normal(0, 1, size=(2, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == ref.shape == (2, 4096)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_vgg16_spatial_matches_keras(keras_vgg16, rng):
    feat = tf_keras.Model(
        keras_vgg16.input, keras_vgg16.get_layer("block5_conv3").output
    )
    enc = VGG16(features="spatial")
    params = params_from_keras(keras_vgg16, "vgg16", features="spatial")
    x = rng.normal(0, 1, size=(1, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 14, 14, 512)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_resnet50_matches_keras(keras_resnet50, rng):
    feat = _pooled(keras_resnet50)
    enc = ResNet50()
    params = params_from_keras(keras_resnet50, "resnet50")
    x = rng.normal(0, 1, size=(2, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_resnet_spatial_matches_keras(keras_resnet50, rng):
    """spatial mode == keras conv4 block output (14x14x1024)."""
    feat = tf_keras.Model(
        keras_resnet50.input,
        keras_resnet50.get_layer("conv4_block6_out").output,
    )
    enc = ResNet50(features="spatial")
    params = params_from_keras(keras_resnet50, "resnet50")
    x = rng.normal(0, 1, size=(1, 224, 224, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 14, 14, 1024)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_inception_matches_keras(keras_inception, rng):
    feat = _pooled(keras_inception)
    enc = InceptionV3()
    params = params_from_keras(keras_inception, "inception_v3")
    x = rng.normal(0, 1, size=(2, 299, 299, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_inception_spatial_matches_keras(keras_inception, rng):
    """spatial mode == keras mixed7 output (17x17x768)."""
    feat = tf_keras.Model(
        keras_inception.input, keras_inception.get_layer("mixed7").output
    )
    enc = InceptionV3(features="spatial")
    params = params_from_keras(keras_inception, "inception_v3")
    x = rng.normal(0, 1, size=(1, 299, 299, 3)).astype(np.float32)
    ref = feat(tf.constant(x), training=False).numpy()
    ours = np.asarray(enc.apply(params, x))
    assert ours.shape == (1, 17, 17, 768)
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


def test_encoder_init_shapes_match_keras_import(keras_vgg16):
    """init() must produce the same tree structure the importer emits."""
    import jax

    enc = VGG16()
    ours = enc.init(jax.random.key(0))
    theirs = params_from_keras(keras_vgg16, "vgg16")
    assert set(ours) == set(theirs)
    for k in ours:
        for sub in ours[k]:
            assert ours[k][sub].shape == theirs[k][sub].shape, (k, sub)


@pytest.mark.parametrize(
    "name,size",
    [
        ("vgg16", 224),
        ("resnet50", 224),
        ("resnet50", 256),
        ("inception_v3", 299),
        ("tiny_cnn", 32),
        ("vit_b16", 224),
        ("vit_tiny", 32),
    ],
)
def test_spatial_positions_matches_apply(name, size):
    """encoder.spatial_positions (the serving request-shape contract)
    must equal the ACTUAL flattened grid of apply() in spatial mode —
    checked shape-only via eval_shape (no compute/params materialized),
    including a non-default input_size."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpucap.models.encoders import build_encoder

    enc = build_encoder(name, features="spatial")
    if size != enc.input_size:
        enc = dataclasses.replace(enc, input_size=size)
    params = jax.eval_shape(enc.init, jax.random.key(0))
    out = jax.eval_shape(
        enc.apply,
        params,
        jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32),
    )
    assert out.shape[1] * out.shape[2] == enc.spatial_positions, out.shape
