"""BN folding: folded params must reproduce unfolded outputs exactly
(up to float rounding)."""

import jax
import numpy as np
import pytest

from tpucap.models.encoders import InceptionV3, ResNet50
from tpucap.models.encoders.fold_bn import fold_batch_norms


def randomize_bn(params, rng):
    """Give BN stats non-trivial values so folding is actually exercised."""

    def visit(p):
        if isinstance(p, dict):
            if "mean" in p and "var" in p:
                p["mean"] = rng.normal(0, 0.5, p["mean"].shape).astype(
                    np.float32
                )
                p["var"] = rng.uniform(0.5, 2.0, p["var"].shape).astype(
                    np.float32
                )
                p["beta"] = rng.normal(0, 0.2, p["beta"].shape).astype(
                    np.float32
                )
                if "gamma" in p:
                    p["gamma"] = rng.uniform(
                        0.8, 1.2, p["gamma"].shape
                    ).astype(np.float32)
            else:
                for v in p.values():
                    visit(v)

    visit(params)
    return params


@pytest.mark.parametrize(
    "enc,size",
    [(InceptionV3(), 299), (ResNet50(), 224)],
    ids=["inception_v3", "resnet50"],
)
def test_folded_matches_unfolded(enc, size, rng):
    params = enc.init(jax.random.key(0))
    params = jax.tree_util.tree_map(np.asarray, params)
    params = randomize_bn(params, rng)

    x = rng.normal(0, 1, size=(1, size, size, 3)).astype(np.float32)
    ref = np.asarray(enc.apply(params, x))

    folded = fold_batch_norms(
        "inception_v3" if size == 299 else "resnet50", params
    )
    out = np.asarray(enc.apply(folded, x))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_fold_noop_for_vgg():
    p = {"block1_conv1": {"kernel": np.zeros((3, 3, 3, 4))}}
    assert fold_batch_norms("vgg16", p) is p
