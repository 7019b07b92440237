"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the real `shard_map` /
`jax.sharding.Mesh` data-parallel code paths execute without TPU hardware
(the SURVEY.md §4 "distributed-without-a-cluster" idiom). Environment
variables must be set before jax initializes its backends, hence the
os.environ writes at import time.
"""

import os
import re

# The driver environment pins JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize hook force-registers the axon backend at interpreter start,
# overriding the env var — so the config must be reset through jax.config
# below, not just the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
# Strip any pre-existing forced device count (e.g. leaked from a driver
# run with a different mesh size) rather than keeping it: every mesh test
# here asserts exactly 8 virtual devices.
_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()
# Keep TF (used only as a differential-test oracle) quiet and off any GPU/TPU.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_corpus():
    """A small deterministic caption corpus (no network / no Flickr8k)."""
    return [
        "startseq a black dog runs across the green grass endseq",
        "startseq a dog is running on grass endseq",
        "startseq two children play soccer in the park endseq",
        "startseq a child kicks a ball endseq",
        "startseq a man rides a red bicycle down the street endseq",
        "startseq the man is riding his bike endseq",
        "startseq a woman in a blue shirt climbs a rock wall endseq",
        "startseq a climber scales the rock face endseq",
    ]


# ---------------------------------------------------------------------------
# Cumulative-state hygiene for the full one-process suite.
#
# Two back-to-back full-suite runs (r4) segfaulted inside XLA's CPU
# compiler at ~99% — the same late-file `fit` compile both times —
# after ~1h of accumulated in-process state: hundreds of compiled
# executables, tf_keras oracles, servers, loader threads. Clearing
# JAX's executable/tracing caches at module boundaries bounds the live
# compiled-program set to roughly one file's worth. Cost: re-compiles
# for the few programs shared across files (small, CPU) — a price
# worth paying for a suite that cannot crash the interpreter at 99%.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    import gc

    try:
        jax.clear_caches()
    except Exception:
        pass
    gc.collect()
