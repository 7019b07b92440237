"""Every training parallelism on one page: dp / tp / pp / ep (+ 2-D).

Runs the same tiny captioning workload through all five strategies on an
8-device virtual CPU mesh, printing each final loss — the runnable
companion to docs/OPERATIONS.md "Choosing a TRAINING parallelism".
Every strategy is update-exact vs the single-device step (the contracts
live in tests/test_distributed.py, test_tp.py, test_pp.py, test_moe.py);
this script shows the public API shapes, not the proofs.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/parallel_training.py

On a real v5e-8 the identical code runs over ICI — only the mesh's
device list changes (and jax.distributed for multi-host, see
examples/multihost_launch.py).
"""

import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Force the 8-device virtual CPU mesh unconditionally: this example
# demonstrates the strategy APIs, and the default environment here may
# pin a single-chip TPU backend via sitecustomize (which ignores the
# env var — hence the jax.config override too). On a real 8-chip slice,
# delete this block and the same code runs over ICI.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    MeshConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer

CORPUS = [
    "startseq a black dog runs across the grass endseq",
    "startseq a man rides a red bicycle endseq",
    "startseq two children play in the park endseq",
    "startseq a woman climbs a rock wall endseq",
]


def build_pipe(decoder_cfg, model_devices=1):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=decoder_cfg,
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=8, epochs=3, seed=0),
        mesh=MeshConfig(model_devices=model_devices),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(CORPUS)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def fixture_data(rng):
    ids = [f"img{i}" for i in range(8)]
    desc = {i: [CORPUS[k % len(CORPUS)]] for k, i in enumerate(ids)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in ids}
    return desc, feats


def run(tag, pipe, parallelism):
    desc, feats = fixture_data(np.random.default_rng(0))
    hist = pipe.fit(desc, feats, parallelism=parallelism, log=None)
    print(f"{tag:>28}: loss {hist[0]['loss']:.3f} -> {hist[-1]['loss']:.3f}")


def main():
    assert jax.device_count() >= 8, (
        f"need 8 devices (got {jax.device_count()}); see the XLA_FLAGS "
        "header of this file"
    )
    lstm = DecoderConfig(name="lstm1", embed_dim=16, hidden_dim=32,
                         dropout_rate=0.0)
    tfm = DecoderConfig(name="transformer", hidden_dim=32, num_layers=8,
                        num_heads=2, mlp_dim=64, max_positions=16,
                        dropout_rate=0.0)
    moe = DecoderConfig(name="transformer", hidden_dim=32, num_layers=1,
                        num_heads=2, mlp_dim=64, max_positions=16,
                        dropout_rate=0.0, num_experts=8)

    # 1. Data parallel: batch sharded, psum'd grads. Works for EVERY
    # decoder family; the default.
    run("dp (merge-LSTM)", build_pipe(lstm), "dp")

    # 2. Tensor parallel: vocab-sharded CE, distributed logsumexp —
    # the (B, T, V) logits tensor never materializes on one device.
    run("tp (merge-LSTM)", build_pipe(lstm), "tp")

    # 3. 2-D batch x vocab.
    run("dp_tp 4x2", build_pipe(lstm, model_devices=2), "dp_tp")

    # 4. Pipeline parallel: the 8-layer transformer staged across all 8
    # devices, GPipe microbatching, activations ppermute'd over the ring.
    run("pp 8-stage (transformer)", build_pipe(tfm), "pp")

    # 5. 2-D batch x stage.
    run("dp_pp 4x2", build_pipe(
        DecoderConfig(name="transformer", hidden_dim=32, num_layers=2,
                      num_heads=2, mlp_dim=64, max_positions=16,
                      dropout_rate=0.0),
        model_devices=2,
    ), "dp_pp")

    # 6. Expert parallel: the MoE transformer's 8 experts sharded one
    # per device, dense top-k dispatch, one psum combine.
    run("ep 8-expert (MoE)", build_pipe(moe), "ep")

    # 7. 2-D batch x expert.
    run("dp_ep 4x2", build_pipe(
        DecoderConfig(name="transformer", hidden_dim=32, num_layers=1,
                      num_heads=2, mlp_dim=64, max_positions=16,
                      dropout_rate=0.0, num_experts=4),
        model_devices=2,
    ), "dp_ep")

    # 8. Sequence parallel: ring attention over an 8-way 'seq' axis —
    # token blocks local, K/V rotating via ppermute. fit auto-pads the
    # teacher-forced length (10) up to the next ring multiple (16).
    run("sp 8-ring (transformer)", build_pipe(
        DecoderConfig(name="transformer", hidden_dim=32, num_layers=1,
                      num_heads=2, mlp_dim=64, max_positions=20,
                      dropout_rate=0.0),
    ), "sp")

    print("all eight strategies trained through the public fit() surface")


if __name__ == "__main__":
    main()
