"""Checkpoint averaging (CheckpointManager.average_params /
pipeline.use_averaged_weights / CLI --average-last): the uniform mean of
retained checkpoints' params, hand-checked and wired end-to-end."""

import jax
import numpy as np
import optax
import pytest

from tpucap.checkpoint import CheckpointManager
from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer
from tpucap.train import TrainState


def _state(params):
    return TrainState.create(params, optax.sgd(0.1), jax.random.key(0))


def test_average_params_hand_math(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    a = {"w": np.asarray([1.0, 3.0], np.float32), "n": np.asarray(7)}
    b = {"w": np.asarray([3.0, 5.0], np.float32), "n": np.asarray(9)}
    sa, sb = _state(a), _state(b)
    sb = TrainState(
        step=sa.step + 1, params=b, opt_state=sb.opt_state, rng=sb.rng
    )
    mgr.save(sa)
    mgr.save(sb)
    assert mgr.all_steps() == [0, 1]
    avg = mgr.average_params(_state(a))
    np.testing.assert_allclose(np.asarray(avg["w"]), [2.0, 4.0])
    # Non-float leaves come from the NEWEST step, not an average.
    assert int(avg["n"]) == 9
    # last_k=1 is just the newest checkpoint.
    solo = mgr.average_params(_state(a), last_k=1)
    np.testing.assert_allclose(np.asarray(solo["w"]), [3.0, 5.0])
    with pytest.raises(ValueError, match="not among retained"):
        mgr.average_params(_state(a), steps=[0, 5])
    mgr.close()


def test_average_params_empty_dir_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    with pytest.raises(FileNotFoundError):
        mgr.average_params(_state({"w": np.zeros(1, np.float32)}))
    mgr.close()


def make_pipe(toy_corpus):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(embed_dim=8, hidden_dim=16, dropout_rate=0.0),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=8, learning_rate=1e-2, seed=0),
        precision="f32",
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def test_pipeline_use_averaged_weights(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus)
    desc = {f"i{k}": [toy_corpus[k]] for k in range(8)}
    feats = {i: rng.normal(size=(128,)).astype(np.float32) for i in desc}
    mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    pipe.fit(desc, feats, epochs=3, checkpoint_manager=mgr, log=None)
    mgr.close()

    from tpucap.train import build_optimizer

    mgr2 = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    # The restore template's opt_state must match what fit saved.
    fresh = TrainState.create(
        pipe.params["decoder"],
        build_optimizer(pipe.config.train),
        jax.random.key(0),
    )
    want = mgr2.average_params(fresh, last_k=2)
    mgr2.close()

    replaced = pipe.use_averaged_weights(str(tmp_path / "c"), last_k=2)
    for a, b in zip(
        jax.tree.leaves(want),
        jax.tree.leaves(pipe.params["decoder"]),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The final-epoch weights were swapped out, not lost.
    assert replaced is not pipe.params["decoder"]
    # Decode still runs on the averaged weights.
    caps = pipe.generate(np.stack(list(feats.values())[:2]))
    assert len(caps) == 2


def test_cli_average_last(tmp_path, capsys):
    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=7
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "2", "--batch-size", "4"])
    main(["evaluate", *common, "--tokens", token_file, "--split",
          test_file, "--features", feats, "--checkpoint-dir", ckpt,
          "--average-last", "2", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert '"bleu1"' in out or "bleu" in out


def test_average_params_bf16_leaves_are_averaged(tmp_path):
    """bfloat16 is a float for averaging purposes (numpy's issubdtype
    calls it non-float — the check must use jnp's)."""
    import jax.numpy as jnp

    mgr = CheckpointManager(str(tmp_path / "c"), best_metric=None)
    a = {"w": jnp.asarray([1.0, 3.0], jnp.bfloat16)}
    b = {"w": jnp.asarray([3.0, 5.0], jnp.bfloat16)}
    sa, sb = _state(a), _state(b)
    sb = TrainState(
        step=sa.step + 1, params=b, opt_state=sb.opt_state, rng=sb.rng
    )
    mgr.save(sa)
    mgr.save(sb)
    avg = mgr.average_params(_state(a))
    assert jnp.asarray(avg["w"]).dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(avg["w"], np.float32), [2.0, 4.0]
    )
    mgr.close()
