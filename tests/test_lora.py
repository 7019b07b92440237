"""LoRA (train/lora.py): low-rank adaptation contracts.

- B=0 init makes the overlay an exact identity (step 0 == base model);
- only adapters train — the base tree is bit-frozen;
- merged decode == per-step effective-params decode;
- DP update-exact vs single device;
- joint (encoder-in-the-loop) mode trains and freeze_encoder restricts
  the adapters to the decoder subtree;
- artifact round-trip; pipeline fit_lora end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpucap.models.decoders import build_decoder
from tpucap.train import TrainState
from tpucap.train.lora import (
    apply_lora,
    init_lora,
    load_lora,
    lora_param_counts,
    lora_targets,
    make_lora_train_step,
    merge_lora,
    save_lora,
)


def _setup(vocab=50, feat=32):
    dec = build_decoder(
        "lstm1", vocab_size=vocab, feature_dim=feat, embed_dim=16,
        hidden_dim=16,
    )
    params = dec.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(8, feat)).astype(np.float32))
    toks = jnp.asarray(
        rng.integers(1, vocab, size=(8, 13)).astype(np.int32)
    )
    return dec, params, feats, toks


def test_targets_rule():
    dec, params, _, _ = _setup()
    targets = lora_targets(params)
    # 2-D 'kernel' leaves only: lstm input kernel, feat_proj, pre_out,
    # out — not biases, not the recurrent matrix, not the embedding.
    assert "['cells'][0]['kernel']" in targets
    assert "['out']['kernel']" in targets
    assert not any("bias" in k for k in targets)
    assert not any("recurrent" in k for k in targets)
    assert not any("table" in k for k in targets)


def test_init_is_identity():
    dec, params, feats, toks = _setup()
    adapters = init_lora(params, 4, rng=jax.random.key(1))
    eff = apply_lora(params, adapters, scale=1.0)
    for a, b in zip(
        jax.tree.leaves(params), jax.tree.leaves(eff), strict=True
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hand_math():
    base = {"layer": {"kernel": jnp.ones((2, 3), jnp.float32)}}
    adapters = {
        "['layer']['kernel']": {
            "a": jnp.asarray([[1.0], [2.0]]),  # (2, 1)
            "b": jnp.asarray([[3.0, 4.0, 5.0]]),  # (1, 3)
        }
    }
    eff = apply_lora(base, adapters, scale=0.5)
    want = 1.0 + 0.5 * np.outer([1.0, 2.0], [3.0, 4.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(eff["layer"]["kernel"]), want
    )


def test_only_adapters_train_and_loss_drops():
    dec, params, feats, toks = _setup()
    adapters = init_lora(params, 4, rng=jax.random.key(1))
    opt = optax.adam(5e-2)
    step = make_lora_train_step(
        dec, params, opt, scale=1.0, deterministic=True
    )
    state = TrainState.create(adapters, opt, jax.random.key(2))
    base_before = jax.device_get(params)
    losses = []
    for _ in range(12):
        state, m = step(state, feats, toks)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    # The base is bit-frozen — it was never part of the state.
    for a, b in zip(
        jax.tree.leaves(base_before), jax.tree.leaves(params),
        strict=True,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And the adapters moved.
    moved = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree.leaves(adapters), jax.tree.leaves(state.params),
            strict=True,
        )
    )
    assert moved


def test_merge_matches_effective_decode():
    from tpucap.decode import greedy_decode

    dec, params, feats, toks = _setup()
    adapters = init_lora(params, 4, rng=jax.random.key(1))
    # Push the adapters off the identity.
    adapters = jax.tree_util.tree_map(
        lambda x: x + 0.05, adapters
    )
    scale = 2.0  # alpha=8, rank=4
    eff = apply_lora(params, adapters, scale=scale)
    merged = merge_lora(params, adapters, scale=scale)

    def decode(p):
        state = dec.init_state(p, feats)
        return greedy_decode(
            dec.step, p, state, start_id=1, end_id=2, max_len=10
        )

    r_eff = decode(eff)
    r_merged = decode(merged)
    np.testing.assert_array_equal(
        np.asarray(r_eff.tokens), np.asarray(r_merged.tokens)
    )


def test_dp_matches_single_device():
    from jax.sharding import Mesh

    dec, params, feats, toks = _setup()
    adapters = init_lora(params, 4, rng=jax.random.key(1))
    opt = optax.adam(1e-2)

    single = make_lora_train_step(
        dec, params, opt, scale=1.0, deterministic=True
    )
    s1 = TrainState.create(adapters, opt, jax.random.key(2))
    s1, m1 = single(s1, feats, toks)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    dp = make_lora_train_step(
        dec, params, opt, scale=1.0, deterministic=True, mesh=mesh
    )
    s2 = TrainState.create(adapters, opt, jax.random.key(2))
    s2, m2 = dp(s2, feats, toks)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_joint_mode_and_freeze_encoder():
    from tpucap.models.encoders import build_encoder

    enc = build_encoder("tiny_cnn")
    dec = build_decoder(
        "lstm1", vocab_size=50, feature_dim=enc.feature_dim,
        embed_dim=16, hidden_dim=16,
    )
    base = {
        "encoder": enc.init(jax.random.key(0)),
        "decoder": dec.init(jax.random.key(1)),
    }
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(
            size=(4, enc.input_size, enc.input_size, 3)
        ).astype(np.float32)
    )
    toks = jnp.asarray(rng.integers(1, 50, size=(4, 13)).astype(np.int32))

    # Joint adapters span both subtrees when the encoder has 2-D kernels;
    # freeze_encoder-style restriction = init over the decoder subtree.
    adapters = init_lora(
        {"decoder": base["decoder"]}, 4, rng=jax.random.key(2)
    )
    assert all(k.startswith("['decoder']") for k in adapters)

    opt = optax.adam(5e-2)
    step = make_lora_train_step(
        dec, base, opt, scale=1.0, encoder=enc, deterministic=True
    )
    state = TrainState.create(adapters, opt, jax.random.key(3))
    losses = []
    for _ in range(10):
        state, m = step(state, images, toks)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_artifact_round_trip(tmp_path):
    dec, params, _, _ = _setup()
    adapters = init_lora(params, 4, rng=jax.random.key(1))
    p = str(tmp_path / "adapters.npz")
    save_lora(p, adapters, rank=4, alpha=8.0)
    loaded, rank, alpha = load_lora(p)
    assert rank == 4 and alpha == 8.0
    assert set(loaded) == set(adapters)
    for k in adapters:
        np.testing.assert_array_equal(
            np.asarray(adapters[k]["a"]), np.asarray(loaded[k]["a"])
        )
        np.testing.assert_array_equal(
            np.asarray(adapters[k]["b"]), np.asarray(loaded[k]["b"])
        )


def test_param_count_is_small():
    dec, params, _, _ = _setup(vocab=500)
    adapters = init_lora(params, 2, rng=jax.random.key(1))
    n_ad, n_base = lora_param_counts(params, adapters)
    assert n_ad < 0.30 * n_base  # tiny model; production ratio ~1%


def test_pipeline_fit_lora_e2e(tmp_path):
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=32),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=16, dropout_rate=0.0
        ),
        train=TrainConfig(
            epochs=1, batch_size=4, seed=0, learning_rate=5e-2
        ),
        decode=DecodeConfig(max_len=8),
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": ["startseq a b c endseq"] * 2 for i in range(4)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(0)
    feats = {
        k: rng.normal(size=(32,)).astype(np.float32) for k in desc
    }
    base_before = jax.device_get(pipe.params["decoder"])
    hist = pipe.fit_lora(
        desc, feats, rank=2, epochs=8, batch_size=4, log=None
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    # merge=True folded the adapters in: params moved on adapted leaves.
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(base_before),
            jax.tree.leaves(pipe.params["decoder"]),
            strict=True,
        )
    )
    assert changed
    caps = pipe.generate(
        np.stack([feats["im0"], feats["im1"]]), method="greedy"
    )
    assert len(caps) == 2
    # Artifact round-trip through the pipeline surface.
    art = str(tmp_path / "lora.npz")
    pipe.save_lora(art)
    loaded, rank, alpha = load_lora(art)
    assert rank == 2 and set(loaded)


def test_pipeline_finetune_lora_e2e():
    from tpucap.config import (
        Config,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        TrainConfig,
    )
    from tpucap.pipeline import CaptioningPipeline

    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=128),
        decoder=DecoderConfig(
            embed_dim=16, hidden_dim=16, dropout_rate=0.0
        ),
        train=TrainConfig(
            epochs=1, batch_size=4, seed=0, learning_rate=5e-2
        ),
        decode=DecodeConfig(max_len=8),
    )
    pipe = CaptioningPipeline(cfg)
    desc = {f"im{i}": ["startseq a b c endseq"] * 2 for i in range(4)}
    pipe.fit_tokenizer(desc)
    pipe.build()
    rng = np.random.default_rng(0)
    sz = pipe.encoder.input_size
    images = {
        k: rng.normal(size=(sz, sz, 3)).astype(np.float32)
        for k in desc
    }
    hist = pipe.fit_finetune(
        desc, images, epochs=6, batch_size=4, lora_rank=2, log=None
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert pipe.lora_meta["rank"] == 2
    # Merged params serve immediately (encoder + decoder both usable).
    feats = pipe.encode_images(
        np.stack([images["im0"], images["im1"]])
    )
    caps = pipe.generate(np.asarray(feats), method="greedy")
    assert len(caps) == 2


def test_cli_lora_flags_validate():
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="--lora-out needs"):
        main(["train", "--tokens", "x", "--features", "f",
              "--lora-out", "a.npz"])
    with pytest.raises(SystemExit, match="does not compose"):
        main(["train", "--tokens", "x", "--features", "f",
              "--lora-rank", "4", "--stream-features"])
    with pytest.raises(SystemExit, match="does not compose"):
        main(["train", "--tokens", "x", "--features", "f",
              "--lora-rank", "4", "--parallelism", "fsdp"])


@pytest.mark.slow
def test_cli_lora_e2e(tmp_path, capsys):
    """extract -> train --lora-rank -> caption from the merged bundle."""
    import os

    from tpucap.config import Config
    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset
    from tpucap.pipeline import CaptioningPipeline

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    art = str(tmp_path / "adapters.npz")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    capsys.readouterr()
    main(["train", *common, "--tokens", token_file,
          "--split", train_file, "--features", feats,
          "--checkpoint-dir", ckpt, "--epochs", "2", "--batch-size", "4",
          "--lora-rank", "2", "--lora-out", art])
    out = capsys.readouterr().out
    assert "lora-trained 2 epochs" in out
    assert "LoRA adapters in" in out
    assert os.path.exists(art)
    pipe = CaptioningPipeline.load(os.path.join(ckpt, "bundle"))
    img0 = os.path.join(str(img_dir), sorted(os.listdir(str(img_dir)))[0])
    feats_arr = pipe.extract_features([img0], batch_size=1)
    caps = pipe.generate(feats_arr, method="greedy")
    assert len(caps) == 1
