"""CLI smoke test: extract -> train -> caption -> evaluate on fixtures."""

import json
import os

import numpy as np
import pytest

from tpucap.cli.main import main
from tpucap.data import generate_fixture_dataset


@pytest.mark.slow
def test_cli_full_workflow(tmp_path, capsys):
    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats = str(tmp_path / "features.npz")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)

    common = ["--encoder", "tiny_cnn", "--max-len", "12"]

    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "wrote 6 features" in out
    loaded = np.load(feats)
    assert len(loaded.files) == 6

    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "2", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "trained 2 epochs" in out
    assert os.path.exists(os.path.join(ckpt, "tokenizer.json"))

    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    main(["caption", *common, "--image", img0, "--checkpoint-dir", ckpt,
          "--method", "greedy"])
    out = capsys.readouterr().out
    assert img0 in out

    coco = str(tmp_path / "results.json")
    main(["evaluate", *common, "--tokens", token_file, "--split", test_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--method", "greedy", "--batch-size", "4",
          "--coco-results", coco])
    out = capsys.readouterr().out
    scores = json.loads(out.strip().splitlines()[-1])
    assert set(scores) == {"bleu1", "bleu2", "bleu3", "bleu4"}
    rows = json.load(open(coco))
    assert rows and set(rows[0]) == {"image_id", "caption"}


def test_cli_preset_config_resolution():
    """--preset maps to the judged config presets without building models."""
    import argparse

    from tpucap.cli.main import _build_config

    ns = argparse.Namespace(
        preset="config3",
        encoder="vgg16",
        decoder="lstm1",
        features_kind="pooled",
        embed_dim=256,
        hidden_dim=256,
        max_len=34,
    )
    cfg = _build_config(ns)
    assert cfg.encoder.name == "resnet50"
    assert cfg.decoder.num_layers == 2
    assert cfg.decode.beam_width == 5

    ns.preset = None
    ns.decoder = "attention"
    cfg = _build_config(ns)
    assert cfg.encoder.features == "spatial"
    assert cfg.encoder.feature_dim == 512  # vgg16 spatial


def test_cli_round2_flags_reach_config():
    """--attention-reg / --approx-topk map into the config tree, including
    the preset-override path for attention_reg."""
    import argparse

    from tpucap.cli.main import _build_config

    ns = argparse.Namespace(
        preset=None,
        encoder="tiny_cnn",
        decoder="attention",
        features_kind="pooled",
        embed_dim=16,
        hidden_dim=32,
        max_len=12,
        attention_reg=0.25,
        approx_topk=True,
    )
    cfg = _build_config(ns)
    assert cfg.train.attention_reg == 0.25
    assert cfg.decode.approx_topk is True

    ns.preset = "config4"
    cfg = _build_config(ns)
    assert cfg.train.attention_reg == 0.25  # preset overridden
    assert cfg.encoder.features == "spatial"


def test_cli_lr_and_patience_override_preset():
    """--lr / --early-stopping-patience must override a --preset (they were
    silently discarded before); leaving them unset keeps preset values."""
    import argparse

    from tpucap.cli.main import _build_config
    from tpucap.config import PRESETS

    base = dict(
        preset="config2",
        encoder="vgg16",
        decoder="lstm1",
        features_kind="pooled",
        embed_dim=256,
        hidden_dim=256,
        max_len=34,
    )
    cfg = _build_config(argparse.Namespace(**base, lr=None,
                                           early_stopping_patience=None))
    assert cfg.train.learning_rate == PRESETS["config2"].train.learning_rate
    assert (
        cfg.train.early_stopping_patience
        == PRESETS["config2"].train.early_stopping_patience
    )

    cfg = _build_config(argparse.Namespace(**base, lr=5e-4,
                                           early_stopping_patience=3))
    assert cfg.train.learning_rate == 5e-4
    assert cfg.train.early_stopping_patience == 3

    # Non-preset path: None falls back to the defaults.
    ns = argparse.Namespace(**{**base, "preset": None}, lr=None,
                            early_stopping_patience=None)
    cfg = _build_config(ns)
    assert cfg.train.learning_rate == 1e-3
    assert cfg.train.early_stopping_patience == 0


@pytest.mark.slow
def test_cli_restores_best_checkpoint(tmp_path):
    """caption/evaluate restore the BEST-val_loss checkpoint, not the
    latest retained one (the documented restore-from-best contract: the
    manager keys retention on val_loss, so early stopping may leave the
    newest step worse than the best)."""
    import argparse

    import jax

    from tpucap.cli.main import _restore_pipeline
    from tpucap.checkpoint import CheckpointManager
    from tpucap.data import generate_fixture_dataset
    from tpucap.cli.main import main

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--val-split", train_file, "--features", feats,
          "--checkpoint-dir", ckpt, "--epochs", "2", "--batch-size", "4"])

    ns = argparse.Namespace(
        preset=None, encoder="tiny_cnn", decoder="lstm1",
        features_kind="pooled", embed_dim=256, hidden_dim=256,
        max_len=12, checkpoint_dir=ckpt,
    )
    base = _restore_pipeline(ns)  # best == latest at this point

    # Append a NEWER checkpoint with perturbed params and a far worse
    # val_loss — a deterministic stand-in for an early-stopped run whose
    # last retained step is not its best.
    import dataclasses

    import jax.numpy as jnp
    import optax

    from tpucap.train import TrainState

    mgr = CheckpointManager(ckpt)
    prev_best = mgr.best_step()
    worse_params = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 1.0, base.params["decoder"]
    )
    st = TrainState.create(worse_params, optax.adam(1e-3), jax.random.key(0))
    st = dataclasses.replace(
        st, step=jnp.asarray(mgr.latest_step() + 1000, jnp.int32)
    )
    mgr.save(st, metrics={"val_loss": 1e9})
    best, latest = mgr.best_step(), mgr.latest_step()
    mgr.close()
    assert best == prev_best and best != latest, (best, latest)

    # Restoring again must pick the BEST step's params, not the newest.
    pipe = _restore_pipeline(ns)
    got = jax.tree_util.tree_leaves_with_path(pipe.params["decoder"])
    want = jax.tree_util.tree_leaves_with_path(base.params["decoder"])
    for (pa, a), (_, b) in zip(got, want, strict=True):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=str(pa)
        )


def test_encoder_feature_dims_single_source():
    """FEATURE_DIMS is the one table for encoder output channels; spatial
    inception is 768 (mixed7), NOT the pooled 2048."""
    from tpucap.config import FEATURE_DIMS, encoder_config

    assert encoder_config("inception_v3", "spatial").feature_dim == 768
    assert encoder_config("inception_v3").feature_dim == 2048
    assert encoder_config("resnet50", "spatial").feature_dim == 1024
    for (name, kind), dim in FEATURE_DIMS.items():
        assert encoder_config(name, kind).feature_dim == dim


def test_cli_parallelism_flag_choices(capsys):
    """Bogus --parallelism values are rejected with the choices named."""
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["train", "--tokens", "x", "--features", "y",
              "--parallelism", "zz"])
    err = capsys.readouterr().err
    assert "invalid choice" in err
    # every training strategy is a named choice
    for name in (
        "fsdp", "dp_tp", "pp", "dp_pp", "ep", "dp_ep", "sp", "dp_sp"
    ):
        assert name in err, name


def test_cli_evaluate_metrics_validated_before_decode(tmp_path):
    """A typo'd --metrics entry must die at argument time, not after
    minutes of TPU decode; whitespace around commas is tolerated."""
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="ciderr"):
        main(["evaluate", "--tokens", "x", "--features", "y",
              "--metrics", "bleu, ciderr"])


def test_cli_finetune_rejects_unsupported_flags(tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="--val-split"):
        main(["train", "--tokens", "x", "--finetune-encoder",
              "--images", "d", "--val-split", "v"])
    with _pytest.raises(SystemExit, match="--features is required"):
        main(["train", "--tokens", "x"])


@pytest.mark.slow
def test_cli_restore_with_nondefault_optimizer(tmp_path, capsys):
    """A checkpoint trained with --optimizer sgd --grad-clip-norm (whose
    opt_state pytree differs from plain adam) must restore for inference
    when the same flags are passed — the restore template is built from
    the SAME config resolution as training."""
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=7
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    opt = ["--optimizer", "sgd", "--momentum", "0.9",
           "--grad-clip-norm", "1.0", "--lr-schedule", "cosine"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    capsys.readouterr()
    main(["train", *common, *opt, "--tokens", token_file,
          "--split", train_file, "--features", feats,
          "--checkpoint-dir", ckpt, "--epochs", "1", "--batch-size", "4"])
    capsys.readouterr()
    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    main(["caption", *common, *opt, "--image", img0,
          "--checkpoint-dir", ckpt, "--method", "greedy"])
    out = capsys.readouterr().out
    assert img0 in out


def test_cli_profile_writes_trace(tmp_path):
    """`tpucap profile` captures a TensorBoard trace for each workload
    (decode/train/encoder) — compile/warmup outside the trace, N traced
    steps inside."""
    import glob

    from tpucap.cli.main import main

    for workload in ("decode", "train", "encoder"):
        out = str(tmp_path / workload)
        main(["profile", "--encoder", "tiny_cnn", "--max-len", "6",
              "--workload", workload, "--batch", "2", "--steps", "1",
              "--out", out])
        assert glob.glob(out + "/**/*.pb", recursive=True) or glob.glob(
            out + "/**/*", recursive=True
        ), f"no trace files for {workload}"


def test_cli_augment_requires_finetune():
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="finetune-encoder"):
        main(["train", "--tokens", "x", "--features", "y",
              "--augment"])


def test_cli_evaluate_dump_captions(tmp_path):
    """evaluate --dump-captions writes per-image JSONL with caption,
    references, and a sentence BLEU-4."""
    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=11
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    dump = str(tmp_path / "caps.jsonl")
    main(["evaluate", *common, "--tokens", token_file, "--split",
          test_file, "--features", feats, "--checkpoint-dir", ckpt,
          "--batch-size", "4", "--dump-captions", dump])
    rows = [json.loads(line) for line in open(dump)]
    assert rows and all(
        {"image_id", "caption", "references", "bleu4"} <= set(r)
        for r in rows
    )


def test_cli_caption_dump_attention(tmp_path, capsys):
    """caption --dump-attention writes the overlay artifact: per-token
    alphas (+ sentinel column on the adaptive family), lengths,
    captions, and the grid size for reshaping."""
    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=13
    )
    feats = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--decoder", "adaptive",
              "--max-len", "10", "--embed-dim", "8", "--hidden-dim", "16"]
    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    capsys.readouterr()
    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    out = str(tmp_path / "attn.npz")
    main(["caption", *common, "--image", img0, "--checkpoint-dir", ckpt,
          "--method", "greedy", "--dump-attention", out])
    printed = capsys.readouterr().out
    art = np.load(out)
    g = int(art["spatial_positions"])
    # adaptive alphas carry the sentinel column: L+1
    assert art["alphas"].shape[0] == 1
    assert art["alphas"].shape[2] == g + 1
    np.testing.assert_allclose(art["alphas"].sum(-1), 1.0, atol=1e-4)
    assert art["captions"][0] in printed  # stdout caption == artifact

    # refused combinations fail fast
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="dump-attention"):
        main(["caption", *common, "--image", img0, "--checkpoint-dir",
              ckpt, "--method", "mbr", "--dump-attention", out])

    # pooled decoder families fail fast (before the checkpoint restore)
    pooled = [a for a in common]
    pooled[pooled.index("adaptive")] = "lstm1"
    with _pytest.raises(SystemExit, match="attention decoder family"):
        main(["caption", *pooled, "--image", img0, "--checkpoint-dir",
              ckpt, "--dump-attention", out])


def test_cli_karpathy_json_workflow(tmp_path, capsys):
    """--karpathy-json replaces --tokens/--split files: train reads the
    'train' split (--val-split names the 'val' split), evaluate defaults
    to the 'test' split."""
    img_dir, token_file, train_file, test_file = generate_fixture_dataset(
        tmp_path, n_images=8, image_size=32, seed=5
    )
    from tpucap.data import load_descriptions, load_split

    desc = load_descriptions(token_file)
    train_ids = load_split(train_file)
    test_ids = load_split(test_file)
    val_ids = train_ids[-2:]
    splits = {
        i: ("val" if i in val_ids else "train") for i in train_ids
    } | {i: "test" for i in test_ids}
    kj = tmp_path / "dataset_fixture.json"
    kj.write_text(json.dumps({
        "dataset": "fixture",
        "images": [
            {
                "filename": f"{i}.jpg",
                "split": splits[i],
                "sentences": [{"raw": c, "tokens": c.split()} for c in caps],
            }
            for i, caps in desc.items() if i in splits
        ],
    }))

    feats = str(tmp_path / "features.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]

    main(["extract", *common, "--images", str(img_dir), "--out", feats,
          "--batch-size", "4"])
    capsys.readouterr()

    main(["train", *common, "--karpathy-json", str(kj),
          "--val-split", "val", "--features", feats,
          "--checkpoint-dir", ckpt, "--epochs", "2", "--batch-size", "4"])
    out = capsys.readouterr().out
    assert "trained 2 epochs" in out

    main(["evaluate", *common, "--karpathy-json", str(kj),
          "--features", feats, "--checkpoint-dir", ckpt,
          "--method", "greedy", "--batch-size", "4"])
    out = capsys.readouterr().out
    scores = json.loads(out.strip().splitlines()[-1])
    assert "bleu4" in scores

    # Unknown split name fails loudly.
    with pytest.raises(SystemExit, match="empty or absent"):
        main(["evaluate", *common, "--karpathy-json", str(kj),
              "--split", "dev", "--features", feats,
              "--checkpoint-dir", ckpt, "--batch-size", "4"])

    # Neither --tokens nor --karpathy-json fails loudly.
    with pytest.raises(SystemExit, match="--tokens"):
        main(["train", *common, "--features", feats,
              "--checkpoint-dir", ckpt, "--epochs", "1"])


@pytest.mark.slow
def test_cli_finetune_resume_workflow(tmp_path, capsys):
    """r5: --finetune-encoder composes with checkpointing + --resume —
    the CLI creates a manager on --checkpoint-dir, interval-saves, and
    the rerun restores the exact position."""
    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    ckpt = str(tmp_path / "ftck")
    common = [
        "train", "--finetune-encoder", "--encoder", "tiny_cnn",
        "--max-len", "12", "--tokens", token_file,
        "--split", train_file, "--images", str(img_dir),
        "--checkpoint-dir", ckpt, "--batch-size", "6",
        "--checkpoint-every-steps", "1",
    ]
    main(common + ["--epochs", "2"])
    out = capsys.readouterr().out
    assert "finetuned 2 epochs" in out

    main(common + ["--epochs", "4", "--resume"])
    out = capsys.readouterr().out
    assert "resumed from step" in out
    assert "finetuned 2 epochs" in out  # only the remaining two

    # Nothing left: resume past the requested horizon is a clean no-op.
    main(common + ["--epochs", "4", "--resume"])
    out = capsys.readouterr().out
    assert "nothing to train" in out
