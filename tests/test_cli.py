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

    main(["evaluate", *common, "--tokens", token_file, "--split", test_file,
          "--features", feats, "--checkpoint-dir", ckpt,
          "--method", "greedy", "--batch-size", "4"])
    out = capsys.readouterr().out
    scores = json.loads(out.strip().splitlines()[-1])
    assert set(scores) == {"bleu1", "bleu2", "bleu3", "bleu4"}


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


def test_cli_parallelism_flag_choices(capsys):
    """Bogus --parallelism values are rejected with the choices named."""
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["train", "--tokens", "x", "--features", "y",
              "--parallelism", "pp"])
    err = capsys.readouterr().err
    assert "dp_tp" in err and "invalid choice" in err
