"""MBR / consensus reranking (decode/mbr.py, pipeline.generate_mbr)."""

import numpy as np
import pytest

import jax

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.decode import mbr_select
from tpucap.pipeline import CaptioningPipeline

FEAT = 8
B = 3
MAX_LEN = 8


class TestSelect:
    @pytest.mark.parametrize("metric", ["cider", "bleu4"])
    def test_majority_duplicate_wins(self, metric):
        pools = [
            ["a man rides a horse", "a man rides a horse",
             "two dogs play in snow"],
            ["blue car on road", "green field of grass",
             "green field of grass"],
        ]
        picks, utils = mbr_select(pools, metric=metric)
        # The duplicated caption agrees perfectly with its twin; the
        # odd one out shares nothing. Ties resolve to the lower index.
        assert picks == [0, 1]
        assert all(u > 0 for u in utils)

    def test_all_identical_ties_to_index_zero(self):
        picks, _ = mbr_select([["same words here"] * 4])
        assert picks == [0]

    def test_single_candidate(self):
        picks, utils = mbr_select([["only option"]])
        assert picks == [0] and utils == [0.0]

    def test_empty_and_validation(self):
        assert mbr_select([]) == ([], [])
        with pytest.raises(ValueError, match="metric"):
            mbr_select([["a"]], metric="rouge")


def _pipe(seed=0):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(
            name="lstm1", embed_dim=10, hidden_dim=12, dropout_rate=0.0
        ),
        train=TrainConfig(seed=seed, epochs=1, batch_size=4),
        decode=DecodeConfig(max_len=MAX_LEN),
    )
    pipe = CaptioningPipeline(cfg)
    words = "red blue green old new big".split()
    desc = {
        f"im{i}": [f"startseq {words[i]} {words[(i + 1) % 6]} endseq"]
        for i in range(6)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    return pipe


def _feats():
    return np.asarray(
        jax.random.normal(jax.random.key(5), (B, FEAT))
    )


class TestPipelineAPI:
    def test_sample_pool_deterministic_and_contained(self):
        pipe = _pipe()
        f = _feats()
        caps1, pools = pipe.generate_mbr(
            f, n_candidates=4, candidates="sample", seed=3,
            return_candidates=True,
        )
        caps2 = pipe.generate_mbr(
            f, n_candidates=4, candidates="sample", seed=3
        )
        assert caps1 == caps2
        assert len(caps1) == B
        for cap, pool in zip(caps1, pools):
            assert cap in pool and len(pool) == 4

    def test_beam_and_diverse_sources(self):
        pipe = _pipe()
        f = _feats()
        for src in ("beam", "diverse"):
            caps, pools = pipe.generate_mbr(
                f, n_candidates=3, candidates=src, beam_width=2,
                return_candidates=True,
            )
            assert len(caps) == B
            for cap, pool in zip(caps, pools):
                assert cap in pool and len(pool) == 3

    def test_single_candidate_is_identity(self):
        pipe = _pipe()
        f = _feats()
        caps = pipe.generate_mbr(
            f, n_candidates=1, candidates="beam", beam_width=3
        )
        assert caps == pipe.generate(f, method="beam", beam_width=3)

    def test_validation(self):
        pipe = _pipe()
        with pytest.raises(ValueError, match="candidate source"):
            pipe.generate_mbr(_feats(), candidates="topk")
        with pytest.raises(ValueError, match="n_candidates"):
            pipe.generate_mbr(_feats(), n_candidates=0)


@pytest.mark.slow
def test_cli_caption_mbr(tmp_path, capsys):
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=3
    )
    feats_file = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir),
          "--out", feats_file, "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file,
          "--split", train_file, "--features", feats_file,
          "--checkpoint-dir", ckpt, "--epochs", "1",
          "--batch-size", "4"])
    capsys.readouterr()

    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    main(["caption", *common, "--image", img0,
          "--checkpoint-dir", ckpt, "--method", "mbr",
          "--mbr-candidates", "3", "--mbr-from", "diverse",
          "--beam-width", "2"])
    out = capsys.readouterr().out
    assert out.startswith(img0 + "\t")
