"""Product-of-experts ensemble decoding (decode/ensemble.py,
pipeline.generate_ensemble).

Contracts:
- a singleton ensemble IS the plain engine (token-exact, greedy+beam);
- averaging M copies of one model is the identity;
- weights=[1, 0] reduces to member 0 alone;
- a real 2-model ensemble matches a per-step Python oracle that
  averages log_softmax distributions (tokens exactly, scores fp-close);
- heterogeneous families (merge + attention) compose, with per-model
  beam_shared_keys intact;
- tokenizer/shape validations fire.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.decode import EnsembleDecoder, beam_decode, greedy_decode
from tpucap.decode.oracle import beam_oracle, greedy_oracle
from tpucap.models.decoders import MergeDecoder
from tpucap.pipeline import CaptioningPipeline

VOCAB = 23
FEAT = 10
START, END = 1, 2
B = 4
MAX_LEN = 9


def make_model(seed, **kw):
    cfg = dict(
        vocab_size=VOCAB,
        feature_dim=FEAT,
        embed_dim=12,
        hidden_dim=16,
        dropout_rate=0.0,
    )
    cfg.update(kw)
    dec = MergeDecoder(**cfg)
    return dec, dec.init(jax.random.key(seed))


def feats(seed=7, spatial=False):
    shape = (B, 9, FEAT) if spatial else (B, FEAT)
    return jax.random.normal(jax.random.key(seed), shape)


class TestEnsembleStep:
    def test_singleton_is_identity_modulo_normalizer(self):
        dec, params = make_model(0)
        ens = EnsembleDecoder([dec])
        f = feats()
        st = ens.init_state((params,), (f,))
        logp, _ = ens.step((params,), st, jnp.full((B,), START))
        raw, _ = dec.step(params, dec.init_state(params, f),
                          jnp.full((B,), START))
        np.testing.assert_allclose(
            np.asarray(logp),
            np.asarray(jax.nn.log_softmax(raw.astype(jnp.float32))),
            atol=1e-6,
        )

    def test_weight_validation(self):
        dec, _ = make_model(0)
        with pytest.raises(ValueError, match="weights"):
            EnsembleDecoder([dec, dec], weights=[1.0])
        with pytest.raises(ValueError, match="sum"):
            EnsembleDecoder([dec], weights=[0.0])
        with pytest.raises(ValueError, match="at least one"):
            EnsembleDecoder([])


def _greedy_engine(step_fn, params, state):
    return greedy_decode(
        step_fn, params, state,
        start_id=START, end_id=END, max_len=MAX_LEN,
    )


class TestEngineParity:
    def test_two_model_greedy_matches_oracle(self):
        dec_a, pa = make_model(0)
        dec_b, pb = make_model(1, hidden_dim=24)  # heterogeneous dims
        ens = EnsembleDecoder([dec_a, dec_b])
        f = feats()
        params = (pa, pb)

        res = jax.jit(
            lambda p, x: _greedy_engine(
                ens.step, p, ens.init_state(p, (x, x))
            )
        )(params, f)
        otoks, olens, oscores = greedy_oracle(
            ens.step, params, ens.init_state(params, (f, f)),
            start_id=START, end_id=END, max_len=MAX_LEN,
        )
        np.testing.assert_array_equal(np.asarray(res.tokens), otoks)
        np.testing.assert_array_equal(np.asarray(res.lengths), olens)
        np.testing.assert_allclose(
            np.asarray(res.scores), oscores, atol=1e-4
        )

    def test_two_model_beam_matches_oracle(self):
        dec_a, pa = make_model(0)
        dec_b, pb = make_model(3)
        ens = EnsembleDecoder([dec_a, dec_b])
        f = feats()
        params = (pa, pb)
        k = 3

        res = jax.jit(
            lambda p, x: beam_decode(
                ens.step, p, ens.init_state(p, (x, x)),
                start_id=START, end_id=END, max_len=MAX_LEN,
                beam_width=k, decoder=ens,
            )
        )(params, f)
        otoks, olens, _, _, _, _ = beam_oracle(
            ens.step, params, ens.init_state(params, (f, f)),
            start_id=START, end_id=END, max_len=MAX_LEN, beam_width=k,
        )
        np.testing.assert_array_equal(np.asarray(res.tokens), otoks)
        np.testing.assert_array_equal(np.asarray(res.lengths), olens)

    def test_m_copies_equal_single(self):
        dec, params = make_model(0)
        f = feats()
        single = _greedy_engine(
            dec.step, params, dec.init_state(params, f)
        )
        ens = EnsembleDecoder([dec, dec, dec])
        p3 = (params, params, params)
        triple = _greedy_engine(
            ens.step, p3, ens.init_state(p3, (f, f, f))
        )
        np.testing.assert_array_equal(
            np.asarray(single.tokens), np.asarray(triple.tokens)
        )

    def test_one_hot_weights_select_member(self):
        dec_a, pa = make_model(0)
        dec_b, pb = make_model(4)
        f = feats()
        alone = _greedy_engine(
            dec_a.step, pa, dec_a.init_state(pa, f)
        )
        ens = EnsembleDecoder([dec_a, dec_b], weights=[1.0, 0.0])
        p = (pa, pb)
        weighted = _greedy_engine(ens.step, p, ens.init_state(p, (f, f)))
        np.testing.assert_array_equal(
            np.asarray(alone.tokens), np.asarray(weighted.tokens)
        )


def _pipe(seed, decoder_name="lstm1", **dec_kw):
    cfg = Config(
        encoder=EncoderConfig(name="tiny_cnn", feature_dim=FEAT),
        decoder=DecoderConfig(
            name=decoder_name, embed_dim=12, hidden_dim=16,
            dropout_rate=0.0, **dec_kw,
        ),
        train=TrainConfig(seed=seed, epochs=1, batch_size=4),
        decode=DecodeConfig(max_len=MAX_LEN),
    )
    pipe = CaptioningPipeline(cfg)
    words = "cat dog sat mat ran fox".split()
    desc = {
        f"im{i}": [f"startseq {words[i]} {words[(i + 2) % 6]} endseq"]
        for i in range(6)
    }
    pipe.fit_tokenizer(desc)
    pipe.build()
    return pipe


class TestPipelineAPI:
    def test_singleton_matches_generate(self):
        pipe = _pipe(0)
        f = np.asarray(feats())
        for method in ("greedy", "beam"):
            assert pipe.generate_ensemble(
                f, [], method=method, beam_width=3
            ) == pipe.generate(f, method=method, beam_width=3)

    def test_two_pipes_greedy_and_beam(self):
        pa, pb = _pipe(0), _pipe(1)
        f = np.asarray(feats())
        caps = pa.generate_ensemble(f, [pb], method="greedy")
        assert len(caps) == B and all(isinstance(c, str) for c in caps)
        caps_b = pa.generate_ensemble(f, [pb], method="beam",
                                      beam_width=3)
        assert len(caps_b) == B

    def test_heterogeneous_families_per_model_features(self):
        pa = _pipe(0)
        pb = _pipe(1, decoder_name="attention", attention_dim=8)
        pooled = np.asarray(feats())
        spatial = np.asarray(feats(spatial=True))
        caps = pa.generate_ensemble(
            [pooled, spatial], [pb], method="beam", beam_width=3
        )
        assert len(caps) == B

    def test_tokenizer_mismatch_raises(self):
        pa = _pipe(0)
        pb = _pipe(1)
        pb.fit_tokenizer(
            {"x": ["startseq zebra yak endseq"]}
        )
        pb.build()
        with pytest.raises(ValueError, match="tokenizer"):
            pa.generate_ensemble(np.asarray(feats()), [pb])

    def test_feature_count_mismatch_raises(self):
        pa, pb = _pipe(0), _pipe(1)
        with pytest.raises(ValueError, match="feature arrays"):
            pa.generate_ensemble([np.asarray(feats())], [pb])

    def test_method_validation(self):
        pa = _pipe(0)
        with pytest.raises(ValueError, match="greedy|beam"):
            pa.generate_ensemble(np.asarray(feats()), [], method="sample")


@pytest.mark.slow
def test_cli_caption_ensemble(tmp_path, capsys):
    """CLI e2e: a self-ensemble (--ensemble-with the train run's own
    bundle) must produce captions identical to the single model —
    averaging a distribution with itself is the identity."""
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
    bundle = str(tmp_path / "member")
    main(["train", *common, "--tokens", token_file,
          "--split", train_file, "--features", feats_file,
          "--checkpoint-dir", ckpt, "--epochs", "1",
          "--batch-size", "4", "--bundle-out", bundle])
    capsys.readouterr()

    img0 = os.path.join(str(img_dir), sorted(os.listdir(img_dir))[0])
    main(["caption", *common, "--image", img0,
          "--checkpoint-dir", ckpt, "--method", "beam"])
    single = capsys.readouterr().out

    main(["caption", *common, "--image", img0,
          "--checkpoint-dir", ckpt, "--method", "beam",
          "--ensemble-with", bundle,
          "--ensemble-weights", "0.5,0.5"])
    ensembled = capsys.readouterr().out
    assert ensembled == single


def test_cli_ensemble_validations():
    from tpucap.cli.main import main

    with pytest.raises(SystemExit, match="ensemble-with"):
        main(["caption", "--image", "x.jpg", "--method", "greedy",
              "--ensemble-weights", "0.5,0.5"])
    with pytest.raises(SystemExit, match="weights"):
        main(["caption", "--image", "x.jpg", "--method", "greedy",
              "--ensemble-with", "b1", "--ensemble-weights", "0.5"])
    with pytest.raises(SystemExit, match="greedy|beam"):
        main(["caption", "--image", "x.jpg", "--method", "speculative",
              "--draft-bundle", "d", "--ensemble-with", "b1"])
