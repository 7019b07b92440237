"""Diverse beam search (decode/diverse.py, pipeline.generate_diverse).

Contracts:
- num_groups=1 IS standard beam search (token/length/score-exact vs
  beam_decode, any diversity);
- diversity=0 makes every group an independent exact beam search (each
  group's full beam set equals beam_decode's);
- 2- and 3-group runs match a per-step Python oracle implementing the
  grouped Hamming-penalty selection (tokens + true scores);
- a large penalty forces disjoint first words across groups;
- shared-key decoders (attention) and the transformer family compose;
- the pipeline API surfaces (caption, normalized_score) per group.
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
from tpucap.decode import beam_decode, diverse_beam_decode
from tpucap.models.decoders import (
    AttentionDecoder,
    MergeDecoder,
    TransformerDecoder,
)
from tpucap.pipeline import CaptioningPipeline

VOCAB = 19
FEAT = 8
START, END = 1, 2
B = 3
MAX_LEN = 8
NEG = np.float32(-1e30)


def make_model(seed=0):
    dec = MergeDecoder(
        vocab_size=VOCAB, feature_dim=FEAT, embed_dim=10,
        hidden_dim=12, dropout_rate=0.0,
    )
    return dec, dec.init(jax.random.key(seed))


def feats(seed=5, spatial=False):
    shape = (B, 6, FEAT) if spatial else (B, FEAT)
    return jax.random.normal(jax.random.key(seed), shape)


def dbs_oracle(step_fn, params, state, *, num_groups, group_width,
               diversity, max_len=MAX_LEN, pad_id=0):
    """Per-step numpy mirror of grouped Hamming-penalty beam search.
    Not a transcription of the engine: per group it enumerates ALL
    kg*V candidates flat and python-sorts by (-penalized_score,
    parent*V + word) — the single-stage form of the engine's two-stage
    top-k — with frozen beams contributing one pad candidate."""
    G, kg = num_groups, group_width
    Bn = jax.tree_util.tree_leaves(state)[0].shape[0]
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, G * kg, axis=0), state
    )
    scores = np.full((Bn, G, kg), NEG, np.float32)
    scores[:, :, 0] = 0.0
    sel = scores.copy()  # augmented (selection) objective
    seqs = [[[[] for _ in range(kg)] for _ in range(G)]
            for _ in range(Bn)]
    fin = np.zeros((Bn, G, kg), bool)
    last = np.full((Bn, G, kg), START, np.int32)

    for _t in range(max_len):
        if fin.all():
            break
        logits, new_state = step_fn(
            params, state, jnp.asarray(last.reshape(-1))
        )
        logp = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits).astype(jnp.float32))
        ).reshape(Bn, G, kg, -1)
        V = logp.shape[-1]
        parent_all = np.zeros((Bn, G, kg), np.int32)
        new_scores, new_sel = scores.copy(), sel.copy()
        new_fin, new_last = fin.copy(), last.copy()
        new_seqs = [[[None] * kg for _ in range(G)] for _ in range(Bn)]
        for b in range(Bn):
            n = np.zeros((V,), np.float32)
            for g in range(G):
                cands = []  # (sel, tie, parent, word, true, frozen)
                for j in range(kg):
                    if fin[b, g, j]:
                        cands.append((sel[b, g, j], j * V, j, pad_id,
                                      scores[b, g, j], True))
                        continue
                    for v in range(V):
                        if v == pad_id:
                            continue
                        s_sel = np.float32(
                            sel[b, g, j] + logp[b, g, j, v]
                            - diversity * n[v]
                        )
                        s_true = np.float32(
                            scores[b, g, j] + logp[b, g, j, v]
                        )
                        cands.append(
                            (s_sel, j * V + v, j, v, s_true, False)
                        )
                cands.sort(key=lambda c: (-c[0], c[1]))
                emitted = []
                for slot, (s_sel, _, parent, word, s_true,
                           frozen) in enumerate(cands[:kg]):
                    parent_all[b, g, slot] = parent
                    new_sel[b, g, slot] = s_sel
                    new_scores[b, g, slot] = s_true
                    if frozen:
                        new_seqs[b][g][slot] = list(seqs[b][g][parent])
                        new_fin[b, g, slot] = True
                        new_last[b, g, slot] = pad_id
                    else:
                        new_seqs[b][g][slot] = (
                            list(seqs[b][g][parent]) + [word]
                        )
                        new_fin[b, g, slot] = word == END
                        new_last[b, g, slot] = word
                        emitted.append(word)
                for w in emitted:
                    n[w] += 1.0

        def gather(x):
            xn = np.asarray(x)
            xr = xn.reshape((Bn, G, kg) + xn.shape[1:])
            out = np.stack([
                np.stack([xr[b, g][parent_all[b, g]] for g in range(G)])
                for b in range(Bn)
            ])
            return jnp.asarray(out.reshape((Bn * G * kg,) + xn.shape[1:]))

        state = jax.tree_util.tree_map(gather, new_state)
        scores, sel, fin, last = new_scores, new_sel, new_fin, new_last
        seqs = new_seqs
    return seqs, scores, fin


def _engine(dec, params, f, *, G, kg, lam, state=None, min_len=0):
    return jax.jit(
        lambda p, x: diverse_beam_decode(
            dec.step, p, dec.init_state(p, x),
            start_id=START, end_id=END, max_len=MAX_LEN,
            num_groups=G, group_width=kg, diversity=lam,
            min_len=min_len, decoder=dec,
        )
    )(params, f)


def _beam_tokens_as_lists(tokens, lengths):
    out = []
    for row, ln in zip(np.asarray(tokens), np.asarray(lengths)):
        out.append(list(row[: int(ln)]))
    return out


class TestEquivalences:
    @pytest.mark.parametrize("lam", [0.0, 0.7])
    def test_single_group_is_beam_search(self, lam):
        dec, params = make_model()
        f = feats()
        res = _engine(dec, params, f, G=1, kg=3, lam=lam)
        ref = jax.jit(
            lambda p, x: beam_decode(
                dec.step, p, dec.init_state(p, x),
                start_id=START, end_id=END, max_len=MAX_LEN,
                beam_width=3, decoder=dec,
            )
        )(params, f)
        np.testing.assert_array_equal(
            np.asarray(res.tokens[:, 0]), np.asarray(ref.tokens)
        )
        np.testing.assert_array_equal(
            np.asarray(res.beam_tokens[:, 0]), np.asarray(ref.beam_tokens)
        )
        np.testing.assert_allclose(
            np.asarray(res.beam_scores[:, 0]),
            np.asarray(ref.beam_scores),
            atol=1e-5,
        )

    def test_zero_diversity_groups_are_independent_beams(self):
        dec, params = make_model()
        f = feats()
        res = _engine(dec, params, f, G=3, kg=2, lam=0.0)
        ref = jax.jit(
            lambda p, x: beam_decode(
                dec.step, p, dec.init_state(p, x),
                start_id=START, end_id=END, max_len=MAX_LEN,
                beam_width=2, decoder=dec,
            )
        )(params, f)
        for g in range(3):
            np.testing.assert_array_equal(
                np.asarray(res.beam_tokens[:, g]),
                np.asarray(ref.beam_tokens),
            )


class TestOracleParity:
    @pytest.mark.parametrize("G,kg,lam", [(2, 2, 0.5), (3, 2, 1.0),
                                          (2, 3, 0.25)])
    def test_matches_oracle(self, G, kg, lam):
        dec, params = make_model()
        f = feats()
        res = _engine(dec, params, f, G=G, kg=kg, lam=lam)
        seqs, oscores, _ = dbs_oracle(
            dec.step, params, dec.init_state(params, f),
            num_groups=G, group_width=kg, diversity=lam,
        )
        toks = np.asarray(res.beam_tokens)
        lens = np.asarray(res.beam_lengths)
        for b in range(B):
            for g in range(G):
                for j in range(kg):
                    assert (
                        list(toks[b, g, j][: lens[b, g, j]])
                        == seqs[b][g][j]
                    ), (b, g, j)
        np.testing.assert_allclose(
            np.asarray(res.beam_scores), oscores, atol=2e-4
        )


class TestDiversityEffect:
    def test_large_penalty_disjoint_first_words(self):
        dec, params = make_model()
        f = feats()
        res = _engine(dec, params, f, G=2, kg=3, lam=1e6)
        first = np.asarray(res.beam_tokens)[:, :, :, 0]  # (B, G, kg)
        for b in range(B):
            g0 = set(first[b, 0].tolist())
            g1 = set(first[b, 1].tolist())
            assert not (g0 & g1), (b, g0, g1)

    def test_shared_key_decoder_and_transformer(self):
        att = AttentionDecoder(
            vocab_size=VOCAB, feature_dim=FEAT, embed_dim=10,
            hidden_dim=12, attention_dim=8, dropout_rate=0.0,
        )
        pa = att.init(jax.random.key(0))
        res = _engine(att, pa, feats(spatial=True), G=2, kg=2, lam=0.8)
        assert np.asarray(res.tokens).shape == (B, 2, MAX_LEN)

        tr = TransformerDecoder(
            vocab_size=VOCAB, feature_dim=FEAT, hidden_dim=16,
            num_layers=1, num_heads=2, mlp_dim=24,
            max_positions=MAX_LEN + 2, dropout_rate=0.0,
        )
        pt = tr.init(jax.random.key(1))
        res = _engine(tr, pt, feats(), G=2, kg=2, lam=0.8)
        assert np.asarray(res.tokens).shape == (B, 2, MAX_LEN)

    def test_validation(self):
        dec, params = make_model()
        with pytest.raises(ValueError, match="num_groups"):
            diverse_beam_decode(
                dec.step, params, dec.init_state(params, feats()),
                start_id=START, end_id=END, max_len=MAX_LEN,
                num_groups=0, group_width=2,
            )


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


class TestPipelineAPI:
    def test_shape_and_group_zero_is_beam(self):
        pipe = _pipe()
        f = np.asarray(feats())
        out = pipe.generate_diverse(
            f, num_groups=2, group_width=3, diversity=0.0
        )
        assert len(out) == B and all(len(row) == 2 for row in out)
        beam_caps = pipe.generate(f, method="beam", beam_width=3)
        # diversity=0: every group equals plain beam search.
        for row, ref in zip(out, beam_caps):
            assert row[0][0] == ref and row[1][0] == ref

    def test_groups_differ_under_penalty(self):
        pipe = _pipe()
        f = np.asarray(feats())
        out = pipe.generate_diverse(
            f, num_groups=2, group_width=3, diversity=1e6
        )
        # First words must differ (disjoint first-word sets).
        for row in out:
            w0 = row[0][0].split()[0] if row[0][0] else ""
            w1 = row[1][0].split()[0] if row[1][0] else ""
            assert w0 != w1 or (w0 == "" and w1 == "")


@pytest.mark.slow
def test_cli_caption_diverse(tmp_path, capsys):
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
          "--checkpoint-dir", ckpt, "--method", "diverse",
          "--diverse-groups", "2", "--beam-width", "3",
          "--diversity", "0.8"])
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith(img0)]
    assert len(lines) == 2
    assert "[group 0" in lines[0] and "[group 1" in lines[1]
