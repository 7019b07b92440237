"""AOT serving artifacts (checkpoint/aot.py): the serialized StableHLO
decode program must reproduce pipeline.generate exactly — the loader
(AotCaptioner) uses no model or decode-engine code, so caption parity
here proves the artifact is self-contained."""

import numpy as np
import pytest

from tpucap.checkpoint import AotCaptioner, export_decode
from tpucap.config import (
    Config,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    TrainConfig,
)
from tpucap.pipeline import CaptioningPipeline
from tpucap.text import Tokenizer


def make_pipe(toy_corpus, *, decoder="lstm1", features="pooled",
              precision="f32"):
    from tpucap.config import encoder_config

    cfg = Config(
        encoder=encoder_config("tiny_cnn", features),
        decoder=DecoderConfig(
            name=decoder, embed_dim=8, hidden_dim=16, dropout_rate=0.0
        ),
        decode=DecodeConfig(max_len=10),
        train=TrainConfig(batch_size=4, epochs=1, seed=0),
        precision=precision,
    )
    pipe = CaptioningPipeline(cfg)
    tok = Tokenizer()
    tok.fit_on_texts(toy_corpus)
    pipe.tokenizer = tok
    pipe.build()
    return pipe


def feat_rows(pipe, rng, n):
    shape = (
        (pipe.encoder.spatial_positions, pipe.config.encoder.feature_dim)
        if pipe.config.encoder.features == "spatial"
        else (pipe.config.encoder.feature_dim,)
    )
    return rng.normal(size=(n,) + shape).astype(np.float32)


@pytest.mark.parametrize("method", ["greedy", "beam"])
def test_aot_decode_parity(method, toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus)
    feats = feat_rows(pipe, rng, 7)  # not a multiple of the batch: the
    # loader must chunk 4 + pad 3.
    manifest = export_decode(
        pipe, str(tmp_path / "bundle"), batch_size=4, method=method
    )
    assert manifest["batch_size"] == 4
    cap = AotCaptioner.load(str(tmp_path / "bundle"))
    got = cap.caption(feats)
    want = pipe.generate(feats, method=method)
    assert got == want


def test_aot_attention_spatial_features(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus, decoder="attention", features="spatial")
    feats = feat_rows(pipe, rng, 4)
    export_decode(
        pipe, str(tmp_path / "b"), batch_size=4, method="greedy"
    )
    cap = AotCaptioner.load(str(tmp_path / "b"))
    assert cap.caption(feats) == pipe.generate(feats, method="greedy")
    with pytest.raises(ValueError, match="exported shape"):
        cap.caption(rng.normal(size=(2, 8)).astype(np.float32))


def test_aot_with_encoder_program(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus)
    size = pipe.encoder.input_size
    images = rng.normal(size=(5, size, size, 3)).astype(np.float32)
    export_decode(
        pipe,
        str(tmp_path / "b"),
        batch_size=4,
        method="greedy",
        include_encoder=True,
    )
    cap = AotCaptioner.load(str(tmp_path / "b"))
    got = cap.caption_images(images)
    import jax.numpy as jnp

    feats = pipe._apply_encoder(
        pipe._inference_params()["encoder"], jnp.asarray(images)
    )
    want = pipe.generate(np.asarray(feats), method="greedy")
    assert got == want
    with pytest.raises(ValueError, match="do not match"):
        cap.caption_images(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))


def test_aot_bf16_bundle(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus, precision="bf16")
    feats = feat_rows(pipe, rng, 4)
    export_decode(pipe, str(tmp_path / "b"), batch_size=4)
    cap = AotCaptioner.load(str(tmp_path / "b"))
    assert cap.manifest["dtype"] == "bfloat16"
    assert cap.caption(feats) == pipe.generate(feats, method="greedy")


def test_aot_caption_images_requires_encoder(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus)
    export_decode(pipe, str(tmp_path / "b"), batch_size=2)
    cap = AotCaptioner.load(str(tmp_path / "b"))
    with pytest.raises(ValueError, match="without the encoder"):
        cap.caption_images(np.zeros((1, 32, 32, 3), np.float32))


def test_aot_rejects_sampling(toy_corpus, tmp_path):
    pipe = make_pipe(toy_corpus)
    with pytest.raises(ValueError, match="greedy|beam"):
        export_decode(
            pipe, str(tmp_path / "b"), batch_size=2, method="sample"
        )


def test_aot_ladder_and_caption_server_facade(toy_corpus, rng, tmp_path):
    """ladder=True exports the serving bucket family and the loader
    duck-types CaptionServer's pipeline surface: micro-batched serving
    out of the artifact matches pipeline.generate."""
    from tpucap.serve import CaptionServer

    pipe = make_pipe(toy_corpus)
    manifest = export_decode(
        pipe, str(tmp_path / "b"), batch_size=4, ladder=True
    )
    assert manifest["batch_sizes"] == [1, 2, 4]
    cap = AotCaptioner.load(str(tmp_path / "b"))
    feats = feat_rows(pipe, rng, 5)
    want = pipe.generate(feats, method="greedy")
    # Offline chunked API covers 4 + tail-1 on the covering programs.
    assert cap.caption(feats) == want
    # Online: the real micro-batcher over the facade.
    with CaptionServer(cap, max_batch=4, max_delay_ms=2.0) as srv:
        futs = [srv.submit(feats[i]) for i in range(5)]
        got = [f.result(timeout=60) for f in futs]
    assert got == want


def test_aot_facade_guards(toy_corpus, rng, tmp_path):
    pipe = make_pipe(toy_corpus)
    export_decode(pipe, str(tmp_path / "b"), batch_size=2)
    cap = AotCaptioner.load(str(tmp_path / "b"))
    feats = feat_rows(pipe, rng, 2)
    with pytest.raises(ValueError, match="exported with method"):
        cap.generate(feats, method="beam")
    with pytest.raises(ValueError, match="parallelism"):
        cap.generate(feats, parallelism="dp")
    with pytest.raises(ValueError, match="largest exported"):
        cap.generate(feat_rows(pipe, rng, 3))


def test_aot_http_serving(toy_corpus, rng, tmp_path):
    """The full deployment story: export ladder bundle with encoder ->
    CaptionHTTPServer over AotCaptioner serves /caption_features and
    the JPEG /caption path with pipeline-parity captions."""
    import http.client
    import json as js

    from tpucap.serve_http import CaptionHTTPServer

    pipe = make_pipe(toy_corpus)
    export_decode(
        pipe,
        str(tmp_path / "b"),
        batch_size=4,
        ladder=True,
        include_encoder=True,
    )
    cap = AotCaptioner.load(str(tmp_path / "b"))
    srv = CaptionHTTPServer(
        cap, port=0, max_batch=4, max_delay_ms=5, method="greedy"
    )
    srv.warmup()
    srv.serve_background()
    try:
        host, port = srv.address
        feats = feat_rows(pipe, rng, 1)[0]
        body = js.dumps({"features": feats.tolist()}).encode()
        conn = http.client.HTTPConnection(host, port, timeout=120)
        conn.request("POST", "/caption_features", body=body)
        resp = conn.getresponse()
        payload = js.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert payload["caption"] == pipe.generate(
            feats[None], method="greedy"
        )[0]
    finally:
        srv.close()


def test_cli_export_format_aot(tmp_path):
    """extract -> train -> export --format aot via the CLI; the bundle
    loads with AotCaptioner and captions the training images' features."""
    import os

    import numpy as np

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=5
    )
    feats_path = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out",
          feats_path, "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats_path, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    bundle = str(tmp_path / "aot_bundle")
    main(["export", *common, "--checkpoint-dir", ckpt, "--out", bundle,
          "--format", "aot", "--aot-batch-size", "4"])
    assert os.path.exists(
        os.path.join(bundle, "aot", "decode_b4.stablehlo")
    )
    cap = AotCaptioner.load(bundle)
    with np.load(feats_path) as z:
        rows = np.stack([z[k] for k in list(z.files)[:3]])
    caps = cap.caption(rows)
    assert len(caps) == 3 and all(isinstance(c, str) for c in caps)


def test_aot_quantized_encoder_bundle(toy_corpus, rng, tmp_path):
    """An int8-quantized encoder exports and round-trips: the program
    bakes the quantized dispatch, the bundle stores the int8+scale
    tree, and captions match the quantized pipeline exactly."""
    pipe = make_pipe(toy_corpus)
    pipe.quantize_encoder()
    size = pipe.encoder.input_size
    images = rng.normal(size=(3, size, size, 3)).astype(np.float32)
    export_decode(
        pipe,
        str(tmp_path / "b"),
        batch_size=4,
        include_encoder=True,
    )
    cap = AotCaptioner.load(str(tmp_path / "b"))
    import jax.numpy as jnp

    feats = pipe._apply_encoder(
        pipe._inference_params()["encoder"], jnp.asarray(images)
    )
    want = pipe.generate(np.asarray(feats), method="greedy")
    assert cap.caption_images(images) == want


def test_cli_export_aot_beam_method(tmp_path):
    """`export --format aot --method beam` bakes beam programs (the CLI
    previously had no --method flag on export, so only greedy bundles
    were producible)."""
    import json
    import os

    from tpucap.cli.main import main
    from tpucap.data import generate_fixture_dataset

    img_dir, token_file, train_file, _ = generate_fixture_dataset(
        tmp_path, n_images=6, image_size=32, seed=9
    )
    feats_path = str(tmp_path / "f.npz")
    ckpt = str(tmp_path / "ckpt")
    common = ["--encoder", "tiny_cnn", "--max-len", "12"]
    main(["extract", *common, "--images", str(img_dir), "--out",
          feats_path, "--batch-size", "4"])
    main(["train", *common, "--tokens", token_file, "--split", train_file,
          "--features", feats_path, "--checkpoint-dir", ckpt,
          "--epochs", "1", "--batch-size", "4"])
    bundle = str(tmp_path / "b")
    main(["export", *common, "--checkpoint-dir", ckpt, "--out", bundle,
          "--format", "aot", "--aot-batch-size", "2",
          "--method", "beam", "--beam-width", "2"])
    with open(os.path.join(bundle, "aot", "manifest.json")) as f:
        m = json.load(f)
    assert m["method"] == "beam" and m["beam_width"] == 2
