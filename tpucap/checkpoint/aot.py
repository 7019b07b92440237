"""AOT-compiled serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment artifact is a Keras ``.h5`` that the framework
re-builds and re-traces at load time (SURVEY.md §2.1 #13 — load_model +
per-step model.predict). The TPU-native analog is an ahead-of-time
SERIALIZED XLA PROGRAM: ``jax.export`` lowers the jitted decode engine to
StableHLO once at export time, and a serving process deserializes and
runs it WITHOUT importing the model zoo or re-tracing any Python — the
artifact pins the exact decode numerics shipped, is hermetic against
model-code drift, and can target several platforms at once (the default
exports one program runnable on both ``cpu`` and ``tpu``).

Because XLA programs have static shapes, the artifact carries a BATCH
LADDER — one program per requested batch size (by default the serving
micro-batcher's power-of-two bucket ladder), exactly the shape family
`tpucap.serve.CaptionServer` dispatches. :class:`AotCaptioner` therefore
duck-types the pipeline surface the server needs (``generate`` /
``generate_submit`` / ``encode_images`` / ``config`` / ``encoder``), so
``CaptionServer(AotCaptioner.load(dir))`` and
``tpucap serve --aot-bundle dir`` serve production traffic with zero
model code and zero tracing at startup.

Artifact layout (inside a ``pipeline.save()`` bundle directory)::

    <bundle>/
      config.json tokenizer.json params/   # the ordinary bundle
      aot/
        manifest.json                      # shapes, method, platforms
        decode_b{N}.stablehlo              # (params, features) -> (tokens, lengths)
        encoder_b{N}.stablehlo             # optional: (params, images) -> features
"""

from __future__ import annotations

import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"


def _aot_dir(directory: str) -> str:
    return os.path.join(os.path.abspath(directory), "aot")


def _feature_shape(pipeline) -> tuple:
    cfgE = pipeline.config.encoder
    if cfgE.features == "spatial":
        return (pipeline.encoder.spatial_positions, cfgE.feature_dim)
    return (cfgE.feature_dim,)


def _bucket_ladder(max_batch: int) -> list[int]:
    """THE serving bucket family — delegated to tpucap.serve._buckets so
    the exported program ladder can never drift from what CaptionServer
    dispatches. (Export-side only; the loader never imports serve.)"""
    from tpucap.serve import _buckets

    return list(_buckets(max_batch))


def export_decode(
    pipeline,
    directory: str,
    *,
    batch_size,
    method: str | None = None,
    beam_width: int | None = None,
    platforms: tuple = ("cpu", "tpu"),
    save_bundle: bool = True,
    include_encoder: bool = False,
    ladder: bool = False,
) -> dict:
    """Serialize the pipeline's decode program(s) (and optionally the
    encoder's) into ``<directory>/aot/``. Returns the manifest dict.

    ``batch_size`` is an int or a list of ints — one STATIC-shape
    program is exported per size. ``ladder=True`` expands an int into
    the serving bucket ladder (1, 2, 4, ..., batch_size), the shape
    family CaptionServer dispatches, making the bundle directly
    servable. ``save_bundle`` also writes ``pipeline.save(directory)``
    so the artifact is self-contained (config + tokenizer + params).
    """
    from jax import export as jax_export

    method = method or pipeline.config.decode.method
    beam_width = beam_width or pipeline.config.decode.beam_width
    if method not in ("greedy", "beam"):
        raise ValueError(f"export_decode supports greedy|beam, got {method!r}")
    if isinstance(batch_size, int):
        sizes = _bucket_ladder(batch_size) if ladder else [batch_size]
    else:
        sizes = sorted(set(int(b) for b in batch_size))
    if not sizes or sizes[0] < 1:
        raise ValueError(f"bad batch sizes {sizes}")
    if save_bundle:
        pipeline.save(directory)
    os.makedirs(_aot_dir(directory), exist_ok=True)

    dec_params = pipeline._inference_params()["decoder"]
    dtype = pipeline._infer_dtype()
    inner = pipeline._decode_fn(method, beam_width)

    # Return a plain tuple: DecodeResult is a registered dataclass pytree,
    # which jax.export cannot serialize without a custom registry — and
    # the loader should not need tpucap.decode at all.
    @jax.jit
    def decode_fn(params, features):
        res = inner(params, features)
        return res.tokens, res.lengths

    feat_shape = _feature_shape(pipeline)
    for b in sizes:
        feats = jnp.zeros((b,) + feat_shape, dtype)
        exported = jax_export.export(decode_fn, platforms=tuple(platforms))(
            dec_params, feats
        )
        path = os.path.join(_aot_dir(directory), f"decode_b{b}.stablehlo")
        with open(path, "wb") as f:
            f.write(bytes(exported.serialize()))

    manifest = {
        "kind": "tpucap-aot",
        "method": method,
        "beam_width": beam_width,
        "batch_sizes": sizes,
        "batch_size": sizes[-1],
        "feature_shape": list(feat_shape),
        "max_len": pipeline.config.decode.max_len,
        "platforms": list(platforms),
        "dtype": np.dtype(dtype).name,
        "precision": pipeline.config.precision,
        "end_id": int(pipeline._token_ids()[1]),
        "jax_version": jax.__version__,
        "has_encoder": bool(include_encoder),
    }
    if include_encoder:
        enc_params = pipeline._inference_params()["encoder"]
        size = pipeline.encoder.input_size

        @jax.jit
        def encode_fn(params, images):
            return pipeline._apply_encoder(params, images)

        for b in sizes:
            images = jnp.zeros((b, size, size, 3), dtype)
            enc_exported = jax_export.export(
                encode_fn, platforms=tuple(platforms)
            )(enc_params, images)
            path = os.path.join(
                _aot_dir(directory), f"encoder_b{b}.stablehlo"
            )
            with open(path, "wb") as f:
                f.write(bytes(enc_exported.serialize()))
        manifest["image_size"] = size
        manifest["preprocess_mode"] = pipeline.encoder.preprocess_mode
    with open(os.path.join(_aot_dir(directory), _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class AotCaptioner:
    """Serving loader for an AOT bundle: tokenizer + params + serialized
    programs. Deliberately imports NO model or decode-engine code — the
    StableHLO programs ARE the model.

    Duck-types the pipeline surface `tpucap.serve.CaptionServer` needs
    (generate / generate_submit / encode_images / config / encoder), so
    the whole online-serving layer — micro-batcher, bucket ladder, HTTP
    front-end — runs unchanged on the artifact:

    >>> cap = AotCaptioner.load("bundle/")
    >>> cap.caption(features)                 # offline batched API
    >>> CaptionServer(cap).caption(feat_row)  # online micro-batched
    """

    def __init__(self, *, directory, manifest, config, tokenizer,
                 dec_params, decode_calls, enc_params=None,
                 encode_calls=None):
        self.directory = directory
        self.manifest = manifest
        self.config = config
        self.tokenizer = tokenizer
        self._dec_params = dec_params
        self._decode = decode_calls  # {batch_size: call}
        self._enc_params = enc_params
        self._encode = encode_calls
        self._sizes = sorted(decode_calls)
        self._dtype = (
            jnp.bfloat16
            if manifest["dtype"] == "bfloat16"
            else np.dtype(manifest["dtype"])
        )
        # The pipeline-facade attribute CaptionServer/serve_http read.
        self.encoder = types.SimpleNamespace(
            input_size=manifest.get("image_size"),
            preprocess_mode=manifest.get("preprocess_mode"),
            spatial_positions=(
                manifest["feature_shape"][0]
                if len(manifest["feature_shape"]) == 2
                else None
            ),
        )

    @classmethod
    def load(cls, directory: str) -> "AotCaptioner":
        from jax import export as jax_export

        import orbax.checkpoint as ocp

        from tpucap.config import config_from_dict

        directory = os.path.abspath(directory)
        with open(os.path.join(_aot_dir(directory), _MANIFEST)) as f:
            manifest = json.load(f)
        with open(os.path.join(directory, "config.json")) as f:
            config = config_from_dict(json.load(f))
        from tpucap.text import load_tokenizer

        tokenizer = load_tokenizer(
            os.path.join(directory, "tokenizer.json")
        )
        ckptr = ocp.StandardCheckpointer()
        params = jax.tree_util.tree_map(
            jnp.asarray,
            ckptr.restore(os.path.join(directory, "params")),
        )
        if manifest["precision"] == "bf16":
            # The programs were exported over bf16-cast inference params;
            # re-apply the same cast the pipeline serves with.
            from tpucap.models.encoders.quantize import (
                cast_bf16_preserving_quant,
            )

            params = cast_bf16_preserving_quant(params)

        def load_programs(stem):
            calls = {}
            for b in manifest["batch_sizes"]:
                path = os.path.join(
                    _aot_dir(directory), f"{stem}_b{b}.stablehlo"
                )
                with open(path, "rb") as f:
                    calls[b] = jax_export.deserialize(f.read()).call
            return calls

        decode_calls = load_programs("decode")
        enc_params = encode_calls = None
        if manifest.get("has_encoder"):
            encode_calls = load_programs("encoder")
            enc_params = params["encoder"]
        return cls(
            directory=directory,
            manifest=manifest,
            config=config,
            tokenizer=tokenizer,
            dec_params=params["decoder"],
            decode_calls=decode_calls,
            enc_params=enc_params,
            encode_calls=encode_calls,
        )

    # -- program dispatch --------------------------------------------------

    def _covering_size(self, n: int) -> int:
        for b in self._sizes:
            if b >= n:
                return b
        raise ValueError(
            f"batch of {n} exceeds the largest exported program "
            f"({self._sizes[-1]}); re-export with a bigger batch_size "
            "or chunk via caption()"
        )

    def _pad_rows(self, x, to: int):
        """Zero-pad the batch dim on device (jnp) — no host sync, so
        generate_submit stays async even when ``x`` is the still-in-
        flight output of the encoder program."""
        n = x.shape[0]
        if n == to:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((to - n,) + tuple(x.shape[1:]), x.dtype)]
        )

    # -- pipeline facade (what CaptionServer drives) ------------------------

    def _check_method(self, method, beam_width):
        method = method or self.manifest["method"]
        if method != self.manifest["method"]:
            raise ValueError(
                f"bundle was exported with method="
                f"{self.manifest['method']!r}; got {method!r} — AOT "
                "programs are fixed at export time"
            )
        if (
            method == "beam"
            and beam_width
            and beam_width != self.manifest["beam_width"]
        ):
            raise ValueError(
                f"bundle was exported with beam_width="
                f"{self.manifest['beam_width']}; got {beam_width}"
            )

    def generate_submit(self, features, *, method=None, beam_width=None):
        """Async dispatch + finalizer, the CaptionServer contract: the
        program starts on device now; the returned zero-arg callable
        blocks and yields the captions."""
        self._check_method(method, beam_width)
        feats = jnp.asarray(features, self._dtype)
        n = feats.shape[0]
        b = self._covering_size(n)
        tokens, lengths = self._decode[b](
            self._dec_params, self._pad_rows(feats, b)
        )
        return lambda: self._detok(tokens[:n], lengths[:n])

    def generate(self, features, *, method=None, beam_width=None,
                 parallelism=None, **_):
        if parallelism not in (None, "none"):
            raise ValueError(
                "AOT bundles serve single-device programs; "
                f"parallelism={parallelism!r} is not available"
            )
        return self.generate_submit(
            features, method=method, beam_width=beam_width
        )()

    def encode_images(self, images):
        """(N, H, W, 3) preprocessed images -> feature rows, via the
        exported encoder program (bundle must carry include_encoder)."""
        if self._encode is None:
            raise ValueError(
                "bundle was exported without the encoder program "
                "(export_decode(include_encoder=True))"
            )
        imgs = jnp.asarray(images, self._dtype)
        n = imgs.shape[0]
        b = self._covering_size(n)
        feats = self._encode[b](self._enc_params, self._pad_rows(imgs, b))
        return feats[:n]

    # -- offline convenience -------------------------------------------------

    def _detok(self, tokens, lengths) -> list[str]:
        """Token matrix -> caption strings — EXACTLY the contract of
        tpucap.decode.text.ids_to_captions (take the first ``length``
        ids, strip one trailing endseq, join known words), restated here
        so the loader stays model-code-free. Parity is pinned by
        tests/test_aot_export.py against pipeline.generate."""
        end_id = self.manifest["end_id"]
        index_word = self.tokenizer.index_word
        out = []
        for row, n in zip(np.asarray(tokens), np.asarray(lengths)):
            ids = [int(t) for t in row[: int(n)]]
            if ids and ids[-1] == end_id:
                ids = ids[:-1]
            words = (index_word.get(i) for i in ids)
            out.append(" ".join(w for w in words if w is not None))
        return out

    def caption(self, features) -> list[str]:
        """(N, ...) feature rows -> N captions; N chunks at the largest
        exported size, the tail runs on the smallest covering program."""
        feats = np.asarray(features, np.float32)
        expect = tuple(self.manifest["feature_shape"])
        if feats.shape[1:] != expect:
            raise ValueError(
                f"feature rows {feats.shape[1:]} do not match the "
                f"exported shape {expect}"
            )
        B = self._sizes[-1]
        out: list[str] = []
        for s in range(0, feats.shape[0], B):
            out.extend(self.generate_submit(feats[s : s + B])())
        return out

    def caption_images(self, images) -> list[str]:
        """(N, H, W, 3) PREPROCESSED images -> captions (bundle must be
        exported with include_encoder=True)."""
        size = self.manifest.get("image_size")
        imgs = np.asarray(images)
        if size and imgs.shape[1:] != (size, size, 3):
            raise ValueError(
                f"images {imgs.shape[1:]} do not match the exported "
                f"({size}, {size}, 3)"
            )
        B = self._sizes[-1]
        out: list[str] = []
        for s in range(0, imgs.shape[0], B):
            feats = self.encode_images(imgs[s : s + B])
            out.extend(self.generate_submit(feats)())
        return out
