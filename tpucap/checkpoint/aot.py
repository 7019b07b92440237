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

Artifact layout (inside a ``pipeline.save()`` bundle directory)::

    <bundle>/
      config.json tokenizer.json params/   # the ordinary bundle
      aot/
        manifest.json                      # shapes, method, platforms
        decode.stablehlo                   # (params, features) -> (tokens, lengths)
        encoder.stablehlo                  # optional: (params, images) -> features

:class:`AotCaptioner` is the loader: tokenizer + params + programs only —
``tpucap.models`` / ``tpucap.decode`` never load, which is the point.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

_MANIFEST = "manifest.json"
_DECODE = "decode.stablehlo"
_ENCODER = "encoder.stablehlo"


def _aot_dir(directory: str) -> str:
    return os.path.join(os.path.abspath(directory), "aot")


def _feature_shape(pipeline) -> tuple:
    cfgE = pipeline.config.encoder
    if cfgE.features == "spatial":
        return (pipeline.encoder.spatial_positions, cfgE.feature_dim)
    return (cfgE.feature_dim,)


def export_decode(
    pipeline,
    directory: str,
    *,
    batch_size: int,
    method: str | None = None,
    beam_width: int | None = None,
    platforms: tuple = ("cpu", "tpu"),
    save_bundle: bool = True,
    include_encoder: bool = False,
) -> dict:
    """Serialize the pipeline's decode program (and optionally the
    encoder) into ``<directory>/aot/``. Returns the manifest dict.

    The exported program has STATIC shapes — ``(batch_size, *feature
    shape)`` in, ``(batch_size, max_len)`` tokens out — matching how the
    engines already run in production (every serving path here pads to
    fixed shapes; a dynamic batch dim would forfeit XLA's tiling).
    ``save_bundle`` also writes ``pipeline.save(directory)`` so the
    artifact is self-contained (config + tokenizer + params).
    """
    from jax import export as jax_export

    method = method or pipeline.config.decode.method
    beam_width = beam_width or pipeline.config.decode.beam_width
    if method not in ("greedy", "beam"):
        raise ValueError(f"export_decode supports greedy|beam, got {method!r}")
    if save_bundle:
        pipeline.save(directory)
    os.makedirs(_aot_dir(directory), exist_ok=True)

    dec_params = pipeline._inference_params()["decoder"]
    dtype = pipeline._infer_dtype()
    feats = jnp.zeros((batch_size,) + _feature_shape(pipeline), dtype)
    inner = pipeline._decode_fn(method, beam_width)

    # Return a plain tuple: DecodeResult is a registered dataclass pytree,
    # which jax.export cannot serialize without a custom registry — and
    # the loader should not need tpucap.decode at all.
    @jax.jit
    def decode_fn(params, features):
        res = inner(params, features)
        return res.tokens, res.lengths

    exported = jax_export.export(decode_fn, platforms=tuple(platforms))(
        dec_params, feats
    )
    with open(os.path.join(_aot_dir(directory), _DECODE), "wb") as f:
        f.write(bytes(exported.serialize()))

    manifest = {
        "kind": "tpucap-aot",
        "method": method,
        "beam_width": beam_width,
        "batch_size": batch_size,
        "feature_shape": list(_feature_shape(pipeline)),
        "max_len": pipeline.config.decode.max_len,
        "platforms": list(platforms),
        "dtype": np.dtype(dtype).name
        if dtype != jnp.bfloat16
        else "bfloat16",
        "precision": pipeline.config.precision,
        "end_id": pipeline._token_ids()[1],
        "jax_version": jax.__version__,
        "has_encoder": bool(include_encoder),
    }
    if include_encoder:
        enc_params = pipeline._inference_params()["encoder"]
        size = pipeline.encoder.input_size
        images = jnp.zeros((batch_size, size, size, 3), dtype)

        @jax.jit
        def encode_fn(params, images):
            return pipeline._apply_encoder(params, images)

        enc_exported = jax_export.export(
            encode_fn, platforms=tuple(platforms)
        )(enc_params, images)
        with open(os.path.join(_aot_dir(directory), _ENCODER), "wb") as f:
            f.write(bytes(enc_exported.serialize()))
        manifest["image_size"] = size
        manifest["preprocess_mode"] = pipeline.encoder.preprocess_mode
    with open(os.path.join(_aot_dir(directory), _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class AotCaptioner:
    """Serving loader for an AOT bundle: tokenizer + params + serialized
    programs. Deliberately imports NO model or decode-engine code — the
    StableHLO program IS the model.

    >>> cap = AotCaptioner.load("bundle/")
    >>> cap.caption(features)          # (N, D) or (N, L, D) -> captions
    >>> cap.caption_images(images)     # exported with include_encoder
    """

    def __init__(self, *, manifest, tokenizer, dec_params, decode_call,
                 enc_params=None, encode_call=None):
        self.manifest = manifest
        self.tokenizer = tokenizer
        self._dec_params = dec_params
        self._decode = decode_call
        self._enc_params = enc_params
        self._encode = encode_call
        self._dtype = (
            jnp.bfloat16
            if manifest["dtype"] == "bfloat16"
            else np.dtype(manifest["dtype"])
        )

    @classmethod
    def load(cls, directory: str) -> "AotCaptioner":
        from jax import export as jax_export

        import orbax.checkpoint as ocp

        from tpucap.text import Tokenizer

        directory = os.path.abspath(directory)
        with open(os.path.join(_aot_dir(directory), _MANIFEST)) as f:
            manifest = json.load(f)
        tokenizer = Tokenizer.load(
            os.path.join(directory, "tokenizer.json")
        )
        ckptr = ocp.StandardCheckpointer()
        params = jax.tree_util.tree_map(
            jnp.asarray,
            ckptr.restore(os.path.join(directory, "params")),
        )
        if manifest["precision"] == "bf16":
            # The program was exported over bf16-cast inference params;
            # re-apply the same cast the pipeline serves with.
            from tpucap.models.encoders.quantize import (
                cast_bf16_preserving_quant,
            )

            params = cast_bf16_preserving_quant(params)

        with open(os.path.join(_aot_dir(directory), _DECODE), "rb") as f:
            decode_call = jax_export.deserialize(f.read()).call
        enc_params = encode_call = None
        if manifest.get("has_encoder"):
            with open(
                os.path.join(_aot_dir(directory), _ENCODER), "rb"
            ) as f:
                encode_call = jax_export.deserialize(f.read()).call
            enc_params = params["encoder"]
        return cls(
            manifest=manifest,
            tokenizer=tokenizer,
            dec_params=params["decoder"],
            decode_call=decode_call,
            enc_params=enc_params,
            encode_call=encode_call,
        )

    # -- serving ---------------------------------------------------------

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
        """(N, ...) feature rows -> N captions. N is chunked/padded to
        the exported batch size (one static program shape)."""
        B = self.manifest["batch_size"]
        feats = np.asarray(features)
        expect = tuple(self.manifest["feature_shape"])
        if feats.shape[1:] != expect:
            raise ValueError(
                f"feature rows {feats.shape[1:]} do not match the "
                f"exported shape {expect}"
            )
        out: list[str] = []
        for s in range(0, feats.shape[0], B):
            chunk = feats[s : s + B]
            n = chunk.shape[0]
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n,) + expect, chunk.dtype)]
                )
            tokens, lengths = self._decode(
                self._dec_params, jnp.asarray(chunk, self._dtype)
            )
            out.extend(self._detok(tokens, lengths)[:n])
        return out

    def caption_images(self, images) -> list[str]:
        """(N, H, W, 3) PREPROCESSED images -> captions (bundle must be
        exported with include_encoder=True)."""
        if self._encode is None:
            raise ValueError(
                "bundle was exported without the encoder program "
                "(export_decode(include_encoder=True))"
            )
        B = self.manifest["batch_size"]
        size = self.manifest["image_size"]
        imgs = np.asarray(images)
        if imgs.shape[1:] != (size, size, 3):
            raise ValueError(
                f"images {imgs.shape[1:]} do not match the exported "
                f"({size}, {size}, 3)"
            )
        out: list[str] = []
        for s in range(0, imgs.shape[0], B):
            chunk = imgs[s : s + B]
            n = chunk.shape[0]
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n, size, size, 3), chunk.dtype)]
                )
            feats = self._encode(
                self._enc_params, jnp.asarray(chunk, self._dtype)
            )
            tokens, lengths = self._decode(self._dec_params, feats)
            out.extend(self._detok(tokens, lengths)[:n])
        return out
