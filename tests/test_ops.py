"""ops tier tests: C++ JPEG decode vs PIL, fused preprocessing vs host
oracle, pallas LSTM step vs reference cell (interpret mode on CPU)."""

import io

import numpy as np
import pytest

from tpucap.data.preprocess import preprocess_input


def _make_jpegs(rng, n=4, hw=(48, 64)):
    from PIL import Image

    blobs = []
    for _ in range(n):
        arr = rng.integers(0, 255, size=(*hw, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        blobs.append(buf.getvalue())
    return blobs


class TestJpegDecode:
    def test_native_builds(self):
        from tpucap.ops import jpeg

        assert jpeg.native_available(), "C++ jpeg extension failed to build"

    def test_native_matches_pil_no_resize(self, rng):
        from tpucap.ops import jpeg

        blobs = _make_jpegs(rng, n=3, hw=(32, 32))
        native = jpeg.decode_jpeg_batch(blobs, 32)
        pil = jpeg.decode_jpeg_batch(blobs, 32, force_fallback=True)
        # Same codec (libjpeg under PIL too) at native size -> identical.
        np.testing.assert_array_equal(native, pil)

    def test_native_exact_resize_matches_pil(self, rng):
        """fast_scale=False: full decode + nearest resize == PIL bit-exact."""
        from tpucap.ops import jpeg

        blobs = _make_jpegs(rng, n=2, hw=(96, 80))
        native = jpeg.decode_jpeg_batch(blobs, 48, fast_scale=False)
        pil = jpeg.decode_jpeg_batch(blobs, 48, force_fallback=True)
        np.testing.assert_array_equal(native, pil)

    def test_native_fast_scale_close_on_smooth_images(self):
        """The scaled-IDCT fast path resamples on a different grid; on
        smooth (real-photo-like) content it must stay close to PIL."""
        from PIL import Image

        from tpucap.ops import jpeg

        yy, xx = np.mgrid[0:96, 0:80].astype(np.float32)
        img = np.stack(
            [100 + yy, 50 + xx, 80 + (yy + xx) / 2], axis=-1
        ).clip(0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=95)
        blobs = [buf.getvalue()]

        native = jpeg.decode_jpeg_batch(blobs, 48, fast_scale=True)
        pil = jpeg.decode_jpeg_batch(blobs, 48, force_fallback=True)
        diff = np.abs(native.astype(int) - pil.astype(int))
        assert np.mean(diff) < 3.0, np.mean(diff)

    def test_decode_files(self, tmp_path, rng):
        from tpucap.ops import jpeg

        blobs = _make_jpegs(rng, n=2)
        paths = []
        for i, b in enumerate(blobs):
            p = tmp_path / f"{i}.jpg"
            p.write_bytes(b)
            paths.append(p)
        out = jpeg.decode_jpeg_files(paths, 32)
        assert out.shape == (2, 32, 32, 3)

    def test_bad_jpeg_raises(self):
        from tpucap.ops import jpeg

        if not jpeg.native_available():
            pytest.skip("no native extension")
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_batch([b"not a jpeg"], 32)


class TestFusedPreprocess:
    @pytest.mark.parametrize("mode", ["caffe", "tf", "torch"])
    def test_normalize_matches_host_oracle(self, mode, rng):
        from tpucap.ops.preprocess import normalize_images

        x = rng.integers(0, 255, size=(2, 8, 8, 3)).astype(np.uint8)
        ours = np.asarray(normalize_images(x, mode, use_pallas=False))
        ref = preprocess_input(x.astype(np.float32), mode)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_resize_nearest_matches_pil_convention(self, rng):
        from PIL import Image

        from tpucap.ops.preprocess import resize_nearest

        arr = rng.integers(0, 255, size=(40, 56, 3)).astype(np.uint8)
        ours = np.asarray(resize_nearest(arr[None], 24))[0]
        ref = np.asarray(
            Image.fromarray(arr).resize((24, 24), Image.Resampling.NEAREST)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_fused_pipeline(self, rng):
        from tpucap.ops.preprocess import fused_preprocess

        x = rng.integers(0, 255, size=(2, 40, 40, 3)).astype(np.uint8)
        out = np.asarray(fused_preprocess(x, 32, "caffe", use_pallas=False))
        assert out.shape == (2, 32, 32, 3)
        # Spot-check one pixel: caffe = BGR - mean.
        from tpucap.ops.preprocess import _nearest_indices

        r = _nearest_indices(32, 40)
        pix = x[0, r[0], r[0]].astype(np.float32)
        np.testing.assert_allclose(
            out[0, 0, 0],
            pix[::-1] - np.array([103.939, 116.779, 123.68]),
            atol=1e-4,
        )


class TestPallasLSTM:
    def test_fused_step_matches_reference(self, rng):
        import jax

        from tpucap.models.layers import init_lstm_cell, lstm_cell_step
        from tpucap.ops.pallas.lstm_step import fused_lstm_step

        B, E, U = 8, 16, 32
        p = init_lstm_cell(jax.random.key(0), E, U)
        x = rng.normal(size=(B, E)).astype(np.float32)
        h = rng.normal(size=(B, U)).astype(np.float32)
        c = rng.normal(size=(B, U)).astype(np.float32)

        h_ref, c_ref = lstm_cell_step(p, x, h, c)
        h_out, c_out = fused_lstm_step(p, x, h, c, interpret=True)
        np.testing.assert_allclose(
            np.asarray(h_out), np.asarray(h_ref), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(c_out), np.asarray(c_ref), atol=1e-6
        )


class TestPallasDecoderStep:
    def _setup(self, rng, B=8, E=16, U=32, V=64):
        import jax

        from tpucap.models.decoders import build_decoder

        dec = build_decoder(
            "lstm1", vocab_size=V, feature_dim=12, embed_dim=E, hidden_dim=U
        )
        params = dec.init(jax.random.key(0))
        feats = rng.normal(size=(B, 12)).astype(np.float32)
        import jax.numpy as jnp

        state = dec.init_state(params, jnp.asarray(feats))
        token = jnp.asarray(rng.integers(1, V, size=(B,)).astype(np.int32))
        return dec, params, state, token

    def test_fused_step_matches_reference(self, rng):
        import jax

        from tpucap.ops.pallas.decoder_step import make_fused_merge_step

        dec, params, state, token = self._setup(rng)
        logits_ref, st_ref = dec.step(params, state, token)
        fused = make_fused_merge_step(dec, tile_v=32, interpret=True)
        logits, st = fused(params, state, token)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_ref), atol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(st_ref),
            jax.tree_util.tree_leaves(st),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )

    def test_fused_step_in_greedy_decode(self, rng):
        """The fused step drives the greedy engine token-exactly."""
        from tpucap.decode import greedy_decode
        from tpucap.ops.pallas.decoder_step import make_fused_merge_step

        dec, params, state, _ = self._setup(rng)
        ref = greedy_decode(
            dec.step, params, state, start_id=1, end_id=2, max_len=8
        )
        fused = make_fused_merge_step(dec, tile_v=32, interpret=True)
        out = greedy_decode(
            fused, params, state, start_id=1, end_id=2, max_len=8
        )
        np.testing.assert_array_equal(
            np.asarray(ref.tokens), np.asarray(out.tokens)
        )


class TestFusedBottleneck:
    """ops/pallas/bottleneck.py vs the unfused XLA block (interpret mode)."""

    def _folded_resnet(self, rng):
        import jax
        import jax.numpy as jnp

        from tpucap.models.encoders.fold_bn import fold_resnet50
        from tpucap.models.encoders.resnet50 import ResNet50

        enc = ResNet50()
        p = enc.init(jax.random.key(0))
        # Randomize BN stats so folding is non-trivial.
        for k in list(p):
            if not k.endswith("_bn"):
                continue
            c = p[k]["mean"].shape[0]
            ks = jax.random.split(jax.random.key(abs(hash(k)) % 2**31), 4)
            p[k] = {
                "beta": jax.random.normal(ks[0], (c,)) * 0.1,
                "mean": jax.random.normal(ks[1], (c,)) * 0.1,
                "var": jnp.abs(jax.random.normal(ks[2], (c,))) + 0.5,
                "gamma": jnp.abs(jax.random.normal(ks[3], (c,))) + 0.5,
            }
        return enc, fold_resnet50(p)

    def test_block_matches_unfused(self, rng):
        import jax
        import jax.numpy as jnp

        from tpucap.ops.pallas.bottleneck import fused_identity_block

        enc, pf = self._folded_resnet(rng)
        blk = "conv2_block2"
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 256)).astype(np.float32))
        ref = enc._block(pf, x, blk, stride=1, conv_shortcut=False)
        out = fused_identity_block(
            pf[f"{blk}_1_conv"],
            pf[f"{blk}_2_conv"],
            pf[f"{blk}_3_conv"],
            x,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
        )

    def test_group_tiling_matches_group1(self, rng):
        """Batch tiling (group>1) changes nothing."""
        import jax.numpy as jnp

        from tpucap.ops.pallas.bottleneck import fused_identity_block

        enc, pf = self._folded_resnet(rng)
        blk = "conv4_block2"
        x = jnp.asarray(rng.normal(size=(4, 4, 4, 1024)).astype(np.float32))
        args = (
            pf[f"{blk}_1_conv"],
            pf[f"{blk}_2_conv"],
            pf[f"{blk}_3_conv"],
            x,
        )
        a = fused_identity_block(*args, group=1)
        b = fused_identity_block(*args, group=4)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )

    def test_indivisible_group_raises(self, rng):
        import jax.numpy as jnp
        import pytest

        from tpucap.ops.pallas.bottleneck import fused_identity_block

        enc, pf = self._folded_resnet(rng)
        blk = "conv2_block2"
        x = jnp.zeros((3, 8, 8, 256), jnp.float32)
        with pytest.raises(ValueError, match="not divisible"):
            fused_identity_block(
                pf[f"{blk}_1_conv"],
                pf[f"{blk}_2_conv"],
                pf[f"{blk}_3_conv"],
                x,
                group=2,
            )

    def test_encoder_apply_fused_parity(self, rng):
        """Whole-encoder: fused_blocks=True == unfused on folded params,
        and is a no-op (same graph) on unfolded params."""
        import dataclasses

        import jax.numpy as jnp

        enc, pf = self._folded_resnet(rng)
        enc_fused = dataclasses.replace(enc, fused_blocks=True)
        x = jnp.asarray(
            rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
        )
        a = enc.apply(pf, x)
        b = enc_fused.apply(pf, x)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4
        )


class TestJpegThreads:
    def test_thread_counts_agree_and_do_not_collapse(self, rng):
        """Explicit pool sizes (bench --mode host-decode --threads N)
        decode identically, and threads>1 on this 1-vCPU box must not
        LOSE meaningful throughput vs threads=1 — the lock-contention
        canary for the 'scales with cores' claim (which itself can
        only be measured on a multi-core host; docs/PERF.md r4)."""
        import time

        from tpucap.ops import jpeg

        if not jpeg.native_available():
            pytest.skip("C++ extension unavailable")
        blobs = _make_jpegs(rng, n=32, hw=(96, 128))

        def run(n_threads):
            jpeg.decode_jpeg_batch(blobs, 48, n_threads=n_threads)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = jpeg.decode_jpeg_batch(
                    blobs, 48, n_threads=n_threads
                )
                best = min(best, time.perf_counter() - t0)
            return out, best

        out1, t1 = run(1)
        out2, t2 = run(2)
        np.testing.assert_array_equal(out1, out2)
        # Generous bound: scheduling noise on a loaded 1-vCPU CI box is
        # real; what must never happen is a structural serialization
        # (e.g. a decoder-global lock) making 2 threads ~2x slower.
        assert t2 < 1.8 * t1, (t1, t2)
