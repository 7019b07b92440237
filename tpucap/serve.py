"""Online serving: micro-batching caption server over a built pipeline.

The reference's serving story is a single-image demo script (SURVEY.md
§2.1 #13: load model, caption one photo). A production TPU deployment
serves concurrent requests, and a TPU earns its throughput from batch
shape — per-request dispatch would run the chip at batch-1 (p50 ~2.7 ms
but ~370 captions/s) when the same chip does ~10k captions/s at batch 256
(docs/PERF.md). This module owns that gap the TPU-native way:

- requests enqueue from any thread; ONE batcher thread owns all JAX
  dispatch (single-controller model — no device-side locking needed);
- the batcher coalesces up to ``max_batch`` requests, waiting at most
  ``max_delay_ms`` after the first arrival (classic size-or-deadline
  micro-batching);
- batches are zero-padded UP to a fixed power-of-two bucket ladder so
  XLA compiles one program per bucket, never per request count — an
  unpadded tail shape would retrace, and a recompile over a TPU link
  costs seconds-to-minutes (the tail-padding rule everywhere else in
  this codebase: pipeline.evaluate / caption_dataset).

``warmup()`` pre-compiles every bucket before the first request, the
serving equivalent of the driver's compile-check.
"""

from __future__ import annotations

import queue
import threading
import time
import typing
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np


class Overloaded(RuntimeError):
    """Raised by submit() when the request queue is at max_queue —
    backpressure instead of unbounded latency growth."""


def _fail_futures(futs, exc: BaseException) -> None:
    """Best-effort set_exception on every future that is still pending
    (cancelled/already-resolved ones raise InvalidStateError — skip)."""
    for fut in futs:
        try:
            fut.set_exception(exc)
        except Exception:
            pass


def _resolve(fut: Future, caption: str) -> None:
    """set_result tolerant of cancelled AND already-failed futures (a
    wedged-then-recovered batcher may retire a request close() already
    timed out — the late result is dropped, not a thread crash)."""
    try:
        fut.set_result(caption)
    except Exception:
        pass


class _Reload(typing.NamedTuple):
    """Queue control item for weight hot-reload. A NamedTuple so the
    wedge-path _drain_pending (which finds each item's Future
    positionally by iterating) fails its future like any request's."""

    source: object
    future: Future


def _drain_pending(q: queue.Queue) -> list:
    """Pop every queued request and return the futures. Re-puts ONE
    close sentinel afterwards: a wedged worker that eventually recovers
    must still see the shutdown signal, or it would park on the empty
    queue (batch server) / spin (continuous server) forever. Item
    layouts differ per server (batch: (x, prefix, fut, t0); continuous:
    (x, fut, t0, on_words)) — find the Future positionally."""
    futs = []
    while True:
        try:
            item = q.get_nowait()
        except queue.Empty:
            break
        if item is not None:
            futs.append(next(f for f in item if isinstance(f, Future)))
    q.put(None)
    return futs


def _snapshot(fn, attempts: int = 5):
    """Copy a container a slow-but-alive worker thread may still be
    mutating (close()'s join timing out means slow, not stopped):
    retry on the mutated-during-iteration RuntimeError."""
    for _ in range(attempts):
        try:
            return fn()
        except RuntimeError:
            time.sleep(0.01)
    return []


def _buckets(max_batch: int) -> list[int]:
    """Power-of-two ladder 1, 2, 4, ..., max_batch (max_batch included
    even when not a power of two)."""
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


@dataclass
class ServerStats:
    requests: int = 0
    batches: int = 0
    padded_rows: int = 0  # wasted decode rows from bucket padding
    # Rolling window of per-request e2e latencies: a long-running server
    # must not grow host memory per request, so percentiles reflect the
    # last N requests (deque maxlen). The lock covers append vs the
    # snapshot() sort — /stats runs on HTTP handler threads while the
    # batcher appends, and iterating a mutating deque raises.
    latencies_ms: deque = field(
        default_factory=lambda: deque(maxlen=10_000)
    )
    lock: threading.Lock = field(default_factory=threading.Lock)

    def add_latency(self, ms: float) -> None:
        with self.lock:
            self.latencies_ms.append(ms)

    def snapshot(self) -> dict:
        with self.lock:
            lat = sorted(self.latencies_ms)
        p = lambda q: lat[int(q * (len(lat) - 1))] if lat else None
        return {
            "requests": self.requests,
            "batches": self.batches,
            "mean_batch": self.requests / self.batches if self.batches else 0,
            "padded_rows": self.padded_rows,
            "p50_ms": p(0.5),
            "p99_ms": p(0.99),
        }


class CaptionServer:
    """Micro-batching front-end for ``CaptioningPipeline``.

    mode='features': ``submit`` takes a feature vector (encoder output,
    the reference's pickled-features serving shape). mode='images':
    ``submit`` takes a preprocessed image array (size, size, 3) and the
    batch runs encoder + decode on device.

    decode kwargs (method/beam_width/parallelism) are fixed at server
    construction — one compiled program family per server.
    """

    def __init__(
        self,
        pipeline,
        *,
        mode: str = "features",
        max_batch: int = 64,
        max_delay_ms: float = 5.0,
        method: str | None = None,
        beam_width: int | None = None,
        parallelism: str | None = None,
        pipeline_depth: int = 1,
        max_queue: int | None = None,
        max_prefix_tokens: int | None = None,
    ):
        if mode not in ("features", "images"):
            raise ValueError(f"mode must be 'features'|'images', got {mode!r}")
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        # Per-request forced-prefix token cap (admission control): an
        # unbounded prefix would force an arbitrarily large compiled
        # priming program onto the shared batcher thread (one compile
        # per pow-2 length bucket). Default: the caption budget itself —
        # an opening longer than max_len generated tokens is outside any
        # sane serving contract; offline generate_continuation stays
        # uncapped.
        self._max_prefix_tokens = (
            max_prefix_tokens
            if max_prefix_tokens is not None
            else pipeline.config.decode.max_len
        )
        self._pipe = pipeline
        self._mode = mode
        self._max_batch = max_batch
        self._max_delay_s = max_delay_ms / 1e3
        self._decode_kw = dict(
            method=method, beam_width=beam_width, parallelism=parallelism
        )
        # pipeline_depth > 1 async-dispatches up to that many batches
        # before draining (generate_submit), overlapping device compute
        # of batch i+1 with the host-side fetch of batch i. Measured on
        # the v5e load harness (bench --mode serve, docs/PERF.md):
        # depth 1 WINS under closed-loop load — a synchronous drain
        # extends the collection window by exactly the fetch time, so
        # batches grow to max_batch, while depth 2 dispatches sooner at
        # ~40% smaller batches and pays more per-batch fetches than the
        # overlap saves. Default 1; >1 is for open-loop/steady arrivals
        # on low-latency links. Mesh-parallel decode and sampling go
        # through the synchronous generate() path regardless.
        self._depth = max(1, pipeline_depth)
        self._inflight: deque = deque()
        self._async_ok = parallelism in (None, "none") and (
            method or pipeline.config.decode.method
        ) in ("greedy", "beam")
        self._buckets = _buckets(max_batch)
        self._current_futs: tuple = ()  # batch mid-dispatch (wedge path)
        # Bounded admission: reject (Overloaded) rather than queue without
        # limit — the HTTP layer maps this to 503 + Retry-After.
        self._max_queue = max_queue
        self._queue: queue.Queue = queue.Queue()
        self._stats = ServerStats()
        self._closed = False
        # Serializes submit() against close(): without it a submitter can
        # pass the closed check, lose the CPU, and enqueue after the
        # batcher consumed the close sentinel — a Future nobody resolves.
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._batcher, name="tpucap-serve-batcher", daemon=True
        )
        self._thread.start()

    # -- client surface ----------------------------------------------------

    def submit(
        self,
        x,
        prefix: str | None = None,
        include_words=None,
    ) -> Future:
        """Enqueue one request; resolves to the caption string.

        ``prefix``: optional forced caption opening for THIS request
        (pipeline.generate_continuation semantics). Requests with and
        without prefixes batch together; a batch containing any prefix
        runs through the continuation program (prefixless rows ride
        along with an empty prefix — token-identical to the plain
        path). Validated here so a bad prefix fails its own request,
        never the micro-batch it would land in.

        ``include_words``: optional words THIS request's caption must
        contain (pipeline.generate_constrained semantics; beam method
        only, exclusive with ``prefix``). Constrained requests dispatch
        as their own micro-batches through the bank-FSM program — the
        2^C step-cost multiplier must not tax plain riders — with C
        bucketed pow-2 ({1,2,4}) to bound compiled-program count;
        those programs compile on first constrained traffic, not at
        warmup. Words are validated here (OOV/phrase/duplicate/… fail
        this request alone). When full satisfaction is unreachable the
        caption of the most-satisfied bank is returned (the offline
        fallback) — the batch surface reports strings only; use
        generate_constrained(return_details=True) offline for
        satisfaction masks."""
        x = np.asarray(x)
        expect = self._expected_shape()
        if x.shape != expect:
            raise ValueError(
                f"request shape {x.shape} != expected {expect} "
                f"(mode={self._mode!r})"
            )
        iw = self._validate_dials(prefix, include_words)
        return self._enqueue_rows([x], prefix or "", iw)[0]

    def submit_many(
        self,
        xs,
        prefix: str | None = None,
        include_words=None,
        *,
        prefixes=None,
        include_words_rows=None,
    ) -> list[Future]:
        """Enqueue MANY rows in one atomic admission — all rows are
        accepted or none are. The shared dials (``prefix`` /
        ``include_words``) apply to every row; ``prefixes`` /
        ``include_words_rows`` (r5) give each row its OWN dial (length-N
        lists; empty string / empty list = none for that row) — the
        queue already carries (prefix, include_words) per row, so
        heterogeneous rows batch together exactly like rows from
        separate connections. Every dial is validated BEFORE anything
        enqueues and the capacity check covers the whole set under the
        submit lock, so a multi-row request can never be half-admitted
        (rows the batcher would decode for a client that already got
        its 400/503 back)."""
        xs = np.asarray(xs)
        expect = self._expected_shape()
        if xs.ndim != len(expect) + 1 or xs.shape[1:] != expect:
            raise ValueError(
                f"submit_many wants shape (N, *{expect}), got "
                f"{xs.shape} (mode={self._mode!r})"
            )
        if xs.shape[0] == 0:
            return []
        if prefixes is None and include_words_rows is None:
            iw = self._validate_dials(prefix, include_words)
            return self._enqueue_rows(list(xs), prefix or "", iw)
        if prefix or include_words:
            raise ValueError(
                "submit_many takes shared dials (prefix/include_words) "
                "OR per-row dials (prefixes/include_words_rows), not "
                "both"
            )
        n = xs.shape[0]
        if prefixes is None:
            prefixes = [""] * n
        if include_words_rows is None:
            include_words_rows = [()] * n
        if isinstance(prefixes, (str, bytes)):
            raise ValueError(
                "prefixes must be a LIST of per-row strings (use "
                "prefix= for one shared opening)"
            )
        if len(prefixes) != n or len(include_words_rows) != n:
            raise ValueError(
                f"per-row dials must match the {n} rows: got "
                f"{len(prefixes)} prefixes, "
                f"{len(include_words_rows)} include_words_rows"
            )
        # Validate EVERY row's dial up front (admission atomicity: a
        # bad row-3 dial fails the whole request before row 0 enqueues).
        row_dials = []
        for i, (p, w) in enumerate(zip(prefixes, include_words_rows)):
            p = p or ""
            try:
                iw = self._validate_dials(p, w)
            except ValueError as e:
                raise ValueError(f"row {i}: {e}") from None
            row_dials.append((p, iw))
        return self._enqueue_rows_dials(list(xs), row_dials)

    def _validate_dials(self, prefix, include_words) -> tuple:
        """Admission-time validation of the per-request decode dials;
        -> the normalized include_words tuple. Raises so a bad dial
        fails its own request, never the micro-batch it lands in."""
        if prefix:
            method = (
                self._decode_kw["method"]
                or self._pipe.config.decode.method
            )
            if method not in ("greedy", "beam"):
                raise ValueError(
                    f"prefix needs method greedy|beam, server runs "
                    f"{method!r}"
                )
            if self._decode_kw["parallelism"] not in (None, "none"):
                raise ValueError(
                    "prefix is not supported with mesh-parallel decode"
                )
            # Validate vocabulary AND length NOW so a bad prefix fails
            # its own request, never the micro-batch it lands in (the
            # batch-level check in generate_continuation would fail
            # every rider).
            (toks,) = self._pipe.encode_prefixes([prefix])  # OOV -> raise
            n_tok = len(toks)
            if n_tok > self._max_prefix_tokens:
                raise ValueError(
                    f"prefix has {n_tok} tokens, server cap is "
                    f"max_prefix_tokens={self._max_prefix_tokens}"
                )
            max_pos = getattr(self._pipe.decoder, "max_positions", None)
            if max_pos is not None and n_tok:
                # Mirror generate_continuation's KV-capacity rule for
                # THIS request alone: pow2(len) is monotone, so if every
                # admitted request fits individually the padded batch
                # fits too.
                padded = 1 << (n_tok - 1).bit_length()
                max_len = self._pipe.config.decode.max_len
                if max(padded, n_tok + max_len) > max_pos:
                    raise ValueError(
                        f"prefix length {n_tok} (padded to {padded}) + "
                        f"max_len {max_len} exceeds decoder."
                        f"max_positions {max_pos}"
                    )
        iw: tuple = ()
        if include_words:
            if isinstance(include_words, (str, bytes)):
                # A bare string would iterate character-by-character
                # below ("dog" -> ('d','o','g')) — an easy client
                # mistake that must fail loudly, not constrain on
                # single letters.
                raise ValueError(
                    "include_words must be a list of words, got a "
                    f"string {include_words!r}"
                )
            if prefix:
                raise ValueError(
                    "a request takes prefix OR include_words, not both"
                )
            method = (
                self._decode_kw["method"]
                or self._pipe.config.decode.method
            )
            if method != "beam":
                raise ValueError(
                    f"include_words needs method beam, server runs "
                    f"{method!r}"
                )
            if self._decode_kw["parallelism"] not in (None, "none"):
                raise ValueError(
                    "include_words is not supported with mesh-parallel "
                    "decode"
                )
            if self._pipe.config.decode.no_repeat_ngram_size:
                raise ValueError(
                    "include_words does not compose with "
                    "no_repeat_ngram_size (generate_constrained's "
                    "refusal, surfaced at admission)"
                )
            iw = tuple(str(w) for w in include_words)
            # Full word validation NOW (OOV / phrase / duplicate /
            # sentinel / num_words-cap / BPE refusal) so a bad
            # constraint fails its own request, never the batch.
            self._pipe._constraint_ids([list(iw)], 1)
        return iw

    def _enqueue_rows(
        self, rows: list, prefix: str, iw: tuple
    ) -> list[Future]:
        """Capacity-check and enqueue a set of validated rows under ONE
        lock acquisition: admission is atomic for the whole set (and
        against concurrent submitters)."""
        return self._enqueue_rows_dials(rows, [(prefix, iw)] * len(rows))

    def _enqueue_rows_dials(
        self, rows: list, dials: list
    ) -> list[Future]:
        """Atomic admission with a validated (prefix, include_words)
        dial per row — the shared-dial path is the constant-list case."""
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if self._max_queue is not None and (
                self._queue.qsize() + len(rows) > self._max_queue
            ):
                raise Overloaded(
                    f"request queue at max_queue={self._max_queue}"
                )
            now = time.perf_counter()
            futs: list[Future] = []
            for x, (prefix, iw) in zip(rows, dials):
                fut: Future = Future()
                self._queue.put((x, prefix, iw, fut, now))
                futs.append(fut)
        return futs

    def caption(self, x, timeout: float | None = 60.0) -> str:
        """Blocking single-request convenience wrapper."""
        return self.submit(x).result(timeout=timeout)

    def reload(self, source) -> Future:
        """Hot-swap model weights with zero downtime: enqueue a reload
        that the batcher applies BETWEEN micro-batches (in-flight
        batches drain first), so requests submitted before this call
        resolve under the old weights and later ones under the new.
        ``source`` as in pipeline.reload_params (a pipeline.save()
        bundle dir or a same-topology params tree). Zero recompilation:
        the validated swap reuses every compiled bucket program. On
        validation failure the returned Future carries the error and
        the server keeps serving the old weights."""
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put(_Reload(source, fut))
        return fut

    def _apply_reload(self, item: _Reload) -> None:
        """Drain every in-flight batch, then swap. (Dispatched programs
        already hold the old param buffers as arguments — draining first
        is about a clean ordering guarantee, not correctness: everything
        retired before the reload future resolves used old weights.)"""
        while self._inflight:
            self._drain_one()
        try:
            self._pipe.reload_params(item.source)
        except Exception as e:
            _fail_futures([item.future], e)
            return
        _resolve(item.future, True)

    def warmup(self, timeout: float | None = None) -> None:
        """Compile every bucket shape before serving traffic. ``timeout``
        accepted for signature parity with the continuous server's
        warmup (this one runs inline, not through the queue)."""
        del timeout
        expect = self._expected_shape()
        for b in self._buckets:
            batch = np.zeros((b,) + expect, np.float32)
            self._run_batch(batch)

    def stats(self) -> dict:
        return self._stats.snapshot()

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue, stop the batcher. Idempotent. If the batcher
        is wedged (e.g. mid-compile) past ``timeout``, every pending
        future is failed with a TimeoutError instead of leaving callers
        blocked forever in result()."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # sentinel
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            exc = TimeoutError(
                f"serve batcher did not drain within {timeout}s at "
                f"close (wedged in device dispatch?); request abandoned"
            )
            futs = _drain_pending(self._queue)
            for _, bfuts, _ in _snapshot(lambda: list(self._inflight)):
                futs.extend(bfuts)
            futs.extend(self._current_futs)  # the batch mid-dispatch
            _fail_futures(futs, exc)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- batcher -----------------------------------------------------------

    def _expected_shape(self) -> tuple:
        if self._mode == "images":
            s = self._pipe.encoder.input_size
            return (s, s, 3)
        cfg = self._pipe.config.encoder
        if cfg.features == "spatial":
            # attention serving: flattened (positions, channels) grid —
            # the encoder's own grid (vgg16/resnet50 14x14, inception
            # 17x17, tiny 4x4), not a hardcoded 196.
            return (self._pipe.encoder.spatial_positions, cfg.feature_dim)
        return (cfg.feature_dim,)

    def _run_batch(self, batch: np.ndarray) -> list[str]:
        return self._submit_batch(batch, None)()

    def _submit_batch(
        self, batch: np.ndarray, prefixes=None, include_words=None
    ):
        """Dispatch one padded batch; returns a zero-arg finalizer that
        blocks on the result and yields the captions. On the async path
        the device starts immediately and the finalizer only pays the
        host transfer + detokenize. ``prefixes`` (per-row strings, ""
        = none) routes the batch through the continuation program;
        ``include_words`` (per-row word lists, [] = none) through the
        constrained bank-FSM program with C bucketed pow-2."""
        if self._mode == "images":
            feats = self._pipe.encode_images(batch)
        else:
            feats = batch
        if include_words is not None:
            max_c = max(len(r) for r in include_words)
            c_bucket = 1 if max_c <= 1 else (2 if max_c <= 2 else 4)
            return self._pipe.generate_constrained_submit(
                feats,
                include_words,
                beam_width=self._decode_kw["beam_width"],
                num_slots=c_bucket,
            )
        if prefixes is not None:
            # Async like the plain path: the continuation program is
            # dispatched now and only the finalizer pays host transfer +
            # detokenize, so a prefixed batch doesn't stall the batcher
            # thread (pipeline_depth overlap keeps working).
            return self._pipe.generate_continuation_submit(
                feats,
                prefixes,
                method=self._decode_kw["method"],
                beam_width=self._decode_kw["beam_width"],
            )
        if self._async_ok:
            return self._pipe.generate_submit(
                feats,
                method=self._decode_kw["method"],
                beam_width=self._decode_kw["beam_width"],
            )
        captions = self._pipe.generate(feats, **self._decode_kw)
        return lambda: captions

    def _batcher(self) -> None:
        """Top-level worker guard: _flush/_drain_one contain the
        per-batch dispatch errors, but an unexpected exception anywhere
        else must not silently kill the only dispatch thread and leave
        every pending future unresolved."""
        try:
            self._batcher_inner()
        except Exception as e:
            with self._submit_lock:
                self._closed = True  # subsequent submits raise
            futs = _drain_pending(self._queue)
            for _, bfuts, _ in _snapshot(lambda: list(self._inflight)):
                futs.extend(bfuts)
            futs.extend(self._current_futs)
            _fail_futures(futs, e)

    def _batcher_inner(self) -> None:
        while True:
            try:
                item = self._queue.get(
                    timeout=0.001 if self._inflight else None
                )
            except queue.Empty:
                # No new traffic while results are in flight: retire the
                # oldest batch instead of holding its latency hostage.
                self._drain_one()
                continue
            if item is None:
                self._drain_on_close()
                return
            if isinstance(item, _Reload):
                self._apply_reload(item)
                continue
            batch = [item]
            deadline = time.perf_counter() + self._max_delay_s
            stop = False
            pending_reload = None
            while len(batch) < self._max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                if isinstance(nxt, _Reload):
                    # Close the collection window here: everything
                    # already collected rides the old weights, the swap
                    # happens right after this batch dispatches.
                    pending_reload = nxt
                    break
                batch.append(nxt)
            self._flush(batch)
            while len(self._inflight) >= self._depth:
                self._drain_one()
            if pending_reload is not None:
                self._apply_reload(pending_reload)
            if stop:
                self._drain_on_close()
                return

    def _drain_on_close(self) -> None:
        """Flush any backlog enqueued before the close sentinel, then
        retire every in-flight batch, so no accepted request is left
        with an unresolved future."""
        batch = []
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            if isinstance(item, _Reload):
                # Preserve submission order at shutdown too: flush what
                # came before, swap, keep draining.
                if batch:
                    self._flush(batch)
                    batch = []
                self._apply_reload(item)
                continue
            batch.append(item)
            if len(batch) == self._max_batch:
                self._flush(batch)
                batch = []
        if batch:
            self._flush(batch)
        while self._inflight:
            self._drain_one()

    def _flush(self, batch: list) -> None:
        """Split constrained requests into their own dispatch (the 2^C
        bank multiplier must not tax plain/prefix riders), then pad
        each group to the bucket ladder and dispatch."""
        constrained = [it for it in batch if it[2]]
        if constrained and len(constrained) < len(batch):
            self._flush_group([it for it in batch if not it[2]])
            self._flush_group(constrained)
            return
        self._flush_group(batch)

    def _flush_group(self, batch: list) -> None:
        """Pad to the bucket ladder and dispatch; the batch is retired
        later by _drain_one (pipelined) unless dispatch itself fails."""
        xs, prefs, iws, futs, t0s = zip(*batch)
        # Visible to close()'s wedge path: while dispatch is in flight
        # these futures are in neither the queue nor _inflight.
        self._current_futs = futs
        n = len(xs)
        bucket = next(b for b in self._buckets if b >= n)
        stacked = np.stack(xs)
        if bucket > n:
            pad = np.zeros((bucket - n,) + stacked.shape[1:], stacked.dtype)
            stacked = np.concatenate([stacked, pad])
        try:
            finalize = self._submit_batch(
                stacked,
                (
                    list(prefs) + [""] * (bucket - n)
                    if any(prefs)
                    else None
                ),
                (
                    # Padding rows get [] = all-pre-satisfied slots;
                    # such a row is EXACTLY standard beam search.
                    [list(w) for w in iws] + [[]] * (bucket - n)
                    if any(iws)
                    else None
                ),
            )
        except Exception as e:  # propagate to every waiter, keep serving
            _fail_futures(futs, e)
            self._current_futs = ()
            return
        self._stats.padded_rows += bucket - n
        self._inflight.append((finalize, futs, t0s))
        self._current_futs = ()

    def _drain_one(self) -> None:
        if not self._inflight:
            return
        finalize, futs, t0s = self._inflight.popleft()
        n = len(futs)
        self._current_futs = futs  # popped — close() can't see them else
        try:
            captions = finalize()[:n]
        except Exception as e:
            _fail_futures(futs, e)
            self._current_futs = ()
            return
        self._current_futs = ()
        now = time.perf_counter()
        self._stats.requests += n
        self._stats.batches += 1
        for cap, fut, t0 in zip(captions, futs, t0s):
            self._stats.add_latency((now - t0) * 1e3)
            _resolve(fut, cap)


class ContinuousCaptionServer:
    """Continuous-batching greedy caption server (vLLM-style slot
    recycling — decode/continuous.py has the device half and the design
    rationale).

    Unlike :class:`CaptionServer` (whole batches run to completion), a
    finished request's lanes are retired and refilled the moment it
    finishes, so mixed-length traffic keeps every lane busy: under
    trained-model length skew (mean ~12 vs 34-token cap) that is the
    difference between ~35% and ~100% slot utilization. Single device;
    greedy by default, beam via ``beam_width>1`` (each request then
    occupies a beam_width-lane group); ``mode='images'`` adds the
    encoder to the admission path (see __init__).

    ``ticks_per_sync`` trades retirement latency for host round-trips:
    each sync runs that many decode steps as one program, then fetches
    the (tiny) finished/active flags.
    """

    def __init__(
        self,
        pipeline,
        *,
        slots: int = 64,
        ticks_per_sync: int = 8,
        max_queue: int | None = None,
        beam_width: int = 1,
        mode: str = "features",
    ):
        """beam_width > 1 switches the device engine to the continuous
        BEAM engine (decode/continuous_beam.py): each request occupies a
        group of beam_width lanes, retired when every beam finishes —
        results identical to beam_decode. beam_width=1 (default) is the
        greedy engine.

        mode='images' puts the ENCODER in the admission path: submit
        takes a preprocessed (size, size, 3) image; each admitted wave
        is padded to the admission bucket, encoded on device
        (pipeline.encode_images — one compiled encoder program per
        bucket, warmed by warmup()), and the resulting feature rows are
        scattered into lanes. Decode lanes still recycle continuously;
        only admission pays the encoder pass, on exactly the rows being
        admitted (the config-5 online analog with encoder in the loop,
        VERDICT r2 missing #4)."""
        if mode not in ("features", "images"):
            raise ValueError(
                f"mode must be 'features'|'images', got {mode!r}"
            )
        self._pipe = pipeline
        self._mode = mode
        self._beam_width = beam_width
        self._slots = slots
        start_id, end_id = pipeline._token_ids()
        self._end_id = end_id
        self._build_engine()
        self._ticks_per_sync = ticks_per_sync
        self._max_queue = max_queue
        self._queue: queue.Queue = queue.Queue()
        # slot -> [future, t0, on_words|None, words_emitted] (mutable —
        # _stream_progress advances words_emitted in place)
        self._futures: dict[int, list] = {}
        self._free = list(range(slots))
        self._stats = ServerStats()
        self._tick_count = 0
        self._tick_occupancy = 0
        self._closed = False
        self._current_futs: tuple = ()  # batch mid-admission (wedge path)
        self._submit_lock = threading.Lock()  # submit vs close ordering
        self._thread = threading.Thread(
            target=self._loop, name="tpucap-continuous", daemon=True
        )
        self._thread.start()

    def _build_engine(self) -> None:
        """Construct the device engine over the pipeline's CURRENT
        inference params and a fresh (all-idle) slot state. Called at
        __init__ and again by reload(): the engines' jitted methods
        close over their params (static self), so a weight swap means a
        new engine instance — and a re-trace of its program family on
        next use (see reload's docstring)."""
        pipeline = self._pipe
        slots = self._slots
        beam_width = self._beam_width
        start_id, end_id = pipeline._token_ids()
        cfgE = pipeline.config.encoder
        feature_shape = (
            (pipeline.encoder.spatial_positions, cfgE.feature_dim)
            if cfgE.features == "spatial"
            else (cfgE.feature_dim,)
        )
        engine_kw = dict(
            slots=slots,
            start_id=start_id,
            end_id=end_id,
            max_len=pipeline.config.decode.max_len,
            min_len=pipeline.config.decode.min_len,
            banned_ids=pipeline._banned_ids(),
            no_repeat_ngram_size=(
                pipeline.config.decode.no_repeat_ngram_size
            ),
            feature_shape=feature_shape,
            feature_dtype=pipeline._infer_dtype(),
            # Mirror pipeline._decode_fn's precision='f32' exact-parity
            # contract so served captions == generate() on such configs.
            matmul_precision=(
                "highest"
                if pipeline.config.precision == "f32"
                else "default"
            ),
        )
        dec_params = pipeline._inference_params()["decoder"]
        if beam_width > 1:
            from tpucap.decode.continuous_beam import ContinuousBeamEngine

            dcfg = pipeline.config.decode
            self._engine = ContinuousBeamEngine(
                pipeline.decoder,
                dec_params,
                beam_width=beam_width,
                length_normalize=dcfg.length_normalize,
                alpha=dcfg.alpha,
                length_penalty=dcfg.length_penalty,
                approx_topk=dcfg.approx_topk,
                **engine_kw,
            )
        else:
            from tpucap.decode.continuous import ContinuousDecodeEngine

            self._engine = ContinuousDecodeEngine(
                pipeline.decoder, dec_params, **engine_kw
            )
        self._state = self._engine.init_state()

    # -- client surface ----------------------------------------------------

    @property
    def _input_shape(self) -> tuple:
        if self._mode == "images":
            s = self._pipe.encoder.input_size
            return (s, s, 3)
        return self._engine.feature_shape

    def submit(self, features) -> Future:
        return self._submit(features, None)

    def reload(self, source) -> Future:
        """Hot-swap model weights: admission pauses, active lanes run to
        retirement under the old weights, then the pipeline's params are
        replaced (pipeline.reload_params — same validation) and the
        device engine is REBUILT over them; queued and future requests
        decode under the new weights. Unlike :class:`CaptionServer`
        (whose programs take params as arguments — zero recompilation),
        the continuous engines close over their params, so the rebuilt
        engine re-traces its program family on the next sync group; for
        frequent reloads prefer the batch server, or accept the one-off
        stall. On validation failure the Future carries the error and
        the old engine keeps serving."""
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put(_Reload(source, fut))
        return fut

    def submit_stream(self, features, on_words) -> Future:
        """Streaming submit: ``on_words(words: list[str])`` is invoked
        with each NEW span of decoded words as the request progresses
        (granularity = ``ticks_per_sync`` tokens — the engine syncs with
        the host once per tick group); the returned Future still
        resolves with the full caption, and the emitted spans
        concatenate to exactly that caption.

        Greedy streams every decoded token as it lands. Beam streams
        the group's STABLE PREFIX — the longest common prefix of its k
        beams, which every future leader provably extends
        (ContinuousBeamEngine.progress), so no emitted word is ever
        retracted; whatever the winning beam adds past the last stable
        span is flushed in one final ``on_words`` call at retirement,
        just before the future resolves. Beams that agree early stream
        early; a contested beam front holds words back until it
        converges — the honest latency/stability trade.

        ``on_words`` runs on the engine thread — it must be fast and
        never block (hand off to a queue for slow consumers, as the
        HTTP front-end does); exceptions it raises are swallowed so a
        broken client callback cannot kill the shared engine loop."""
        if not callable(on_words):
            raise TypeError("on_words must be callable")
        return self._submit(features, on_words)

    def _submit(self, features, on_words) -> Future:
        x = np.asarray(features)
        if x.shape != self._input_shape:
            raise ValueError(
                f"request shape {x.shape} != expected "
                f"{self._input_shape} (mode={self._mode!r})"
            )
        return self._enqueue_rows([x], on_words)[0]

    def submit_many(self, xs) -> list[Future]:
        """Enqueue MANY rows in one atomic admission — all accepted or
        none (the CaptionServer.submit_many contract; the continuous
        engines have no prefix/include_words surface)."""
        xs = np.asarray(xs)
        if (
            xs.ndim != len(self._input_shape) + 1
            or xs.shape[1:] != self._input_shape
        ):
            raise ValueError(
                f"submit_many wants shape (N, *{self._input_shape}), "
                f"got {xs.shape} (mode={self._mode!r})"
            )
        if xs.shape[0] == 0:
            return []
        return self._enqueue_rows(list(xs), None)

    def _enqueue_rows(self, rows: list, on_words) -> list[Future]:
        """Capacity-check and enqueue under ONE lock acquisition so a
        multi-row request is never half-admitted."""
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if self._max_queue is not None and (
                self._queue.qsize() + len(rows) > self._max_queue
            ):
                raise Overloaded(
                    f"request queue at max_queue={self._max_queue}"
                )
            now = time.perf_counter()
            futs: list[Future] = []
            for x in rows:
                fut: Future = Future()
                self._queue.put((x, fut, now, on_words))
                futs.append(fut)
        return futs

    def caption(self, features, timeout: float | None = 60.0) -> str:
        return self.submit(features).result(timeout=timeout)

    def warmup(self, timeout: float = 600.0) -> None:
        """Compile the engine's FULL program family before serving
        traffic: admit + collect at EVERY bucket on the admission
        ladder, plus tick and flags.

        Driven deterministically on a scratch state — not through the
        live queue, where the engine loop's admission batching decides
        which bucket shapes trace (a race: one submitted wave typically
        compiles only buckets 1 and ``slots``, and the intermediate
        buckets then compile during live traffic — a seconds-to-minutes
        stall on a remote-compile TPU link). Compilation is cached by
        shape, so warming scratch state covers the live state. Call
        before announcing the server, not concurrently with traffic."""
        del timeout  # inline — nothing to wait on
        import jax
        import jax.numpy as jnp

        eng = self._engine
        state = eng.init_state()
        shape = self._input_shape  # images mode also warms the encoder
        for b in eng._admit_buckets:
            n = min(b, eng.slots)
            ids = list(range(n))
            idx, feats = self._admission_arrays(
                ids, [np.zeros(shape, np.float32)] * n
            )
            state = eng.admit(state, idx, feats)
            state = eng.tick(state, self._ticks_per_sync)
            jax.device_get(eng.flags(state))
            # Streaming fetch too: submit_stream's first live sync must
            # not pay a compile (progress is shape-fixed — once covers
            # every bucket).
            jax.device_get(eng.progress(state))
            _, state = eng.collect(state, jnp.asarray(eng.pad_ids(ids)))
        with self._stats.lock:
            self._stats.latencies_ms.clear()
        self._stats.requests = 0
        self._stats.batches = 0
        self._tick_count = 0
        self._tick_occupancy = 0

    def stats(self) -> dict:
        s = self._stats.snapshot()
        s["ticks"] = self._tick_count
        s["mean_occupancy"] = (
            self._tick_occupancy / self._tick_count
            if self._tick_count
            else 0.0
        )
        return s

    def close(self, timeout: float = 60.0) -> None:
        """Idempotent. If the engine loop is wedged past ``timeout``,
        pending futures are failed with a TimeoutError rather than
        leaving callers blocked in result() forever."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            exc = TimeoutError(
                f"continuous engine loop did not drain within {timeout}s "
                f"at close (wedged in device dispatch?); request abandoned"
            )
            futs = _drain_pending(self._queue)
            futs.extend(
                f
                for f, *_ in _snapshot(
                    lambda: list(self._futures.values())
                )
            )
            futs.extend(self._current_futs)  # batch mid-admission
            pending = getattr(self, "_pending_reload", None)
            if pending is not None:
                futs.append(pending.future)
            _fail_futures(futs, exc)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- engine loop --------------------------------------------------------

    def _admission_arrays(self, ids: list, payloads: list):
        """(slot_idx, feature rows) for engine.admit, padded to the
        admission bucket ladder. mode='images' runs the encoder here on
        the zero-padded image wave (the pad rows' features are computed
        but scatter-dropped via the out-of-range slot index — wasted
        encoder rows bounded by the bucket gap, never a recompile)."""
        if self._mode != "images":
            return self._engine.pad_admission(ids, payloads)
        import jax.numpy as jnp

        idx = self._engine.pad_ids(ids)
        imgs = np.zeros(idx.shape + self._input_shape, np.float32)
        for i, x in enumerate(payloads):
            imgs[i] = x
        return jnp.asarray(idx), self._pipe.encode_images(imgs)

    def _admit_waiting(self, block: bool) -> bool:
        """Move queued requests into free lanes. Returns False when the
        close sentinel arrives. While a reload is pending, admission is
        PAUSED (nothing is consumed) so active lanes drain and the swap
        can apply; requests queued behind the reload stay queued and
        decode under the new weights."""
        if getattr(self, "_pending_reload", None) is not None:
            if block:
                time.sleep(0.005)  # don't spin while lanes drain
            return not getattr(self, "_drain_sentinel", False)
        batch = []
        while len(batch) < len(self._free):
            try:
                item = self._queue.get(
                    timeout=0.05 if (block and not batch) else 0
                )
            except queue.Empty:
                break
            if item is None:
                self._drain_sentinel = True
                break
            if isinstance(item, _Reload):
                # Stop collecting here: everything admitted so far (and
                # already-active lanes) finishes under the old weights.
                self._pending_reload = item
                break
            batch.append(item)
        if batch:
            # Visible to close()'s wedge path: until registered in
            # _futures these requests are in neither queue nor slots.
            self._current_futs = tuple(b[1] for b in batch)
            ids = [self._free.pop() for _ in batch]
            idx, feats = self._admission_arrays(
                ids, [b[0] for b in batch]
            )
            self._state = self._engine.admit(self._state, idx, feats)
            for slot, (_, fut, t0, cb) in zip(ids, batch):
                # [future, t0, on_words callback, words emitted so far]
                # — emitted is mutated by _stream_progress.
                self._futures[slot] = [fut, t0, cb, 0]
            self._current_futs = ()
        return not getattr(self, "_drain_sentinel", False)

    def _retire(self, fin: np.ndarray) -> None:
        from tpucap.decode import ids_to_captions

        import jax.numpy as jnp

        ids = [int(i) for i in np.where(fin)[0]]
        if not ids:
            return
        # pad_ids pads with the engine's out-of-range index (scatter-
        # dropped), NOT slot 0 — a slot-0 pad row would clear lane 0's
        # finished bit if a future change collects a subset of lanes.
        idx = self._engine.pad_ids(ids)
        (tokens, lengths, _), self._state = self._engine.collect(
            self._state, jnp.asarray(idx)
        )
        tokens = np.asarray(tokens)[: len(ids)]
        lengths = np.asarray(lengths)[: len(ids)]
        captions = ids_to_captions(
            self._pipe.tokenizer, tokens, lengths, end_id=self._end_id
        )
        now = time.perf_counter()
        self._stats.requests += len(ids)
        for row, (slot, cap) in enumerate(zip(ids, captions)):
            entry = self._futures.pop(slot)
            if entry[2] is not None:
                # Final streaming flush: everything the winning sequence
                # carries past the last emitted span (for beam, the part
                # beyond the stable prefix; for greedy, usually empty —
                # _stream_progress already caught up). Runs BEFORE the
                # future resolves, so spans concatenate to exactly the
                # caption a .result() caller sees.
                self._emit_span(entry, tokens[row], int(lengths[row]))
            fut, t0, _, _ = entry
            self._stats.add_latency((now - t0) * 1e3)
            _resolve(fut, cap)
            self._free.append(slot)

    def _stream_progress(self) -> None:
        """Emit newly-decoded words to streaming requests' callbacks.

        One extra (slots, max_len) device fetch per sync group, paid
        ONLY while at least one streaming request is live; non-streaming
        traffic never fetches token progress early. The engine's
        ``progress`` supplies both tokens and the streamable length:
        the decoded length for greedy lanes, the stable-prefix length
        for beam groups (whatever the winning beam adds past it is
        flushed by ``_retire``)."""
        live = [e for e in self._futures.values() if e[2] is not None]
        if not live:
            return
        import jax

        tokens, lengths = jax.device_get(
            self._engine.progress(self._state)
        )
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        for slot, entry in self._futures.items():
            if entry[2] is None:
                continue
            self._emit_span(entry, tokens[slot], int(lengths[slot]))

    def _emit_span(self, entry, token_row, n: int) -> None:
        """Deliver tokens [emitted, n) of ``token_row`` to a streaming
        entry's callback and advance its high-water mark."""
        _, _, cb, emitted = entry
        if n <= emitted:
            return
        tok = self._pipe.tokenizer
        words = [
            w
            for t in token_row[emitted:n]
            if int(t) != self._end_id
            and (w := tok.word_for_id(int(t))) is not None
        ]
        entry[3] = n
        if words:
            try:
                cb(words)
            except Exception:
                # A broken client callback must not kill the shared
                # engine loop; the future still resolves with the
                # full caption at retirement.
                pass

    def _loop(self) -> None:
        """Top-level worker guard: the engine loop is the ONLY device
        dispatcher — if admission (which in images mode runs the
        encoder), tick, or collect raises (e.g. RESOURCE_EXHAUSTED on a
        fresh bucket), every accepted request's future is failed with
        that error and the server closes, instead of a dead thread
        leaving clients blocked in result() forever."""
        try:
            self._loop_inner()
        except Exception as e:
            with self._submit_lock:
                self._closed = True  # subsequent submits raise
            futs = _drain_pending(self._queue)
            futs.extend(f for f, *_ in self._futures.values())
            futs.extend(self._current_futs)
            pending = getattr(self, "_pending_reload", None)
            if pending is not None:
                futs.append(pending.future)
            _fail_futures(futs, e)

    def _loop_inner(self) -> None:
        self._drain_sentinel = False
        self._pending_reload = None
        while True:
            keep = self._admit_waiting(block=not self._futures)
            if self._futures:
                import jax

                self._state = self._engine.tick(
                    self._state, self._ticks_per_sync
                )
                fin, act, lens = jax.device_get(
                    self._engine.flags(self._state)
                )
                self._tick_count += self._ticks_per_sync
                self._tick_occupancy += (
                    int(act.sum()) + len(np.where(fin)[0])
                ) * self._ticks_per_sync
                self._stats.batches += 1  # one sync group
                self._stream_progress()
                self._retire(fin)
            if self._pending_reload is not None and not self._futures:
                item = self._pending_reload
                try:
                    self._pipe.reload_params(item.source)
                    self._build_engine()  # new params -> new engine
                except Exception as e:
                    _fail_futures([item.future], e)
                else:
                    _resolve(item.future, True)
                self._pending_reload = None
                continue  # resume admission immediately
            if not keep and not self._futures:
                return
