"""Graceful preemption: SIGTERM -> mid-epoch checkpoint -> clean exit.

TPU pools preempt with a SIGTERM and a grace window (maintenance
events, spot reclaims). The reference's answer — SIGKILL semantics,
restart from the last epoch's .h5 — loses up to an epoch of work;
tests/test_fault_injection.py pins that path. This module is the
graceful half: ``fit(handle_preemption=True)`` installs a
:class:`PreemptionGuard`, checks it after every step, and on the first
signal saves a mid-epoch checkpoint and returns with a
``{"preempted": True}`` history entry. Rerunning the same command with
``fit(resume=True)`` continues EXACTLY where the run stopped: the
epoch/batch position is derived from the checkpoint's own step counter
(steps_per_epoch is deterministic — batch_iterator drops remainders),
and the host-side shuffle rng is fast-forwarded by replaying the
consumed per-epoch permutations, so the resumed trajectory is
bit-identical to an uninterrupted run (tests/test_preemption.py).
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Latching signal flag. Installed on ``__enter__`` (main thread
    only — Python restricts signal handlers to the main thread; in any
    other thread the guard stays armed-but-inert and ``fired`` can only
    be set via :meth:`request`), restored on ``__exit__``. The handler
    just sets a flag: the training loop decides when it is safe to act
    (after the in-flight step), which is what keeps the rescue
    checkpoint a complete, ordinary checkpoint."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous: dict = {}
        self._fired = threading.Event()

    # -- flag -----------------------------------------------------------
    @property
    def fired(self) -> bool:
        return self._fired.is_set()

    def request(self) -> None:
        """Programmatic trigger (tests; cooperative shutdown)."""
        self._fired.set()

    # -- handler lifecycle ----------------------------------------------
    def _handle(self, signum, frame):
        del frame
        self._fired.set()

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._previous[s] = signal.signal(s, self._handle)
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()
        return None
