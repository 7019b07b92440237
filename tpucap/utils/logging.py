"""Structured JSONL metrics logging (SURVEY.md §5.5).

Replaces the reference's stdout loss prints / CSVLogger with append-only
JSONL records (one object per step/epoch) that downstream tooling and the
bench harness can parse.
"""

from __future__ import annotations

import json
import sys
import time


class MetricsLogger:
    def __init__(
        self, path=None, *, echo: bool = False, tensorboard_dir=None
    ):
        """path: JSONL file (append). tensorboard_dir: also mirror
        numeric fields as TensorBoard scalars (uses the installed TF's
        tf.summary — the trace viewer from utils/profiling.py and these
        scalars land in one logdir). Steps come from a 'step' or 'epoch'
        field when present, else a running counter."""
        self._file = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.time()
        self._tb = None
        self._tb_step = 0
        if tensorboard_dir:
            import tensorflow as tf  # installed as the test oracle

            self._tb = tf.summary.create_file_writer(str(tensorboard_dir))

    def log(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("wall_time", round(time.time() - self._t0, 3))
        line = json.dumps(record)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._tb is not None:
            import tensorflow as tf

            step = record.get("step", record.get("epoch", self._tb_step))
            self._tb_step += 1
            with self._tb.as_default():
                for k, v in record.items():
                    if k in ("step", "epoch", "wall_time"):
                        continue
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=int(step))
            self._tb.flush()
        if self._echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
