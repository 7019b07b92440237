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
    def __init__(self, path=None, *, echo: bool = False):
        self._file = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.time()

    def log(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("wall_time", round(time.time() - self._t0, 3))
        line = json.dumps(record)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
