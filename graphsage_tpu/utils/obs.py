"""Observability: structured metrics, profiler traces, NaN guards.

The reference's only instruments are per-step ``print``s and commented-out
timing breadcrumbs (SURVEY §5: src/utils.py:183, src/models.py:248-328).
Here:

- `MetricsLogger` appends one JSON object per event to a .jsonl file and
  optionally mirrors to stdout — throughput (edges/s), step time, losses,
  F1s are all machine-readable;
- `profile(dir)` wraps a block in `jax.profiler.trace` for TensorBoard /
  xprof (per-op TPU timing, HLO, memory);
- `enable_nan_checks()` flips `jax_debug_nans` — the single-threaded
  JAX-side analog of the sanitizer row in SURVEY §5;
- `named_scope` is re-exported so pipeline stages annotate profiles
  (model code uses it around sampling/aggregation/layer stages).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import IO

import jax

named_scope = jax.named_scope


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fp: IO | None = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, event: str, **fields) -> dict:
        rec = {"t": round(time.time() - self._t0, 3), "event": event,
               **fields}
        line = json.dumps(rec)
        if self._fp is not None:
            self._fp.write(line + "\n")
            self._fp.flush()
        if self.echo:
            print(line)
        return rec

    def close(self):
        if self._fp is not None:
            self._fp.close()
            self._fp = None


@contextlib.contextmanager
def profile(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
