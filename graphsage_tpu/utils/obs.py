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
- `collective_watchdog` guards the FIRST sharded step of a distributed
  program: a wrong mesh (device-order mismatch across processes, a
  process missing a collective) hangs XLA forever with no diagnostics,
  so a daemon timer dumps mesh/device/sharding hints to stderr if the
  step hasn't completed in time (SURVEY §5 sanitizer row);
- `named_scope` is re-exported so pipeline stages annotate profiles
  (model code uses it around sampling/aggregation/layer stages).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
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


@contextlib.contextmanager
def collective_watchdog(label: str = "first sharded step",
                        timeout_s: float | None = None,
                        mesh=None, stream=None):
    """Deadlock watchdog for the first execution of a sharded program.

    A mismatched mesh across processes or a collective one process never
    enters blocks inside XLA with no error — the failure mode a real
    multi-host slice hits first.  Wrap the first sharded step (including
    its ``block_until_ready``) in this context: if it hasn't finished
    after ``timeout_s`` (default 300s, env ``GS_WATCHDOG_TIMEOUT_S``),
    a daemon thread dumps process/device/mesh diagnostics and likely
    causes to stderr.  The block itself is never interrupted — the dump
    is what a stuck operator needs to diagnose the hang from one
    process's logs.

    Yields a dict with a ``fired`` flag (for tests / callers that want
    to react).  Cheap enough to leave on unconditionally: one timer
    start/cancel when the step completes in time.
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("GS_WATCHDOG_TIMEOUT_S", "300"))
    out = stream if stream is not None else sys.stderr
    state = {"fired": False}

    def dump():
        state["fired"] = True
        lines = [
            f"[collective-watchdog] {label!r} has not completed after "
            f"{timeout_s:g}s — likely a deadlocked collective or a mesh "
            f"mismatch across processes.",
        ]
        try:
            lines.append(
                f"  process {jax.process_index()}/{jax.process_count()}, "
                f"{jax.local_device_count()} local of "
                f"{jax.device_count()} global devices")
            lines.append("  devices: "
                         + ", ".join(str(d) for d in jax.devices()))
        except Exception as e:  # backend may itself be wedged
            lines.append(f"  (device query failed: {e!r})")
        if mesh is not None:
            try:
                axes = dict(zip(mesh.axis_names, mesh.devices.shape))
                lines.append(f"  mesh axes: {axes}; device order: "
                             + ", ".join(str(d)
                                         for d in mesh.devices.ravel()))
            except Exception as e:
                lines.append(f"  (mesh query failed: {e!r})")
        lines.append(
            "  check: every process built the SAME mesh (identical device "
            "order), enters the same collectives in the same order, and "
            "feeds inputs with the shardings the program was traced with.")
        print("\n".join(lines), file=out, flush=True)

    timer = threading.Timer(timeout_s, dump)
    timer.daemon = True
    timer.start()
    try:
        yield state
    finally:
        timer.cancel()
