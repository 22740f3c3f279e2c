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


class FetchDeadlineError(RuntimeError):
    """A device→host fetch exceeded its deadline (wedged backend RPC)."""


def maybe_inject_test_wedge(epoch: int) -> None:
    """Fault-injection seam for the auto-resume supervisor's tests
    (tools/run_supervised.py): when ``GS_TEST_WEDGE_SENTINEL`` names a
    path that does not exist yet and ``epoch >= 1`` (so at least one
    eval/checkpoint opportunity has passed), create the sentinel and
    raise the same :class:`FetchDeadlineError` a real wedged fetch
    raises — exactly once per sentinel file, so the relaunched process
    trains through.  A no-op unless the env var is set; lives here, with
    the failure machinery it simulates, rather than in the trainers'
    epoch loops."""
    sentinel = os.environ.get("GS_TEST_WEDGE_SENTINEL")
    if sentinel and epoch >= 1 and not os.path.exists(sentinel):
        open(sentinel, "w").close()
        raise FetchDeadlineError(
            "injected test wedge (GS_TEST_WEDGE_SENTINEL)")


def fetch_with_deadline(value, label: str = "device fetch",
                        timeout_s: float | None = None, convert=float,
                        stream=None):
    """Fetch a device value with a hard wall-clock deadline.

    The remote TPU backend has been observed to wedge a fetch RPC forever
    (main thread futex-waits, no exception is ever raised — seen live in
    round 3 on a mid-run CLI train request).  The first-step
    ``collective_watchdog`` cannot catch that: it only guards warmup.
    This guards the STEADY-STATE syncs — the per-step bounded-dispatch-
    window loss fetch and the cached trainers' epoch fetch — by running
    ``convert(value)`` (``float`` / ``np.asarray``) on a daemon worker
    thread and waiting with a timeout.  On deadline it dumps diagnostics
    and raises :class:`FetchDeadlineError` so a 50-epoch run fails loudly
    in seconds instead of hanging silently at step 400; the recovery
    (observed to work every time) is a fresh process.

    The wedged worker thread cannot be interrupted (it is blocked inside
    a C call) — it is daemonized and leaked, which is fine because the
    only sane caller reaction is to exit/restart.  Timeout default 120 s
    (env ``GS_FETCH_TIMEOUT_S``) ≫ any healthy steady-state fetch (ms).
    """
    if timeout_s is None:
        timeout_s = float(os.environ.get("GS_FETCH_TIMEOUT_S", "120"))
    box: dict = {}

    def work():
        try:
            box["value"] = convert(value)
        except BaseException as e:  # re-raised on the caller's thread
            box["err"] = e

    t = threading.Thread(target=work, daemon=True,
                         name=f"gs-fetch[{label}]")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        out = stream if stream is not None else sys.stderr
        lines = [f"[fetch-deadline] {label!r} has not returned after "
                 f"{timeout_s:g}s — the backend has likely wedged the "
                 f"fetch RPC (observed failure mode of the remote TPU "
                 f"tunnel).  Recovery: kill this process and restart "
                 f"(resume from the last checkpoint); a fresh process has "
                 f"always recovered in practice."]
        try:
            lines.append("  devices: "
                         + ", ".join(str(d) for d in jax.devices()))
        except Exception as e:  # the backend may itself be wedged
            lines.append(f"  (device query failed: {e!r})")
        print("\n".join(lines), file=out, flush=True)
        raise FetchDeadlineError(
            f"{label} did not complete within {timeout_s:g}s")
    if "err" in box:
        raise box["err"]
    return box["value"]


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
