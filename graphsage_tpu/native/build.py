"""Build the native host engine (csrc/gs_native.cpp → _gs_native.so).

Usage: ``python -m graphsage_tpu.native.build``.  Plain g++ invocation —
no build-system dependency; the library exports a C ABI consumed through
ctypes (pybind11 is deliberately avoided: not in the environment).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
SRC = os.path.join(REPO, "csrc", "gs_native.cpp")
OUT = os.path.join(HERE, "_gs_native.so")


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", "-o", OUT, SRC,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


def ensure_built(quiet: bool = True) -> str | None:
    """Build if missing or stale; returns the .so path or None on failure.

    A failed staleness probe or rebuild (no g++ on the machine, csrc/
    absent from the deployment, mtimes scrambled by a fresh checkout)
    must NOT abandon a loadable prebuilt .so already on disk — possibly
    stale beats the ~100x slower numpy fallback, and the engine's parity
    tests catch genuinely broken binaries."""
    try:
        if (not os.path.exists(OUT)
                or os.path.getmtime(OUT) < os.path.getmtime(SRC)):
            build(verbose=not quiet)
        return OUT
    except Exception as e:
        if not quiet:
            print(f"native build failed: {e}", file=sys.stderr)
        return OUT if os.path.exists(OUT) else None


if __name__ == "__main__":
    build()
