"""bench.py orchestration invariants (no rows are executed — the suite
itself runs on the real chip; here we pin the registry and the child-mode
contract the subprocess orchestrator depends on)."""

import importlib.util
import json
import os
import subprocess
import sys

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_row_specs_unique_and_complete():
    bench = _load_bench()
    specs = bench._row_specs()
    names = [s["name"] for s in specs]
    assert len(names) == len(set(names)), "duplicate row names"
    assert len(specs) == 9
    assert bench.HEADLINE_ROW in names
    for s in specs:
        assert s["dataset"] in ("cora", "pubmed", "powerlaw")
        assert s["kind"] in ("sup", "unsup")
        if s["kind"] == "sup":
            assert s["pipeline"] in ("dense", "cached")
    # run_named_row rejects unknown rows loudly (the orchestrator passes
    # registry names only, but a typo must not silently no-op)
    try:
        bench.run_named_row("no_such_row")
        raise AssertionError("expected StopIteration")
    except StopIteration:
        pass


def test_child_mode_emits_parseable_marker(tmp_path):
    """The parent parses the last ROW_JSON: line of the child's stdout;
    pin that contract with a stubbed row (no device work)."""
    bench = _load_bench()
    stub = tmp_path / "stub.py"
    stub.write_text(
        "import importlib.util, json, sys\n"
        f"spec = importlib.util.spec_from_file_location('bench', {_BENCH!r})\n"
        "bench = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(bench)\n"
        "print('unrelated stdout noise')\n"
        "print(bench._ROW_MARK + json.dumps({'name': 'x', "
        "'edges_per_sec': 1.0}))\n")
    proc = subprocess.run([sys.executable, str(stub)], capture_output=True,
                          text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    payload = next(ln[len(bench._ROW_MARK):] for ln
                   in reversed(proc.stdout.splitlines())
                   if ln.startswith(bench._ROW_MARK))
    assert json.loads(payload) == {"name": "x", "edges_per_sec": 1.0}
