"""Auto-resume supervisor (tools/run_supervised.py): a run must survive
an injected mid-run wedge without operator action (SURVEY §5 failure
recovery; the reference loses the run — save-only, src/utils.py:52)."""

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SUP = os.path.join(_ROOT, "tools", "run_supervised.py")


def _run_supervised(tmp_path, extra_env, *, max_restarts=2, cli=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env)
    log = str(tmp_path / "events.jsonl")
    cmd = [sys.executable, _SUP, "--max_restarts", str(max_restarts),
           "--log", log, "--"] + list(cli)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=str(tmp_path), timeout=600)
    events = []
    if os.path.exists(log):
        with open(log) as f:
            events = [json.loads(ln) for ln in f if ln.strip()]
    return proc, events


def test_survives_injected_wedge_and_resumes(tmp_path):
    sentinel = str(tmp_path / "wedge_fired")
    cli = ["--dataSet", "cora", "--epochs", "3", "--b_sz", "128",
           "--pipeline", "cached", "--platform", "cpu", "--quiet",
           "--checkpoint_dir", str(tmp_path / "ck"), "--name", "sup"]
    proc, events = _run_supervised(
        tmp_path, {"GS_TEST_WEDGE_SENTINEL": sentinel}, cli=cli)

    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert os.path.exists(sentinel), "the wedge never fired"
    kinds = [e["event"] for e in events]
    # child 1 wedged (rc 17) -> restart with --resume -> child 2 finished
    assert kinds == ["launch", "exit", "restart", "launch", "exit"], kinds
    assert events[1]["rc"] == 17
    assert events[2]["resume"] and "model_best_sup" in events[2]["resume"]
    assert events[4]["rc"] == 0
    assert "Best validation F1" in proc.stdout


def test_non_wedge_failure_is_not_restarted(tmp_path):
    # an argparse error exits 2 — a real failure the supervisor must
    # surface immediately instead of retrying
    proc, events = _run_supervised(tmp_path, {},
                                   cli=["--no_such_flag"])
    assert proc.returncode == 2
    assert [e["event"] for e in events] == ["launch", "exit"]


def test_bounded_restarts_give_up(tmp_path):
    """A child that wedges on every attempt exhausts max_restarts and the
    supervisor surfaces the wedge code.  Remapping --wedge_rc to the
    argparse-error code (2) gives a deterministic always-'wedging'
    child."""
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    log = str(tmp_path / "events.jsonl")
    cmd = [sys.executable, _SUP, "--max_restarts", "1", "--wedge_rc", "2",
           "--log", log, "--", "--no_such_flag"]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=str(tmp_path), timeout=300)
    with open(log) as f:
        events = [json.loads(ln) for ln in f if ln.strip()]
    assert proc.returncode == 2
    kinds = [e["event"] for e in events]
    assert kinds == ["launch", "exit", "restart", "launch", "exit",
                     "giving_up"], kinds


def test_newest_checkpoint_scoped_by_run_name(tmp_path):
    """A shared checkpoint_dir can hold several runs' checkpoints; the
    supervisor must only ever resume its OWN run's (matching
    model_best_<name>_), never another run's newer one."""
    from tools.run_supervised import _newest_checkpoint

    ck = tmp_path / "ck"
    ck.mkdir()
    a = ck / "model_best_a_ep1_0.5000"
    b = ck / "model_best_b_ep7_0.9000"
    a.mkdir()
    b.mkdir()
    os.utime(a, (1000, 1000))
    os.utime(b, (2000, 2000))  # b is newer — and belongs to another run
    assert _newest_checkpoint(str(ck), "a") == str(a)
    assert _newest_checkpoint(str(ck), "b") == str(b)
    assert _newest_checkpoint(str(ck), "c") is None


def test_wedge_before_first_checkpoint_preserves_user_resume(tmp_path):
    """If the child wedges before writing any checkpoint, the relaunch
    must keep the operator's own --resume flag — stripping it would
    silently restart their run from scratch.  (--no_such_flag makes the
    child exit 2 deterministically; --wedge_rc 2 maps that to 'wedged'.)"""
    env = dict(os.environ)
    env["PYTHONPATH"] = _ROOT + os.pathsep + env.get("PYTHONPATH", "")
    log = str(tmp_path / "events.jsonl")
    cmd = [sys.executable, _SUP, "--max_restarts", "1", "--wedge_rc", "2",
           "--log", log, "--",
           "--resume", "/prev/model_best_prod_ep40_0.93", "--no_such_flag"]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=str(tmp_path), timeout=300)
    assert proc.returncode == 2
    with open(log) as f:
        events = [json.loads(ln) for ln in f if ln.strip()]
    restarts = [e for e in events if e["event"] == "restart"]
    assert restarts, events
    assert all(e["resume"] == "/prev/model_best_prod_ep40_0.93"
               for e in restarts)
    relaunch = [e for e in events if e["event"] == "launch"][1]
    assert "--resume" in relaunch["cmd"]
    assert "/prev/model_best_prod_ep40_0.93" in relaunch["cmd"]
