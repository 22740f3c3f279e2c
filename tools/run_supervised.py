"""Auto-resume supervisor: survive backend wedges without operator action.

The CLI exits with a distinct code (17) when the remote backend wedges a
device fetch mid-run (utils/obs.py::fetch_with_deadline — the process is
unrecoverable because the wedged RPC thread can never be joined; observed
live in rounds 3-4).  The reference simply loses the run — it has no load
path at all (/root/reference/src/utils.py:52 is save-only).  This
supervisor closes the fault-tolerance loop (SURVEY §5 failure-recovery
row, VERDICT r04 item 5): it relaunches the training command on rc=17
with ``--resume <newest checkpoint>``, bounded retries, and a jsonl event
log, so a 50-epoch run survives a wedge end-to-end.

Usage:
    python tools/run_supervised.py [--max_restarts N] [--log events.jsonl]
        -- <graphsage_tpu.cli args...>

Example:
    python tools/run_supervised.py --max_restarts 3 -- \
        --dataSet cora --epochs 50 --b_sz 20 --name prod --quiet

Semantics:
- rc 0: done, supervisor exits 0.
- rc 17 (wedge): pick the newest checkpoint under --checkpoint_dir
  (newest mtime; the CLI names them model_best_<name>_ep<E>_<f1>), strip
  any prior --resume/--max_vali_f1 from the args, relaunch with
  ``--resume <ckpt>``.  Without a checkpoint yet, relaunch fresh (the
  wedge hit before the first val improvement).  At most --max_restarts
  relaunches, then exit 17.
- any other rc: a real error; exit with it immediately (restarting can't
  fix a crash that isn't a wedge).

Resume correctness is the checkpoint layer's contract: params + epoch +
best-F1 + host RNG + (cached pipelines) the device PRNG key, bit-exact
for refresh_every=1 (utils/checkpoint.py, tests/test_checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _newest_checkpoint(ckpt_dir: str, run_name: str) -> str | None:
    """Newest checkpoint OF THIS RUN — the CLI names them
    model_best_<name>_ep<E>_<f1>, and a shared checkpoint_dir may hold
    other runs' checkpoints; resuming from a different run's params/RNG
    would silently continue the wrong model."""
    if not os.path.isdir(ckpt_dir):
        return None
    prefix = f"model_best_{run_name}_"
    entries = [os.path.join(ckpt_dir, e) for e in os.listdir(ckpt_dir)
               if e.startswith(prefix)]
    if not entries:
        return None
    return max(entries, key=os.path.getmtime)


def _strip_flag(args: list[str], flag: str) -> list[str]:
    out, skip = [], False
    for a in args:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = True
            continue
        if a.startswith(flag + "="):
            continue
        out.append(a)
    return out


def _flag_value(args: list[str], flag: str, default: str) -> str:
    for i, a in enumerate(args):
        if a == flag and i + 1 < len(args):
            return args[i + 1]
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return default


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        print("usage: run_supervised.py [opts] -- <cli args>",
              file=sys.stderr)
        return 2
    split = argv.index("--")
    sup_args, cli_args = argv[:split], argv[split + 1:]
    p = argparse.ArgumentParser()
    p.add_argument("--max_restarts", type=int, default=3)
    p.add_argument("--log", type=str, default=None,
                   help="jsonl supervisor event log")
    p.add_argument("--wedge_rc", type=int, default=17,
                   help="exit code that means 'wedged, restart+resume'")
    opts = p.parse_args(sup_args)

    t0 = time.time()
    fp = open(opts.log, "a") if opts.log else None

    def log(event: str, **fields):
        rec = {"t": round(time.time() - t0, 3), "event": event, **fields}
        line = json.dumps(rec)
        if fp:
            fp.write(line + "\n")
            fp.flush()
        print(f"[supervisor] {line}", file=sys.stderr)

    ckpt_dir = _flag_value(cli_args, "--checkpoint_dir", "checkpoints")
    run_name = _flag_value(cli_args, "--name", "debug")
    attempt = 0
    args = cli_args
    while True:
        cmd = [sys.executable, "-u", "-m", "graphsage_tpu.cli"] + args
        log("launch", attempt=attempt, cmd=cmd)
        rc = subprocess.call(cmd)
        log("exit", attempt=attempt, rc=rc)
        if rc != opts.wedge_rc:
            # clean finish or a real (non-wedge) failure — either way,
            # restarting is wrong; surface the child's code
            if fp:
                fp.close()
            return rc
        if attempt >= opts.max_restarts:
            log("giving_up", restarts=attempt)
            if fp:
                fp.close()
            return rc
        attempt += 1
        ckpt = _newest_checkpoint(ckpt_dir, run_name)
        if ckpt is not None:
            args = _strip_flag(_strip_flag(cli_args, "--resume"),
                               "--max_vali_f1") + ["--resume", ckpt]
            log("restart", attempt=attempt, resume=ckpt)
        else:
            # wedged before this run wrote its first checkpoint: relaunch
            # with the ORIGINAL args untouched — if the operator passed
            # --resume themselves, stripping it here would silently
            # restart their run from scratch
            args = cli_args
            log("restart", attempt=attempt,
                resume=_flag_value(cli_args, "--resume", None))


if __name__ == "__main__":
    sys.exit(main())
