"""Run supervisor: auto-resume training runs that hang or crash.

Round 3 lost more wall-clock to tunnel RPC hangs than to any technical
gap (VERDICT r3 weak #5): a stalled device call freezes the training
process mid-epoch with no output, and the run's remaining epochs are
forfeit. This wrapper converts those losses into a bounded restart:

  python scripts/supervise.py --stall 900 --deadline 4800 -- \
      bash configs/training/OID_Joint.sh --auto_resume

- child stdout/stderr is streamed through (so the queue's ``tee`` still
  captures everything) while a watchdog tracks the last-output time;
- no output for ``--stall`` seconds -> the whole process group is
  killed (SIGTERM, then SIGKILL) and the command is relaunched — the
  command must include ``--auto_resume`` (dfvod_tpu CLI) so the relaunch
  continues from the last per-epoch checkpoint with the optimizer state
  and best-mAP watermark intact;
- a non-zero exit also triggers a relaunch (capped by ``--max_restarts``)
  EXCEPT rc=42, the deliberate NaN hard-exit code emitted by
  ``dfvod_tpu/cli/main.py`` (``engine_single.py:56-59`` parity) —
  retrying a NaN loss would just re-diverge. Plain rc=1 (any unhandled
  Python exception; pipefail propagates it through the bash config
  wrappers) IS retried: round 4 lost a chain step when a transient
  ``FileNotFoundError`` was misclassified as NaN divergence;
- ``--deadline`` bounds the total wall time (like ``timeout`` but
  restart-aware); on expiry the child is killed and we exit 124.

Exit code: the child's final rc (0 on success), 124 on deadline.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import threading
import time

# must match dfvod_tpu.cli.main.NAN_EXIT_CODE (not imported: this script
# runs before any jax import and must stay dependency-free)
NAN_EXIT_CODE = 42


def _kill_group(proc: subprocess.Popen) -> None:
    """SIGTERM the child's process group, escalate to SIGKILL."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    for sig, grace in ((signal.SIGTERM, 10.0), (signal.SIGKILL, 5.0)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        t0 = time.time()
        while time.time() - t0 < grace:
            if proc.poll() is not None:
                return
            time.sleep(0.25)


def run_once(cmd, stall_s: float, deadline_at: float):
    """One supervised attempt. Returns (rc, 'ok'|'stall'|'deadline')."""
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True, bufsize=1, text=True,
        errors="replace")
    last_output = [time.time()]

    def pump():
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            last_output[0] = time.time()
        proc.stdout.close()

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    while True:
        rc = proc.poll()
        if rc is not None:
            t.join(timeout=5)
            return rc, "ok"
        now = time.time()
        if now > deadline_at:
            print(f"[supervise] deadline reached, killing pid {proc.pid}",
                  flush=True)
            _kill_group(proc)
            return 124, "deadline"
        if now - last_output[0] > stall_s:
            print(f"[supervise] no output for {now - last_output[0]:.0f}s "
                  f"(stall limit {stall_s:.0f}s), killing pid {proc.pid}",
                  flush=True)
            _kill_group(proc)
            return -1, "stall"
        time.sleep(2.0)


def main():
    ap = argparse.ArgumentParser("supervise")
    ap.add_argument("--stall", type=float, default=900.0,
                    help="seconds without child output before a restart "
                         "(default 900 — first XLA compiles on a cold "
                         "cache can take minutes)")
    ap.add_argument("--deadline", type=float, default=0.0,
                    help="total wall-clock budget in seconds (0 = none)")
    ap.add_argument("--max_restarts", type=int, default=4)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    a = ap.parse_args()
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no command given")
    deadline_at = time.time() + a.deadline if a.deadline else float("inf")

    attempt = 0
    while True:
        attempt += 1
        print(f"[supervise] attempt {attempt}: {' '.join(cmd)}", flush=True)
        rc, why = run_once(cmd, a.stall, deadline_at)
        if why == "deadline":
            sys.exit(124)
        if why == "ok" and rc == 0:
            sys.exit(0)
        if why == "ok" and rc == NAN_EXIT_CODE:
            print(f"[supervise] child exited rc={rc} (NaN hard-exit) — "
                  "not retrying", flush=True)
            sys.exit(rc)
        if attempt > a.max_restarts:
            print(f"[supervise] giving up after {attempt} attempts "
                  f"(last rc={rc}, reason={why})", flush=True)
            sys.exit(rc if rc > 0 else 70)
        print(f"[supervise] restarting (rc={rc}, reason={why})", flush=True)
        time.sleep(5.0)


if __name__ == "__main__":
    main()
