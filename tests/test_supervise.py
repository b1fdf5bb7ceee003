"""Supervisor behavior (scripts/supervise.py): stall detection, restart
with bounded attempts, NaN-exit passthrough, deadline. Uses tiny shell
children — no JAX, runs in seconds."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUP = os.path.join(REPO, "scripts", "supervise.py")


def run(args, timeout=120):
    return subprocess.run(
        [sys.executable, SUP, *args], capture_output=True, text=True,
        timeout=timeout)


class TestSupervise:
    def test_success_passthrough(self):
        r = run(["--stall", "30", "--", "sh", "-c", "echo hi; exit 0"])
        assert r.returncode == 0
        assert "hi" in r.stdout.splitlines()

    def test_stall_kills_and_restarts_until_cap(self):
        # child prints once then sleeps silently -> stall fires; with
        # max_restarts=1 we get 2 attempts then the giving-up exit code
        r = run(["--stall", "2", "--max_restarts", "1", "--",
                 "sh", "-c", "echo alive; sleep 600"])
        assert r.returncode == 70
        assert r.stdout.splitlines().count("alive") == 2
        assert "no output for" in r.stdout

    def test_stall_then_success_via_state_file(self, tmp_path):
        # first attempt stalls; relaunch finds the state file and exits 0
        # (models the --auto_resume contract)
        flag = tmp_path / "resumed"
        cmd = (f"echo start; if [ -f {flag} ]; then exit 0; fi; "
               f"touch {flag}; sleep 600")
        r = run(["--stall", "2", "--", "sh", "-c", cmd])
        assert r.returncode == 0
        assert r.stdout.splitlines().count("start") == 2

    def test_nan_exit_not_retried(self):
        # rc=42 is the deliberate divergence code
        # (dfvod_tpu.cli.main.NAN_EXIT_CODE)
        r = run(["--stall", "30", "--", "sh", "-c", "echo nan; exit 42"])
        assert r.returncode == 42
        assert r.stdout.splitlines().count("nan") == 1
        assert "NaN hard-exit" in r.stdout

    def test_rc1_crash_is_retried(self):
        # plain rc=1 (any unhandled Python exception) must be retried —
        # round 4 lost a chain step to a FileNotFoundError misread as NaN
        r = run(["--stall", "30", "--max_restarts", "2", "--",
                 "sh", "-c", "echo oops; exit 1"])
        assert r.returncode == 1
        assert r.stdout.splitlines().count("oops") == 3
        assert "NaN hard-exit" not in r.stdout

    def test_crash_is_retried(self):
        r = run(["--stall", "30", "--max_restarts", "2", "--",
                 "sh", "-c", "echo boom; exit 3"])
        assert r.returncode == 3
        assert r.stdout.splitlines().count("boom") == 3

    def test_deadline(self):
        r = run(["--stall", "60", "--deadline", "3", "--",
                 "sh", "-c", "echo tick; sleep 600"])
        assert r.returncode == 124
