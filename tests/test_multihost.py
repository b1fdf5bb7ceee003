"""Real 2-process multi-host simulation (SURVEY.md §2.5 / §5).

Spawns two Python processes that rendezvous through
``jax.distributed.initialize`` and form one 4-device global mesh (2
virtual CPU devices per process) — the multi-*process* complement to the
single-process 8-device conftest mesh. Covers the distributed bootstrap,
a train step whose gradient all-reduce crosses the process boundary, and
the COCO evaluator's cross-process detection merge. See
``multihost_worker.py`` for what each rank runs.
"""
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_and_eval_merge():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
    ok = [line for out in outs for line in out.splitlines()
          if line.startswith("MULTIHOST_OK")]
    assert len(ok) == 2, outs
    # both ranks computed the same (globally all-reduced) loss and the
    # same merged mAP
    assert len({line.split("loss=")[1] for line in ok}) == 1, ok
