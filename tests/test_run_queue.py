"""Smoke test for the in-process script queue (scripts/run_queue.py): the
operational tool multi-experiment TPU sessions go through (one device claim
for N heterogeneous CLI scripts). Asserts argv threading, per-entry failure
isolation (later entries still run), SystemExit handling, and the exit code
reporting."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_run_queue_isolates_failures_and_threads_argv(tmp_path):
    ok1 = tmp_path / "ok1.py"
    ok1.write_text(
        "import sys, pathlib\n"
        "pathlib.Path(sys.argv[1]).write_text(','.join(sys.argv[2:]))\n")
    boom = tmp_path / "boom.py"
    boom.write_text("raise RuntimeError('boom')\n")
    exits = tmp_path / "exits.py"
    exits.write_text("import sys; sys.exit(0)\n")  # explicit clean exit
    ok2 = tmp_path / "ok2.py"
    ok2.write_text(
        "import sys, pathlib\n"
        "pathlib.Path(sys.argv[1]).write_text('ran')\n")

    out1, out2 = tmp_path / "out1.txt", tmp_path / "out2.txt"
    queue = [
        [str(ok1), str(out1), "alpha", "beta"],
        [str(boom)],
        [str(exits)],
        [str(ok2), str(out2)],
    ]
    qpath = tmp_path / "queue.json"
    qpath.write_text(json.dumps(queue))

    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_queue.py"), str(qpath)],
        capture_output=True, text=True, timeout=120, cwd=str(REPO))

    # the failing entry is reported through the exit code...
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "1 failed" in proc.stdout
    # ...but does not stop the queue: both later entries ran
    assert out2.read_text() == "ran"
    # argv is threaded to each entry exactly (script path = argv[0])
    assert out1.read_text() == "alpha,beta"
    # sys.exit(0) counts as success
    assert proc.stdout.count("OK (") == 3


def test_run_queue_all_ok_exit_zero(tmp_path):
    ok = tmp_path / "ok.py"
    ok.write_text("print('hello')\n")
    qpath = tmp_path / "queue.json"
    qpath.write_text(json.dumps([[str(ok)]]))
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_queue.py"), str(qpath)],
        capture_output=True, text=True, timeout=60, cwd=str(REPO))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "all entries OK" in proc.stdout
