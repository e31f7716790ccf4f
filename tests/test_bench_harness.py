"""Bench harness hardening tests (round-4 verdict weak #1): repetition
plumbing and the busy-chip guard, CPU-only (no timing claims)."""

import subprocess
import sys
import time


def test_chip_busy_pids_excludes_self_and_finds_holders():
    import bench

    # this pytest process is not a holder
    assert all(isinstance(p, int) for p in bench.chip_busy_pids())
    # a live python process whose cmdline matches a known TPU entry point
    # is detected (argv carries the marker; the script path need not exist)
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; time.sleep(30)", "train_ablation.py"])
    try:
        for _ in range(20):
            if proc.pid in bench.chip_busy_pids():
                break
            time.sleep(0.1)
        assert proc.pid in bench.chip_busy_pids()
    finally:
        proc.kill()
        proc.wait()
    assert proc.pid not in bench.chip_busy_pids()


def test_wait_for_free_chip_times_out_quickly():
    import bench

    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; time.sleep(30)", "run_benchmark.py"])
    try:
        t0 = time.time()
        assert bench.wait_for_free_chip(0.0) is False
        assert time.time() - t0 < 5
    finally:
        proc.kill()
        proc.wait()
    assert bench.wait_for_free_chip(0.0) in (True, False)
