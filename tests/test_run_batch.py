"""Smoke test for the in-process batch runner (scripts/run_batch.py): the
operational tool every training campaign goes through. Asserts the spec
format keeps working, artifacts land in the spec's directories, and a failing
run is isolated (later runs still execute; exit code reports the failure)."""

import json
import os
import subprocess
import sys
from pathlib import Path


from bridgerl_tpu.data import generate_synthetic_dataset

REPO = Path(__file__).resolve().parents[1]


def test_run_batch_executes_specs_and_isolates_failures(tmp_path):
    data_dir = tmp_path / "data"
    generate_synthetic_dataset(str(data_dir), n_sequences=6, min_len=40,
                               max_len=60, window=10, step=2, seed=0)
    spec = [
        # run 0: fails fast (unknown method) — must NOT stop the batch
        {"label": "bad", "arch": "resnet_no_down", "method": "nosuch",
         "data_dir": str(data_dir), "window": 10, "epochs": 1,
         "batch_size": 32, "seeds": [42],
         "hidden_dim": 8, "num_res_layers": 1,
         "log_dir": str(tmp_path / "results"),
         "checkpoint_dir": str(tmp_path / "ckpts")},
        # run 1: tiny ae teacher — must complete despite run 0's failure
        {"label": "good", "arch": "resnet_no_down", "method": "ae",
         "data_dir": str(data_dir), "window": 10, "epochs": 2,
         "batch_size": 32, "seeds": [42], "save_every": 1,
         "hidden_dim": 8, "num_res_layers": 1,
         "log_dir": str(tmp_path / "results"),
         "checkpoint_dir": str(tmp_path / "ckpts")},
    ]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))

    env = dict(os.environ, BRIDGERL_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_batch.py"), str(spec_path)],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(REPO))

    assert proc.returncode == 1, proc.stdout + proc.stderr  # the bad run reported
    assert "BATCH DONE failures=['bad']" in proc.stdout
    assert "=== batch[1] good OK ===" in proc.stdout
    # artifacts in the spec's directories with reference naming
    assert (tmp_path / "results" / "log_resnet_no_down_ae_seed_42.json").exists()
    assert (tmp_path / "ckpts" /
            "Exp_resnet_no_down_W10_ae_teacher_seed_42_final.ckpt").exists()
    hist = json.loads((tmp_path / "results" /
                       "log_resnet_no_down_ae_seed_42.json").read_text())
    assert len(hist["train_loss"]) == 2
