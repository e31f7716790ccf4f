#!/usr/bin/env python
"""Run several CLI scripts sequentially IN ONE PROCESS (one device claim).

run_batch.py amortizes the ~13-min tunnel/backend claim for *training specs*;
this is the same idea for heterogeneous scripts (scaling experiments,
benchmarks, exporters): a JSON list of argv lists, executed via runpy with
per-entry failure isolation, so a 4-experiment TPU queue pays the claim tax
once instead of four times.

    python scripts/run_queue.py queue.json
    # queue.json: [["scripts/exp_prior_scaling.py", "--arms", "1280"], ...]
"""

import gc
import json
import runpy
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    queue = json.loads(Path(sys.argv[1]).read_text())
    failures = []
    for i, argv in enumerate(queue):
        label = f"queue[{i}] {' '.join(argv)}"
        print(f"=== {label} start ===", flush=True)
        t0 = time.time()
        saved = sys.argv
        try:
            sys.argv = list(argv)
            runpy.run_path(argv[0], run_name="__main__")
            print(f"=== {label} OK ({time.time() - t0:.0f}s) ===", flush=True)
        except SystemExit as e:
            if e.code not in (0, None):
                failures.append(label)
                print(f"=== {label} EXIT {e.code} ===", flush=True)
            else:
                print(f"=== {label} OK ({time.time() - t0:.0f}s) ===",
                      flush=True)
        except Exception:
            failures.append(label)
            traceback.print_exc()
            print(f"=== {label} FAILED ===", flush=True)
        finally:
            sys.argv = saved
            # Drop cached project modules so the next entry loads current
            # code from disk: the s10 sweep failed with a stale
            # bridgerl_tpu.train.prior (imported at queue start, edited
            # mid-queue) whose sample_motion predated guide_candidates.
            # jax/compiled programs stay cached; only repo modules reload.
            for name in [m for m in sys.modules if m == "bridgerl_tpu"
                         or m.startswith("bridgerl_tpu.")]:
                del sys.modules[name]
            gc.collect()
    if failures:
        print(f"[QUEUE] {len(failures)} failed: {failures}", flush=True)
        sys.exit(1)
    print("[QUEUE] all entries OK", flush=True)


if __name__ == "__main__":
    main()
