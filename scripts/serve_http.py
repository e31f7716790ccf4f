#!/usr/bin/env python
"""Serve a frozen StableHLO artifact over HTTP (production serving host).

    python scripts/export_serving.py --ckpt ckpts/..._best.ckpt --out serving/model.zip
    python scripts/serve_http.py --artifact serving/model.zip --port 8764

    # client: POST .npy bytes, read .npy bytes back
    curl -s -X POST --data-binary @human_windows.npy \
        -H 'Content-Type: application/octet-stream' \
        http://127.0.0.1:8764/v1/retarget -o joints.npy

The reference has no serving daemon (deployment re-imports model class +
torch checkpoint per process); see bridgerl_tpu/export/server.py.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", type=str, required=True, help="serving .zip")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8764)
    p.add_argument("--no-bucket", action="store_true",
                   help="disable power-of-two batch bucketing (compile per exact size)")
    p.add_argument("--max_requests", type=int, default=None,
                   help="serve N requests then exit (smoke tests)")
    args = p.parse_args()

    from bridgerl_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from bridgerl_tpu.export.server import make_server

    srv = make_server(args.artifact, host=args.host, port=args.port,
                      bucket_batches=not args.no_bucket)
    host, port = srv.server_address
    print(f"[INFO] serving {args.artifact} on http://{host}:{port}/ "
          f"(POST /v1/retarget | /v1/robot_recon; Ctrl-C stops)")
    try:
        if args.max_requests is None:
            srv.serve_forever()
        else:
            for _ in range(args.max_requests):
                srv.handle_request()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()


if __name__ == "__main__":
    main()
