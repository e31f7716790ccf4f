"""Minimal production serving host over a StableHLO artifact.

Stdlib-only HTTP front end (the image ships no web framework) around
`load_serving_artifact`: POST raw motion windows, get retargeted joints
back. The reference has no serving daemon at all — its deployment path is
"import the model class and a torch checkpoint into your own process"
(reference scripts/deployment/export_motion.py:112-151) — so this host is
net-new surface enabled by the artifact being self-contained.

Endpoints:
    GET  /healthz          {"ok": true, "platform": ..., "window": W}
    GET  /meta             the artifact's meta.json (signatures, provenance)
    POST /v1/retarget      (b, W, 126) raw human windows -> (b, W, 29) joints
    POST /v1/robot_recon   (b, W, 29)  raw robot windows -> (b, W, 29) recon

Request/response bodies are either `.npy` bytes (Content-Type
application/octet-stream; zero-copy-ish, preferred) or JSON
``{"windows": [[[...]]]}`` — the response mirrors the request format.

Batch bucketing: the artifact's batch dim is symbolic, but each distinct
request size would still JIT its own executable. The host rounds batches up
to the next power of two (zero-padded, result sliced back), bounding
lifetime compiles to log2(max_batch) per function; disable with
``bucket_batches=False`` for exact-shape execution.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .serialize import ServingModule, load_serving_artifact

_OCTET = "application/octet-stream"
_JSON = "application/json"


def _bucket(b: int) -> int:
    return 1 << max(0, b - 1).bit_length() if b > 1 else 1


class ServingApp:
    """Transport-independent request handling (also the test seam)."""

    def __init__(self, module: ServingModule, bucket_batches: bool = True):
        self.module = module
        self.bucket_batches = bucket_batches
        self._lock = threading.Lock()  # serialize device work across client threads

    def call(self, fn_name: str, x):
        """Returns an (b, ...) array, or a dict of them for motion_codes.

        ``x`` is an (b, W, D) float array for the motion-in functions, or a
        dict of (b, T') int code streams for dict-input functions
        (decode_codes).
        """
        sig = self.module.meta["functions"].get(fn_name)
        if sig is None:
            raise KeyError(fn_name)
        if sig.get("kind") == "generator":
            x = np.asarray(x)
            if x.shape != (2,):
                raise ValueError(
                    f"{fn_name} expects a (2,) uint32 threefry key "
                    f"(or JSON {{\"seed\": N}}), got shape {x.shape}")
            with self._lock:
                return np.asarray(self.module.fns[fn_name](x.astype(np.uint32)))
        if isinstance(sig["input"], dict):
            x = self._check_codes(fn_name, sig, x)
            b = next(iter(x.values())).shape[0]
            pad = _bucket(b) - b if self.bucket_batches else 0
            if pad:
                x = {k: np.concatenate(
                    [v, np.zeros((pad, *v.shape[1:]), v.dtype)]) for k, v in x.items()}
        else:
            if not isinstance(x, np.ndarray):
                raise ValueError(f"{fn_name} expects a single array body")
            want = (sig["input"][1], sig["input"][2])
            if x.ndim != 3 or x.shape[1:] != want:
                raise ValueError(
                    f"{fn_name} expects (b, {want[0]}, {want[1]}) float32, got {x.shape}")
            x = np.asarray(x, np.float32)
            b = x.shape[0]
            if self.bucket_batches and _bucket(b) != b:
                x = np.concatenate(
                    [x, np.zeros((_bucket(b) - b, *x.shape[1:]), np.float32)])
        with self._lock:
            out = self.module.fns[fn_name](x)
        if isinstance(out, dict):
            return {k: np.asarray(v)[:b] for k, v in out.items()}
        return np.asarray(out)[:b]

    @staticmethod
    def _check_codes(fn_name: str, sig, x) -> dict:
        if not isinstance(x, dict):
            raise ValueError(
                f"{fn_name} expects a dict of code streams "
                f"{sorted(sig['input'])} (npz or JSON 'codes' body)")
        missing = sorted(set(sig["input"]) - set(x))
        extra = sorted(set(x) - set(sig["input"]))
        if missing or extra:
            raise ValueError(
                f"{fn_name} streams mismatch: missing={missing} extra={extra}")
        out, batch = {}, None
        for k, spec in sig["input"].items():
            v = np.asarray(x[k])
            if v.ndim != 2 or v.shape[1] != spec[1]:
                raise ValueError(
                    f"{fn_name} stream {k!r} expects (b, {spec[1]}) int32, "
                    f"got {v.shape}")
            if batch is None:
                batch = v.shape[0]
            elif v.shape[0] != batch:
                raise ValueError(f"{fn_name} streams disagree on batch size")
            out[k] = v.astype(np.int32)
        return out


def make_server(artifact_path: str, host: str = "127.0.0.1", port: int = 8764,
                bucket_batches: bool = True,
                module: Optional[ServingModule] = None) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; port 0 picks an ephemeral one."""
    app = ServingApp(module or load_serving_artifact(artifact_path),
                     bucket_batches=bucket_batches)
    meta_payload = json.dumps(app.module.meta).encode()
    import jax
    health_payload = json.dumps({
        "ok": True, "platform": jax.devices()[0].platform,
        "window": app.module.window_size,
        "functions": sorted(app.module.meta["functions"]),
    }).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, msg: str) -> None:
            self._reply(code, json.dumps({"error": msg}).encode(), _JSON)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/healthz":
                self._reply(200, health_payload, _JSON)
            elif self.path == "/meta":
                self._reply(200, meta_payload, _JSON)
            else:
                self._error(404, f"no such path {self.path!r}")

        def do_POST(self):  # noqa: N802
            if not self.path.startswith("/v1/"):
                return self._error(404, f"no such path {self.path!r}")
            fn_name = self.path[len("/v1/"):]
            if fn_name not in app.module.meta["functions"]:
                return self._error(404, f"unknown function {fn_name!r}")
            try:
                raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
                ctype = (self.headers.get("Content-Type") or _OCTET).split(";")[0]
                sig = app.module.meta["functions"][fn_name]
                dict_input = isinstance(sig["input"], dict)
                generator = sig.get("kind") == "generator"
                if ctype == _JSON and generator:
                    body = json.loads(raw)
                    if not isinstance(body, dict) or "seed" not in body:
                        raise ValueError('JSON body must be {"seed": <int>}')
                    import jax as _jax
                    x = np.asarray(_jax.random.key_data(_jax.random.key(
                        int(body["seed"]), impl="threefry2x32")), np.uint32)
                elif ctype == _JSON:
                    body = json.loads(raw)
                    key = "codes" if dict_input else "windows"
                    if not isinstance(body, dict) or key not in body:
                        raise ValueError(f'JSON body must be {{"{key}": ...}}')
                    x = (body["codes"] if dict_input
                         else np.asarray(body["windows"], np.float32))
                elif dict_input:
                    z = np.load(io.BytesIO(raw), allow_pickle=False)
                    if isinstance(z, np.ndarray):
                        raise ValueError(
                            f"{fn_name} expects an .npz of code streams")
                    with z:
                        x = {k: z[k] for k in z.files}
                else:
                    x = np.load(io.BytesIO(raw), allow_pickle=False)
                    if not isinstance(x, np.ndarray):
                        raise ValueError(
                            "octet body must be a single .npy array (got .npz?)")
                out = app.call(fn_name, x)
            except KeyError:
                return self._error(404, f"unknown function {fn_name!r}")
            # A malformed body can surface as any of these (empty body ->
            # EOFError, truncated .npy -> OSError, scalar JSON -> TypeError,
            # ragged lists -> ValueError): all are client errors, and a
            # serving daemon must answer 400, never drop the socket.
            except (ValueError, TypeError, EOFError, OSError,
                    json.JSONDecodeError) as e:
                return self._error(400, str(e) or type(e).__name__)
            buf = io.BytesIO()
            if isinstance(out, dict):  # motion_codes: one stream per key
                if ctype == _JSON:
                    body = {"codes": {k: v.tolist() for k, v in out.items()}}
                    return self._reply(200, json.dumps(body).encode(), _JSON)
                np.savez(buf, **out)  # .npz response
            elif ctype == _JSON:
                return self._reply(
                    200, json.dumps({"windows": out.tolist()}).encode(), _JSON)
            else:
                np.save(buf, out)  # .npy response
            self._reply(200, buf.getvalue(), _OCTET)

    # HTTPServer already sets allow_reuse_address = 1 (class attribute)
    srv = ThreadingHTTPServer((host, port), Handler)
    srv.app = app  # exposed for tests/introspection
    return srv
