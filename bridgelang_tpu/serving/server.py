"""REST action server: POST /act {image, instruction, unnorm_key?} -> {action}.

Counterpart of reference vla-scripts/deploy.py:66-145 (FastAPI + uvicorn +
json_numpy). None of those are in the TPU image, so the server is stdlib
`http.server` with a small numpy-JSON codec — zero extra dependencies, same
wire contract plus a base64 fast path:

  image: nested-list JSON (json_numpy style), or {"__b64__", "shape",
         "dtype"} raw-bytes base64 (much cheaper for camera frames)
  instruction: str
  unnorm_key: optional dataset key for de-normalization statistics

Also serves GET /healthz. The model path is the fully-jitted
OpenVLA.predict_action, so steady-state latency is the bench number.
"""

from __future__ import annotations

import base64
import json
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np


def decode_image(payload: Any) -> np.ndarray:
    if isinstance(payload, dict) and "__b64__" in payload:
        raw = base64.b64decode(payload["__b64__"])
        arr = np.frombuffer(raw, dtype=np.dtype(payload.get("dtype", "uint8")))
        return arr.reshape(payload["shape"]).copy()
    if isinstance(payload, str):
        # double-encoded fallback (reference deploy.py:93-100)
        return decode_image(json.loads(payload))
    arr = np.asarray(payload)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return arr


def encode_array(arr: np.ndarray) -> Any:
    return np.asarray(arr).tolist()


class VLAServer:
    """Wraps an OpenVLA model + params; `run()` blocks serving requests."""

    def __init__(self, model, params, default_unnorm_key: Optional[str] = None):
        self.model = model
        self.params = params
        self.default_unnorm_key = default_unnorm_key

    def predict(self, request: Dict[str, Any]) -> Dict[str, Any]:
        image = decode_image(request["image"])
        instruction = request["instruction"]
        unnorm_key = request.get("unnorm_key", self.default_unnorm_key)
        action = self.model.predict_action(self.params, image, instruction, unnorm_key=unnorm_key)
        return {"action": encode_array(action)}

    def make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, code: int, payload: Dict[str, Any]) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok"})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/act":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    request = json.loads(self.rfile.read(length))
                    self._send(200, server_self.predict(request))
                except Exception:
                    # per-request error containment (reference deploy.py:110-118)
                    traceback.print_exc()
                    self._send(500, {"error": "error", "detail": traceback.format_exc(limit=3)})

        return Handler

    def run(self, host: str = "0.0.0.0", port: int = 8000):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        print(f"[serve] listening on {host}:{port} (POST /act)")
        httpd.serve_forever()

    def serve_background(self, host: str = "127.0.0.1", port: int = 8000):
        import threading

        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd


def client_act(host: str, port: int, image: np.ndarray, instruction: str, unnorm_key: Optional[str] = None,
               use_b64: bool = True) -> np.ndarray:
    """Minimal client (counterpart of the reference's requests snippet in
    deploy.py's docstring; also used by the robot eval harnesses)."""
    import http.client

    if use_b64:
        img_payload = {
            "__b64__": base64.b64encode(np.ascontiguousarray(image).tobytes()).decode("ascii"),
            "shape": list(image.shape),
            "dtype": str(image.dtype),
        }
    else:
        img_payload = image.tolist()
    body = json.dumps({"image": img_payload, "instruction": instruction, "unnorm_key": unnorm_key})
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request("POST", "/act", body=body, headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"server error: {data}")
    return np.asarray(data["action"])
