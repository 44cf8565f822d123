"""HTTP inference server: the deployment surface over ``serving.WorldModel``.

The reference has no serving layer at all (SURVEY §1: "no serving layer");
this stands a trained world model behind a small JSON-over-HTTP API so
non-JAX clients can drive observe → imagine → decode loops:

- ``GET  /healthz``            → model class, param count, device platform.
- ``POST /observe``            → filter an observation batch; returns a
  ``state_id`` handle for the final posterior latent (and, with
  ``"decode": true``, the posterior reconstructions).
- ``POST /imagine``            → prior-only rollout from a ``state_id``
  under an action plan; returns decoded frames (``"decode": true``,
  default) and a new ``state_id`` for chained continuation.

Arrays travel as JSON nested lists by default (simple, curl-able). For
throughput, both POST routes also speak **binary npz framing**: send the
request as ``np.savez`` bytes with ``Content-Type: application/x-npz``
(same field names; scalars as 0-d arrays) and the response comes back as
npz too — measured ~6.5× the JSON request rate on a CPU-local backend
and 2.4× on the tunneled chip, where the ~35 ms/device-call RTT dominates
instead (BASELINE.md); JSON (de)serialization of frame payloads is what
the framing removes. Error
responses are always JSON (read the body when status != 200). Latent
states never leave the device: the server keeps them in a bounded LRU
store and hands out opaque ids, so a continuation costs one handle
instead of a host→device round trip of the whole latent.

Run: ``python scripts/serve.py --config configs/mopoe_mrssm.yaml
--checkpoint runs/x/checkpoints [--port 8000]``.
"""

from __future__ import annotations

import json
import threading
import uuid
import zipfile
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np


class UnknownStateError(KeyError):
    """A state_id handle that is not (or no longer) in the LRU store."""


class _StateStore:
    """Bounded LRU map: state_id → on-device latent state."""

    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self._d: OrderedDict[str, object] = OrderedDict()
        self._lock = threading.Lock()

    def put(self, state) -> str:
        sid = uuid.uuid4().hex[:16]
        with self._lock:
            self._d[sid] = state
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)
        return sid

    def get(self, sid: str):
        with self._lock:
            state = self._d.get(sid)
            if state is not None:
                self._d.move_to_end(sid)
            return state


class InferenceServer:
    """Serve a ``WorldModel`` over HTTP. ``port=0`` picks a free port
    (exposed as ``.port`` after construction)."""

    def __init__(self, world_model, host: str = "127.0.0.1", port: int = 8000,
                 state_capacity: int = 64):
        self.wm = world_model
        self.states = _StateStore(state_capacity)
        # One lock around device work: requests serialize on the chip anyway;
        # this keeps jit-cache/state interactions race-free under the
        # threading server.
        self._device_lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet; observability is JSONL/W&B
                pass

            def _send(self, code: int, payload: dict, binary: bool = False) -> None:
                if binary:
                    body = _payload_to_npz(payload)
                    ctype = "application/x-npz"
                else:
                    body = json.dumps(payload).encode()
                    ctype = "application/json"
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, server._health())
                else:
                    self._send(404, {"error": f"unknown route {self.path}"})

            def do_POST(self):
                binary = "npz" in (self.headers.get("Content-Type") or "") or \
                    "octet-stream" in (self.headers.get("Content-Type") or "")
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length)
                    req = _npz_to_request(body) if binary else json.loads(body or b"{}")
                except (ValueError, json.JSONDecodeError, OSError, EOFError,
                        zipfile.BadZipFile) as e:
                    # Malformed npz bodies surface as BadZipFile (zip-magic
                    # prefix + garbage, e.g. truncated upload) or EOFError
                    # (empty body) — neither subclasses OSError/ValueError.
                    self._send(400, {"error": f"bad request body: {e}"})
                    return
                try:
                    if self.path == "/observe":
                        self._send(200, server._observe(req, raw=binary), binary)
                    elif self.path == "/imagine":
                        self._send(200, server._imagine(req, raw=binary), binary)
                    else:
                        self._send(404, {"error": f"unknown route {self.path}"})
                except UnknownStateError as e:
                    self._send(404, {"error": f"unknown state_id {e.args[0]!r}"})
                except KeyError as e:
                    # Missing request field — schema error, not a lookup miss.
                    self._send(400, {"error": f"missing field {e.args[0]!r}"})
                except (ValueError, TypeError, IndexError, OverflowError) as e:
                    self._send(400, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — surface as HTTP 500
                    # Device-side failures (e.g. XlaRuntimeError on an
                    # oversized batch) must produce a JSON error, not a
                    # dropped connection.
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ---- endpoints -----------------------------------------------------------
    def _health(self) -> dict:
        from multimodal_mtrssm_tpu.utils import count_params

        n_params = count_params(self.wm.params)
        return {
            "ok": True,
            "model": type(self.wm.model).__name__,
            "n_params": n_params,
            "platform": jax.devices()[0].platform,
        }

    def _observe(self, req: dict, raw: bool = False) -> dict:
        actions = np.asarray(req["actions"], np.float32)
        audio = np.asarray(req["audio"], np.float32)
        vision = np.asarray(req["vision"], np.float32)
        key = jax.random.PRNGKey(int(req.get("seed", 0)))
        decoded = None
        with self._device_lock:
            posterior, _ = self.wm.observe(actions, audio, vision, key)
            last = posterior[:, -1]
            sid = self.states.put(last)
            out = {"state_id": sid, "batch": int(actions.shape[0]),
                   "t": int(actions.shape[1])}
            if req.get("decode", False):
                decoded = self.wm.decode(posterior)
        if decoded is not None:
            # Host-side serialization happens OUTSIDE the device lock —
            # it is pure CPU work and must not serialize other requests.
            out["recon"] = _frames_out(decoded, raw)
        return out

    def _imagine(self, req: dict, raw: bool = False) -> dict:
        state = self.states.get(str(req["state_id"]))
        if state is None:
            raise UnknownStateError(str(req["state_id"]))
        actions = np.asarray(req["actions"], np.float32)
        key = jax.random.PRNGKey(int(req.get("seed", 0)))
        decoded = None
        with self._device_lock:
            imagined = self.wm.imagine(actions, state, key)
            sid = self.states.put(imagined[:, -1])
            out = {"state_id": sid, "t": int(actions.shape[1])}
            if req.get("decode", True):
                decoded = self.wm.decode(imagined)
        if decoded is not None:
            out["frames"] = _frames_out(decoded, raw)
        return out

    # ---- lifecycle -----------------------------------------------------------
    def start(self) -> None:
        """Serve in a daemon thread (returns immediately)."""
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)


def _frames_out(decoded: dict, raw: bool) -> dict:
    """Decoded frames → response payload: numpy (npz framing) or lists."""
    arrays = {k: np.asarray(v, np.float32) for k, v in decoded.items()}
    return arrays if raw else {k: v.tolist() for k, v in arrays.items()}


def _npz_to_request(body: bytes) -> dict:
    """npz request bytes → the same dict shape the JSON path produces.

    0-d arrays unwrap to python scalars (``seed``, ``decode``, ``state_id``);
    array fields stay numpy (the endpoints ``np.asarray`` them anyway).
    """
    import io

    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: (v.item() if v.ndim == 0 else v) for k, v in z.items()}


def _payload_to_npz(payload: dict) -> bytes:
    """Response dict → npz bytes; one nesting level flattens with ``/``."""
    import io

    flat: dict[str, np.ndarray] = {}
    for k, v in payload.items():
        if isinstance(v, dict):
            for k2, v2 in v.items():
                flat[f"{k}/{k2}"] = np.asarray(v2)
        else:
            flat[k] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


def main(argv: list[str] | None = None) -> None:
    """CLI entry: stand a trained world model behind the HTTP server.

    Lives in the package (not scripts/) so ``python -m multimodal_mtrssm_tpu
    serve`` works from an installed distribution, not only a repo checkout.
    """
    import argparse

    from multimodal_mtrssm_tpu.serving import WorldModel

    ap = argparse.ArgumentParser(prog="serve")
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True, help="checkpoints dir of a run")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--use-pallas", default="auto", choices=["auto", "true", "false"])
    ap.add_argument("--mesh", action="store_true",
                    help="batch-parallel serving over all devices (data mesh)")
    args = ap.parse_args(argv)

    use_pallas = {"auto": "auto", "true": True, "false": False}[args.use_pallas]
    mesh = None
    if args.mesh:
        from multimodal_mtrssm_tpu.parallel import make_mesh

        mesh = make_mesh()
    wm = WorldModel.from_checkpoint(args.config, args.checkpoint,
                                    use_pallas=use_pallas, mesh=mesh)
    server = InferenceServer(wm, host=args.host, port=args.port)
    print(f"serving {type(wm.model).__name__} on http://{args.host}:{server.port} "
          "(/healthz /observe /imagine)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
