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

Request coalescing (``batch_window_ms > 0``): concurrent ``/imagine``
requests are collected for a short window and executed as ONE batched
device call — on the tunneled backend each device dispatch costs a
~3-35 ms round trip, so N coalesced requests pay ~1 RTT instead of N
(BASELINE.md "batching is the remaining lever"). Heterogeneous requests
coalesce exactly: different batch sizes concatenate on axis 0, shorter
action plans zero-pad to the longest — a rollout is a ``lax.scan``, so a
request's frames/latents are a *prefix* of the padded rollout and slice
back bit-exactly (pinned by ``tests/test_server.py``'s fake-model
equality test). Shapes bucket to powers of two so the jit cache sees a
handful of shapes instead of one per request mix. The one semantic
change: a coalesced request's samples are drawn from a key folded over
every request's seed in the batch, so per-``seed`` bit-reproducibility
holds only for uncoalesced requests (window 0 — the default — keeps
today's exact semantics). If a coalesced batch fails (e.g. one request's
action dim is wrong), every request is transparently re-run alone so one
bad request cannot poison its neighbours.

Run: ``python scripts/serve.py --config configs/mopoe_mrssm.yaml
--checkpoint runs/x/checkpoints [--port 8000] [--batch-window-ms 5]``.
"""

from __future__ import annotations

import json
import threading
import time
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


class _PendingImagine:
    """One enqueued /imagine request awaiting a coalesced device call."""

    __slots__ = ("state", "actions", "seed", "decode", "raw", "event",
                 "result", "error")

    def __init__(self, state, actions, seed: int, decode: bool, raw: bool):
        self.state = state
        self.actions = actions
        self.seed = seed
        self.decode = decode
        self.raw = raw
        self.event = threading.Event()
        self.result: dict | None = None
        self.error: BaseException | None = None


class _PendingObserve:
    """One enqueued /observe request awaiting a coalesced device call."""

    __slots__ = ("actions", "audio", "vision", "seed", "decode", "raw",
                 "event", "result", "error")

    def __init__(self, actions, audio, vision, seed: int, decode: bool, raw: bool):
        self.actions = actions
        self.audio = audio
        self.vision = vision
        self.seed = seed
        self.decode = decode
        self.raw = raw
        self.event = threading.Event()
        self.result: dict | None = None
        self.error: BaseException | None = None


class _ImagineBatcher:
    """Window-based request coalescer: collect concurrent requests for up
    to ``window_ms`` (or ``max_batch``), hand them to ``run_batch`` as one
    list, wake each waiter when its slot is filled. (Generic over the
    pending-item type — the /observe coalescer reuses it as-is.)"""

    def __init__(self, run_batch, window_ms: float, max_batch: int):
        self._run_batch = run_batch
        self._window = window_ms / 1000.0
        self._max = max_batch
        self._q: list[_PendingImagine] = []
        self._cv = threading.Condition()
        self._stop = False
        # Telemetry: executed coalesced-batch sizes (tests assert coalescing
        # actually happened; operators can read it for tuning).
        self.batch_sizes: list[int] = []
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item: _PendingImagine) -> dict:
        with self._cv:
            self._q.append(item)
            self._cv.notify_all()
        item.event.wait()
        if item.error is not None:
            raise item.error
        assert item.result is not None
        return item.result

    def stop(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._q and not self._stop:
                    self._cv.wait()
                if self._stop:
                    items, self._q = self._q, []
                else:
                    deadline = time.monotonic() + self._window
                    while len(self._q) < self._max:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0 or self._stop:
                            break
                        self._cv.wait(remaining)
                    items, self._q = self._q[:self._max], self._q[self._max:]
            if items:
                self.batch_sizes.append(len(items))
                try:
                    self._run_batch(items)
                except BaseException as e:  # noqa: BLE001 — waiters must wake
                    for it in items:
                        if it.error is None and it.result is None:
                            it.error = e
                finally:
                    for it in items:
                        it.event.set()
            if self._stop and not self._q:
                return


def _pow2(n: int) -> int:
    """Smallest power of two ≥ n (shape bucketing for the jit cache)."""
    return 1 << max(0, n - 1).bit_length()


class InferenceServer:
    """Serve a ``WorldModel`` over HTTP. ``port=0`` picks a free port
    (exposed as ``.port`` after construction).

    ``batch_window_ms > 0`` enables /imagine request coalescing (module
    docstring); ``batch_max`` caps requests per coalesced device call and
    ``batch_bucket`` pads coalesced shapes to powers of two so the jit
    cache stays small (first compile is ~20-40 s on the tunneled backend —
    unbounded shape mixes would recompile constantly)."""

    def __init__(self, world_model, host: str = "127.0.0.1", port: int = 8000,
                 state_capacity: int = 64, batch_window_ms: float = 0.0,
                 batch_max: int = 8, batch_bucket: bool = True,
                 coalesce_max_work: int = 64):
        self.wm = world_model
        self.states = _StateStore(state_capacity)
        self._bucket = batch_bucket
        # Coalescing pays only while per-request device work is SMALL
        # (measured 2026-08-20, BASELINE.md serving table: B=1 T=10
        # +20%, but B=16 T=10 imagine 8.1→3.0 req/s and B=8 T=30 observe
        # 70→42 under the window — pow2-bucket padding plus lost
        # device-queue pipelining dominate once a single request already
        # fills the chip). Requests with batch·timesteps above this
        # threshold bypass the window and run solo; 0 disables the gate.
        self._coalesce_max_work = coalesce_max_work
        self.batcher = (
            _ImagineBatcher(self._run_imagine_batch, batch_window_ms, batch_max)
            if batch_window_ms > 0 else None
        )
        # /observe coalescer: same window machinery, its own queue so a
        # burst of observes cannot starve imagines (and vice versa).
        self.observe_batcher = (
            _ImagineBatcher(self._run_observe_batch, batch_window_ms, batch_max)
            if batch_window_ms > 0 else None
        )
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
        seed = int(req.get("seed", 0))
        decode = bool(req.get("decode", False))
        if (self.observe_batcher is not None and actions.ndim == 3
                and self._small_enough_to_coalesce(actions)):
            return self.observe_batcher.submit(
                _PendingObserve(actions, audio, vision, seed, decode, raw)
            )
        return self._observe_one(actions, audio, vision, seed, decode, raw)

    def _small_enough_to_coalesce(self, actions: np.ndarray) -> bool:
        """Window gate: only requests whose own device work (batch ·
        timesteps) is below ``coalesce_max_work`` enter the coalescer —
        large requests run solo (see __init__ comment for the measured
        rationale)."""
        if self._coalesce_max_work <= 0:
            return True
        return actions.shape[0] * actions.shape[1] <= self._coalesce_max_work

    def _observe_one(self, actions, audio, vision, seed: int, decode: bool,
                     raw: bool) -> dict:
        """Uncoalesced /observe: one request, one device call (exact
        per-seed semantics)."""
        key = jax.random.PRNGKey(seed)
        decoded = None
        with self._device_lock:
            posterior, _ = self.wm.observe(actions, audio, vision, key)
            last = posterior[:, -1]
            sid = self.states.put(last)
            out = {"state_id": sid, "batch": int(actions.shape[0]),
                   "t": int(actions.shape[1])}
            if decode:
                decoded = self.wm.decode(posterior)
        if decoded is not None:
            # Host-side serialization happens OUTSIDE the device lock —
            # it is pure CPU work and must not serialize other requests.
            out["recon"] = _frames_out(decoded, raw)
        return out

    def _run_observe_batch(self, items: list) -> None:
        """Execute a coalesced /observe batch; on any coalesced-path
        failure every request re-runs alone (mirror of the /imagine
        policy)."""
        if len(items) == 1:
            it = items[0]
            try:
                it.result = self._observe_one(
                    it.actions, it.audio, it.vision, it.seed, it.decode, it.raw)
            except BaseException as e:  # noqa: BLE001 — delivered to waiter
                it.error = e
            return
        try:
            self._observe_coalesced(items)
        except BaseException:  # noqa: BLE001 — per-request fallback
            for it in items:
                it.result = it.error = None
                try:
                    it.result = self._observe_one(
                        it.actions, it.audio, it.vision, it.seed, it.decode,
                        it.raw)
                except BaseException as e:  # noqa: BLE001
                    it.error = e

    def _observe_coalesced(self, items: list) -> None:
        """One device call for N /observe requests: concat batches,
        zero-pad observation streams to the longest T (the posterior scan
        is causal, so trailing padding cannot change any prefix output —
        exact slice-back), bucket the joint shape to powers of two, fold
        every seed into one key (same RNG-semantics caveat as coalesced
        /imagine, module docstring)."""
        for it in items:
            # A stream-batch mismatch would SILENTLY overwrite a
            # neighbour's buffer slot — raise so the per-request fallback
            # isolates the malformed request instead.
            if not (it.audio.shape[:2] == it.actions.shape[:2]
                    == it.vision.shape[:2]):
                raise ValueError(
                    f"stream shape mismatch: actions {it.actions.shape[:2]}, "
                    f"audio {it.audio.shape[:2]}, vision {it.vision.shape[:2]}"
                )
        bs = [it.actions.shape[0] for it in items]
        ts = [it.actions.shape[1] for it in items]
        b_tot, t_max = sum(bs), max(ts)
        if self._bucket:
            b_tot, t_max = _pow2(b_tot), _pow2(t_max)
        streams = {}
        for name in ("actions", "audio", "vision"):
            tail = getattr(items[0], name).shape[2:]
            buf = np.zeros((b_tot, t_max, *tail), np.float32)
            off = 0
            for it in items:
                a = getattr(it, name)
                buf[off:off + a.shape[0], :a.shape[1]] = a
                off += a.shape[0]
            streams[name] = buf
        offsets = np.cumsum([0, *bs[:-1]])
        key = jax.random.PRNGKey(items[0].seed)
        for it in items[1:]:
            key = jax.random.fold_in(key, it.seed)
        host_frames = None
        with self._device_lock:
            posterior, _ = self.wm.observe(
                streams["actions"], streams["audio"], streams["vision"], key)
            for it, o, b, t in zip(items, offsets, bs, ts):
                last = posterior[int(o):int(o) + b, t - 1]
                it.result = {"state_id": self.states.put(last),
                             "batch": b, "t": t}
            if any(it.decode for it in items):
                decoded = self.wm.decode(posterior)
                host_frames = {k: np.asarray(v, np.float32)
                               for k, v in decoded.items()}
        if host_frames is not None:
            for it, o, b, t in zip(items, offsets, bs, ts):
                if it.decode:
                    it.result["recon"] = _frames_out(
                        {k: v[int(o):int(o) + b, :t]
                         for k, v in host_frames.items()},
                        it.raw,
                    )

    def _imagine(self, req: dict, raw: bool = False) -> dict:
        state = self.states.get(str(req["state_id"]))
        if state is None:
            raise UnknownStateError(str(req["state_id"]))
        actions = np.asarray(req["actions"], np.float32)
        seed = int(req.get("seed", 0))
        decode = bool(req.get("decode", True))
        if (self.batcher is not None and actions.ndim == 3
                and self._small_enough_to_coalesce(actions)):
            return self.batcher.submit(
                _PendingImagine(state, actions, seed, decode, raw)
            )
        return self._imagine_one(state, actions, seed, decode, raw)

    def _imagine_one(self, state, actions, seed: int, decode: bool,
                     raw: bool) -> dict:
        """Uncoalesced /imagine: one request, one device call (exact
        per-seed semantics)."""
        key = jax.random.PRNGKey(seed)
        decoded = None
        with self._device_lock:
            imagined = self.wm.imagine(actions, state, key)
            sid = self.states.put(imagined[:, -1])
            out = {"state_id": sid, "t": int(actions.shape[1])}
            if decode:
                decoded = self.wm.decode(imagined)
        if decoded is not None:
            out["frames"] = _frames_out(decoded, raw)
        return out

    def _run_imagine_batch(self, items: list) -> None:
        """Execute a coalesced /imagine batch (see module docstring).

        Fills each item's ``result`` or ``error``; on any coalesced-path
        failure every request re-runs alone so a malformed request cannot
        poison its neighbours."""
        if len(items) == 1:
            it = items[0]
            try:
                it.result = self._imagine_one(
                    it.state, it.actions, it.seed, it.decode, it.raw)
            except BaseException as e:  # noqa: BLE001 — delivered to waiter
                it.error = e
            return
        try:
            self._imagine_coalesced(items)
        except BaseException:  # noqa: BLE001 — per-request fallback
            for it in items:
                it.result = it.error = None
                try:
                    it.result = self._imagine_one(
                        it.state, it.actions, it.seed, it.decode, it.raw)
                except BaseException as e:  # noqa: BLE001
                    it.error = e

    def _imagine_coalesced(self, items: list) -> None:
        """One device call for N requests: concat batches, zero-pad action
        plans to the longest (scan-prefix ⇒ exact slice-back), bucket the
        joint shape to powers of two, fold every seed into one key."""
        from multimodal_mtrssm_tpu.models.state import cat_states

        bs = [it.actions.shape[0] for it in items]
        ts = [it.actions.shape[1] for it in items]
        a_dim = items[0].actions.shape[2]
        b_tot, t_max = sum(bs), max(ts)
        if self._bucket:
            b_tot, t_max = _pow2(b_tot), _pow2(t_max)
        actions = np.zeros((b_tot, t_max, a_dim), np.float32)
        off = 0
        offsets = []
        for it in items:
            offsets.append(off)
            actions[off:off + it.actions.shape[0], :it.actions.shape[1]] = it.actions
            off += it.actions.shape[0]
        state = cat_states([it.state for it in items], axis=0)
        if b_tot > off:  # bucket padding: repeat the last latent row
            state = jax.tree.map(lambda a: _pad_rows(a, b_tot - off), state)
        key = jax.random.PRNGKey(items[0].seed)
        for it in items[1:]:
            key = jax.random.fold_in(key, it.seed)
        host_frames = None
        with self._device_lock:
            imagined = self.wm.imagine(actions, state, key)
            for it, o, b, t in zip(items, offsets, bs, ts):
                last = imagined[o:o + b, t - 1]
                it.result = {"state_id": self.states.put(last), "t": t}
            if any(it.decode for it in items):
                decoded = self.wm.decode(imagined)
                host_frames = {k: np.asarray(v, np.float32)
                               for k, v in decoded.items()}
        if host_frames is not None:
            # Host-side slicing/serialization outside the device lock.
            for it, o, b, t in zip(items, offsets, bs, ts):
                if it.decode:
                    it.result["frames"] = _frames_out(
                        {k: v[o:o + b, :t] for k, v in host_frames.items()},
                        it.raw,
                    )

    # ---- lifecycle -----------------------------------------------------------
    def start(self) -> None:
        """Serve in a daemon thread (returns immediately)."""
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def stop(self) -> None:
        # shutdown() blocks on the serve loop's acknowledgement, so only
        # call it if a serve loop is actually running (start() was called —
        # tests exercise the coalescer on a never-started server).
        if self._thread is not None:
            self.httpd.shutdown()
        self.httpd.server_close()
        if self.batcher is not None:
            self.batcher.stop()
        if self.observe_batcher is not None:
            self.observe_batcher.stop()
        if self._thread is not None:
            self._thread.join(timeout=5)


def _pad_rows(a, pad: int):
    """Append ``pad`` repeats of the last row along axis 0 (device-side)."""
    import jax.numpy as jnp

    return jnp.concatenate([a, jnp.broadcast_to(a[-1:], (pad, *a.shape[1:]))])


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
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="coalesce concurrent /imagine requests arriving "
                         "within this window into one device call (0 = off; "
                         "coalesced samples are not per-seed reproducible — "
                         "module docstring)")
    ap.add_argument("--batch-max", type=int, default=8,
                    help="max requests per coalesced device call")
    args = ap.parse_args(argv)

    use_pallas = {"auto": "auto", "true": True, "false": False}[args.use_pallas]
    mesh = None
    if args.mesh:
        from multimodal_mtrssm_tpu.parallel import make_mesh

        mesh = make_mesh()
    wm = WorldModel.from_checkpoint(args.config, args.checkpoint,
                                    use_pallas=use_pallas, mesh=mesh)
    server = InferenceServer(wm, host=args.host, port=args.port,
                             batch_window_ms=args.batch_window_ms,
                             batch_max=args.batch_max)
    print(f"serving {type(wm.model).__name__} on http://{args.host}:{server.port} "
          "(/healthz /observe /imagine)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
