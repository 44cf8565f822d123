"""Serving benchmarks: WorldModel API latency + HTTP end-to-end throughput.

The reference has no serving layer (SURVEY §1), so there is no baseline to
beat — this measures OUR deployment surface (``serving.WorldModel`` and
``server.InferenceServer``) on one chip so BASELINE.md can state what a
production client actually pays per request:

- ``observe``   — filter a [B, T] observation batch into posterior latents
  (the state-estimation entry of a serving loop).
- ``imagine``   — prior-only rollout (Pallas fast path where the measured
  crossovers say so), the planning/imagination entry.
- ``imagine_frames`` — imagine + decode + full host transfer of the frames:
  what an end-user request returns.
- HTTP         — ``/observe`` then chained ``/imagine`` over JSON against a
  live ``InferenceServer``: end-to-end request latency including JSON
  (de)serialization and the device lock.

Per-call latency INCLUDES the host→device dispatch round trip (~3 ms on
this tunneled backend, CLAUDE.md) — a real client pays it, so the numbers
are honest request latencies, not device-occupancy times. Each timed call
is fenced by a host transfer of (part of) its result; ``block_until_ready``
is never trusted (BASELINE.md timing note).

Run (TPU): python benchmarks/bench_serving.py [--http-only | --api-only]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
import urllib.request
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from multimodal_mtrssm_tpu.models import (  # noqa: E402
    MMTRSSMConfig,
    MoPoEMMTRSSM,
    MoPoEMRSSM,
    MRSSMConfig,
)
from multimodal_mtrssm_tpu.serving import WorldModel  # noqa: E402

WARMUP = 30  # backend does background work after first execution (CLAUDE.md)
CALLS = 50


def _fence(out) -> None:
    """Host-transfer fence on one small slice of a latent-state pytree."""
    jax.device_get(jax.tree_util.tree_leaves(out)[0][0, -1])


def _time_calls(fn, warmup: int = WARMUP, calls: int = CALLS) -> dict:
    """Median/p95 wall ms per call; ``fn`` must end in a host transfer."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {
        "p50_ms": round(statistics.median(times), 3),
        "p95_ms": round(times[int(0.95 * (len(times) - 1))], 3),
        "mean_ms": round(statistics.fmean(times), 3),
    }


def _request(B: int, T: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return (
        jax.numpy.asarray(rng.normal(size=(B, T, 6)).astype(np.float32)),
        jax.numpy.asarray(rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)),
        jax.numpy.asarray(rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)),
    )


def bench_api(results: dict) -> None:
    for name, model in (
        ("mrssm", MoPoEMRSSM(MRSSMConfig())),
        ("mmtrssm", MoPoEMMTRSSM(MMTRSSMConfig())),
    ):
        wm = WorldModel(model, model.init(jax.random.PRNGKey(0)))
        key = jax.random.PRNGKey(1)

        # observe: the training-shaped filter request.
        acts, audio, vision = _request(8, 30)

        def observe():
            posterior, _ = wm.observe(acts, audio, vision, key)
            _fence(posterior)

        results[f"{name}/observe_B8_T30"] = _time_calls(observe)

        # Final posterior latent = the continuation handle a server stores.
        posterior, _ = wm.observe(acts, audio, vision, key)
        last = posterior[:, -1]

        for B, T, tag in ((1, 10, "B1_T10"), (60, 10, "B60_T10"), (256, 180, "B256_T180")):
            state = jax.tree.map(
                lambda a: jax.numpy.broadcast_to(a[:1], (B, *a.shape[1:])), last
            )
            plan = jax.numpy.zeros((B, T, 6), np.float32)

            def imagine():
                _fence(wm.imagine(plan, state, key))

            results[f"{name}/imagine_{tag}"] = _time_calls(imagine)

        # The full user-facing request: imagine + decode + frame download.
        state1 = jax.tree.map(lambda a: a[:1], last)
        plan1 = jax.numpy.zeros((1, 10, 6), np.float32)

        def imagine_frames():
            frames = wm.imagine_frames(plan1, state1, key)
            jax.device_get(frames["recon/vision"])

        results[f"{name}/imagine_frames_B1_T10"] = _time_calls(imagine_frames)


def bench_http(results: dict) -> None:
    from multimodal_mtrssm_tpu.server import InferenceServer

    model = MoPoEMRSSM(MRSSMConfig())
    wm = WorldModel(model, model.init(jax.random.PRNGKey(0)))
    srv = InferenceServer(wm, port=0)
    srv.start()
    try:
        rng = np.random.default_rng(0)
        B, T = 1, 10
        obs_payload = json.dumps({
            "actions": rng.normal(size=(B, T, 6)).tolist(),
            "audio": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
            "vision": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
            "seed": 1,
        }).encode()

        def post(route: str, data: bytes) -> dict:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{route}", data=data,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        state_id = post("/observe", obs_payload)["state_id"]
        img_payload = json.dumps({
            "state_id": state_id,
            "actions": np.zeros((B, T, 6)).tolist(),
            "seed": 2,
            "decode": True,
        }).encode()

        results["http/observe_B1_T10"] = _time_calls(
            lambda: post("/observe", obs_payload), warmup=10, calls=30
        )
        results["http/imagine_decode_B1_T10"] = _time_calls(
            lambda: post("/imagine", img_payload), warmup=10, calls=30
        )
        # Sustained throughput: chained imagine requests back-to-back.
        n, t0 = 30, time.perf_counter()
        for _ in range(n):
            post("/imagine", img_payload)
        results["http/imagine_req_per_s"] = round(n / (time.perf_counter() - t0), 1)

        # Binary npz framing: same requests without the JSON tax.
        import io

        def to_npz(arrays: dict) -> bytes:
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            return buf.getvalue()

        def post_npz(route: str, data: bytes) -> dict:
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{route}", data=data,
                headers={"Content-Type": "application/x-npz"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                with np.load(io.BytesIO(r.read()), allow_pickle=False) as z:
                    return {k: (v.item() if v.ndim == 0 else 0) for k, v in z.items()}

        obs_npz = to_npz({
            "actions": rng.normal(size=(B, T, 6)).astype(np.float32),
            "audio": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32),
            "vision": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32),
            "seed": 1,
        })
        sid = post_npz("/observe", obs_npz)["state_id"]
        img_npz = to_npz({
            "state_id": sid, "actions": np.zeros((B, T, 6), np.float32),
            "seed": 2, "decode": True,
        })
        results["http/observe_npz_B1_T10"] = _time_calls(
            lambda: post_npz("/observe", obs_npz), warmup=10, calls=30
        )
        results["http/imagine_decode_npz_B1_T10"] = _time_calls(
            lambda: post_npz("/imagine", img_npz), warmup=10, calls=30
        )
        n, t0 = 30, time.perf_counter()
        for _ in range(n):
            post_npz("/imagine", img_npz)
        results["http/imagine_npz_req_per_s"] = round(n / (time.perf_counter() - t0), 1)
    finally:
        srv.stop()


def bench_http_concurrent(results: dict, clients: int = 8,
                          rounds: int = 20, imagine_b: int = 1,
                          imagine_t: int = 10, observe_load: bool = False,
                          observe_b: int = 8, observe_t: int = 30) -> None:
    """A/B: sustained /imagine+decode (and optionally /observe+filter)
    throughput under CONCURRENT clients, with and without request
    coalescing (``batch_window_ms``).

    ``clients`` threads post one npz request each per round, synchronized
    by a barrier (so the coalescer sees a full burst — the best case the
    window is designed for; real mixed traffic lands between the two
    columns). Without coalescing every request pays its own ~2×RTT device
    round trips serialized on the device lock; with it a round is ONE
    batched device call. Note the coalesced path buckets T (e.g. 10→16),
    so its device call does MORE timesteps per frame — the win reported
    here is net of that bucketing tax.

    ``imagine_b``/``imagine_t`` scale the per-request /imagine device work
    (VERDICT r4 item 8: the B=1 T=10 point is RTT-dominated; B=16 shows
    where coalescing pays). ``observe_load=True`` additionally benches a
    concurrent /observe burst at (observe_b, observe_t) — the
    training-shaped filter request through the new /observe coalescer.
    """
    import io
    import threading

    from multimodal_mtrssm_tpu.server import InferenceServer

    model = MoPoEMRSSM(MRSSMConfig())
    wm = WorldModel(model, model.init(jax.random.PRNGKey(0)))
    B, T = imagine_b, imagine_t
    rng = np.random.default_rng(0)

    def to_npz(arrays: dict) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue()

    obs_npz = to_npz({
        "actions": rng.normal(size=(B, T, 6)).astype(np.float32),
        "audio": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32),
        "vision": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32),
        "seed": 1,
    })
    obs_load_npz = to_npz({
        "actions": rng.normal(size=(observe_b, observe_t, 6)).astype(np.float32),
        "audio": rng.uniform(-1, 1, size=(observe_b, observe_t, 32, 32, 1)).astype(np.float32),
        "vision": rng.uniform(-1, 1, size=(observe_b, observe_t, 32, 32, 1)).astype(np.float32),
        "seed": 2,
    })
    shape_tag = f"imB{B}T{T}"

    for tag, window in (("window0", 0.0), ("window8ms", 8.0)):
        srv = InferenceServer(wm, port=0, batch_window_ms=window,
                              batch_max=clients)
        srv.start()
        try:
            def post_npz(route: str, data: bytes) -> bytes:
                # 600 s: the FIRST imagine+decode compile through the
                # tunnel has been measured at 246 s — a shorter client
                # timeout turns warmup into a cascade of broken pipes.
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}{route}", data=data,
                    headers={"Content-Type": "application/x-npz"},
                )
                with urllib.request.urlopen(req, timeout=600) as r:
                    return r.read()

            with np.load(io.BytesIO(post_npz("/observe", obs_npz)),
                         allow_pickle=False) as z:
                sid = z["state_id"].item()
            img_npz = to_npz({
                "state_id": sid, "actions": np.zeros((B, T, 6), np.float32),
                "seed": 2, "decode": True,
            })
            # Absorb the solo-shape compile before any concurrency.
            post_npz("/imagine", img_npz)

            barrier = threading.Barrier(clients)
            warm = 5  # compile the (bucketed) coalesced batch shapes
            t_start = [0.0]

            def worker(i: int) -> None:
                for r in range(warm + rounds):
                    barrier.wait()
                    if r == warm and i == 0:
                        t_start[0] = time.perf_counter()
                    post_npz("/imagine", img_npz)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(clients)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            total = time.perf_counter() - t_start[0]
            results[f"http/concurrent{clients}_{shape_tag}_{tag}_req_per_s"] = round(
                clients * rounds / total, 1
            )
            if srv.batcher is not None:
                sizes = srv.batcher.batch_sizes
                results[f"http/concurrent{clients}_{shape_tag}_{tag}_batch_p50"] = (
                    float(np.median(sizes)) if sizes else 0.0
                )

            if observe_load:
                # Concurrent /observe burst (training-shaped filter):
                post_npz("/observe", obs_load_npz)  # absorb the compile
                barrier2 = threading.Barrier(clients)
                t2 = [0.0]

                def oworker(i: int) -> None:
                    for r in range(warm + rounds):
                        barrier2.wait()
                        if r == warm and i == 0:
                            t2[0] = time.perf_counter()
                        post_npz("/observe", obs_load_npz)

                oths = [threading.Thread(target=oworker, args=(i,))
                        for i in range(clients)]
                for th in oths:
                    th.start()
                for th in oths:
                    th.join()
                ototal = time.perf_counter() - t2[0]
                results[f"http/concurrent{clients}_obsB{observe_b}T{observe_t}_{tag}_req_per_s"] = round(
                    clients * rounds / ototal, 1
                )
                if srv.observe_batcher is not None:
                    sizes = srv.observe_batcher.batch_sizes
                    results[f"http/concurrent{clients}_obsB{observe_b}T{observe_t}_{tag}_batch_p50"] = (
                        float(np.median(sizes)) if sizes else 0.0
                    )
        finally:
            srv.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--api-only", action="store_true")
    ap.add_argument("--http-only", action="store_true")
    ap.add_argument("--concurrent-only", action="store_true")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--imagine-b", type=int, default=1)
    ap.add_argument("--imagine-t", type=int, default=10)
    ap.add_argument("--observe-load", action="store_true",
                    help="also bench a concurrent B=8 T=30 /observe burst")
    args = ap.parse_args()
    results: dict = {"platform": jax.devices()[0].platform}
    if args.concurrent_only:
        bench_http_concurrent(results, clients=args.clients,
                              imagine_b=args.imagine_b,
                              imagine_t=args.imagine_t,
                              observe_load=args.observe_load)
        print(json.dumps(results, indent=2))
        return
    if not args.http_only:
        bench_api(results)
    if not args.api_only:
        bench_http(results)
    bench_http_concurrent(results, clients=args.clients)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
