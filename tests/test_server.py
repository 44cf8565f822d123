"""Tests: HTTP inference server (observe → imagine → decode over JSON)."""

import json
import urllib.request
from urllib.error import HTTPError

import jax
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
from multimodal_mtrssm_tpu.server import InferenceServer
from multimodal_mtrssm_tpu.serving import WorldModel


@pytest.fixture(scope="module")
def server():
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    wm = WorldModel(model, model.init(jax.random.PRNGKey(0)), use_pallas=False)
    srv = InferenceServer(wm, port=0)
    srv.start()
    yield srv
    srv.stop()


def _post(server, route, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{route}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["model"] == "MoPoEMRSSM" and h["n_params"] > 0


def test_observe_then_chained_imagine(server):
    B, T = 2, 3
    rng = np.random.default_rng(0)
    obs = {
        "actions": rng.normal(size=(B, T, 6)).tolist(),
        "audio": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
        "vision": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
        "seed": 1,
        "decode": True,
    }
    out = _post(server, "/observe", obs)
    assert out["batch"] == B and out["t"] == T
    recon = np.asarray(out["recon"]["recon/vision"])
    assert recon.shape == (B, T, 32, 32, 1)

    # imagine from the stored posterior latent, then CHAIN from the new id
    im = _post(server, "/imagine", {
        "state_id": out["state_id"],
        "actions": rng.normal(size=(B, 4, 6)).tolist(),
        "seed": 2,
    })
    frames = np.asarray(im["frames"]["recon/audio"])
    assert frames.shape == (B, 4, 32, 32, 1)
    im2 = _post(server, "/imagine", {
        "state_id": im["state_id"],
        "actions": rng.normal(size=(B, 2, 6)).tolist(),
        "decode": False,
    })
    assert "frames" not in im2 and im2["state_id"] != im["state_id"]


def test_unknown_state_and_route(server):
    with pytest.raises(HTTPError) as e:
        _post(server, "/imagine", {"state_id": "nope", "actions": [[[0.0] * 6]]})
    assert e.value.code == 404
    with pytest.raises(HTTPError) as e:
        _post(server, "/nonsense", {})
    assert e.value.code == 404


def test_missing_fields_are_400_not_404(server):
    """Schema errors (missing request fields) map to 400 with a clear
    message; 404 is reserved for unknown state_id / route."""
    for route, payload in (("/observe", {}), ("/imagine", {"actions": [[[0.0] * 6]]})):
        with pytest.raises(HTTPError) as e:
            _post(server, route, payload)
        assert e.value.code == 400
        body = json.loads(e.value.read())
        assert "missing field" in body["error"]


def _post_npz(server, route, arrays: dict) -> dict:
    """POST np.savez-framed request; parse the npz response."""
    import io

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{route}",
        data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.headers["Content-Type"] == "application/x-npz"
        with np.load(io.BytesIO(r.read()), allow_pickle=False) as z:
            return {k: (v.item() if v.ndim == 0 else np.asarray(v)) for k, v in z.items()}


def test_npz_binary_framing_matches_json(server):
    """npz-framed observe→imagine round trip; frames bit-equal to the JSON
    path for the same stored state and seed."""
    B, T = 2, 3
    rng = np.random.default_rng(7)
    actions = rng.normal(size=(B, T, 6)).astype(np.float32)
    audio = rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)
    vision = rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)

    out = _post_npz(server, "/observe", {
        "actions": actions, "audio": audio, "vision": vision, "seed": 3,
    })
    assert out["batch"] == B and out["t"] == T and isinstance(out["state_id"], str)

    plan = rng.normal(size=(B, 4, 6)).astype(np.float32)
    im_bin = _post_npz(server, "/imagine", {
        "state_id": out["state_id"], "actions": plan, "seed": 5,
    })
    frames_bin = im_bin["frames/recon/vision"]
    assert frames_bin.shape == (B, 4, 32, 32, 1)

    # Same state, same seed through the JSON path → identical frames.
    im_json = _post(server, "/imagine", {
        "state_id": out["state_id"], "actions": plan.tolist(), "seed": 5,
    })
    np.testing.assert_array_equal(
        frames_bin, np.asarray(im_json["frames"]["recon/vision"], np.float32)
    )


class _ArithmeticWM:
    """Deterministic fake world model for coalescing-exactness tests.

    ``imagine``: latent[b] + cumsum_t(sum_a(actions)) — the key is ignored,
    so a coalesced request MUST reproduce its solo result bit-exactly, and
    zero-padded action tails cannot leak into the prefix (cumsum prefix
    property, same as the real ``lax.scan`` rollout). ``decode``: ×2.
    """

    params = {}

    def imagine(self, actions, state, key):
        import jax.numpy as jnp

        a = jnp.cumsum(jnp.sum(jnp.asarray(actions), axis=-1), axis=1)
        return jnp.asarray(state)[:, None] + a[..., None]

    def decode(self, state):
        return {"recon/x": np.asarray(state) * 2.0}

    def observe(self, actions, audio, vision, key):
        """Causal deterministic filter: posterior[b, t] = cumsum_t of the
        per-step drive (actions + both observation streams) — key ignored,
        trailing zero padding cannot change any prefix (cumsum property,
        same as the real posterior ``lax.scan``)."""
        import jax.numpy as jnp

        drive = (jnp.sum(jnp.asarray(actions), axis=-1)
                 + jnp.sum(jnp.asarray(audio), axis=(-3, -2, -1))
                 + jnp.sum(jnp.asarray(vision), axis=(-3, -2, -1)))
        post = jnp.cumsum(drive, axis=1)[..., None] * jnp.ones((4,))
        return post, None


def _pending(state, actions, seed=0, decode=True, raw=True):
    from multimodal_mtrssm_tpu.server import _PendingImagine

    return _PendingImagine(state, np.asarray(actions, np.float32), seed,
                           decode, raw)


@pytest.fixture()
def arith_server():
    srv = InferenceServer(_ArithmeticWM(), port=0, batch_window_ms=50.0)
    yield srv
    srv.stop()


def test_coalesced_imagine_exact_pad_slice(arith_server):
    """Coalesced heterogeneous requests (different B and T, pow2 bucket
    padding engaged) slice back bit-exactly to their solo results."""
    srv = arith_server
    rng = np.random.default_rng(0)
    specs = [(2, 3), (1, 5), (3, 2)]  # (B, T) per request — ΣB=6→pad 8, Tmax 5→8
    items = []
    for i, (b, t) in enumerate(specs):
        state = rng.normal(size=(b, 4)).astype(np.float32)
        items.append(_pending(state, rng.normal(size=(b, t, 6)), seed=i))
    srv._run_imagine_batch(items)
    for it, (b, t) in zip(items, specs):
        assert it.error is None
        expect = np.asarray(it.state)[:, None] + np.cumsum(
            it.actions.sum(-1), axis=1)[..., None]
        got = np.asarray(it.result["frames"]["recon/x"])
        assert got.shape == (b, t, 4)
        np.testing.assert_allclose(got, 2.0 * expect, rtol=1e-6)
        # Continuation latent stored at THIS request's final step (t-1).
        cont = np.asarray(srv.states.get(it.result["state_id"]))
        np.testing.assert_allclose(cont, expect[:, -1], rtol=1e-6)
        assert it.result["t"] == t


def test_coalesced_batch_failure_falls_back_per_request(arith_server):
    """One malformed request (state batch ≠ actions batch) must not poison
    the coalesced batch: good requests still succeed, the bad one errors."""
    srv = arith_server
    rng = np.random.default_rng(1)
    good1 = _pending(rng.normal(size=(2, 4)).astype(np.float32),
                     rng.normal(size=(2, 3, 6)))
    bad = _pending(rng.normal(size=(2, 4)).astype(np.float32),
                   rng.normal(size=(3, 3, 6)))  # 3 action rows, 2 latents
    good2 = _pending(rng.normal(size=(1, 4)).astype(np.float32),
                     rng.normal(size=(1, 2, 6)))
    srv._run_imagine_batch([good1, bad, good2])
    for it in (good1, good2):
        assert it.error is None and it.result is not None
        expect = np.asarray(it.state)[:, None] + np.cumsum(
            it.actions.sum(-1), axis=1)[..., None]
        np.testing.assert_allclose(
            np.asarray(it.result["frames"]["recon/x"]), 2.0 * expect, rtol=1e-6)
    assert bad.error is not None


def _pending_obs(b, t, rng, seed=0, decode=True, hw=2):
    from multimodal_mtrssm_tpu.server import _PendingObserve

    return _PendingObserve(
        rng.normal(size=(b, t, 6)).astype(np.float32),
        rng.normal(size=(b, t, hw, hw, 1)).astype(np.float32),
        rng.normal(size=(b, t, hw, hw, 1)).astype(np.float32),
        seed, decode, True,
    )


def _expected_posterior(it):
    drive = (it.actions.sum(-1) + it.audio.sum((-3, -2, -1))
             + it.vision.sum((-3, -2, -1)))
    return np.cumsum(drive, axis=1)[..., None] * np.ones((4,), np.float32)


def test_coalesced_observe_exact_pad_slice(arith_server):
    """Coalesced heterogeneous /observe requests (different B and T, pow2
    bucketing engaged) slice back bit-exactly: trailing zero-padded
    observation frames cannot leak into any prefix output."""
    srv = arith_server
    rng = np.random.default_rng(5)
    specs = [(2, 3), (1, 5), (3, 2)]
    items = [_pending_obs(b, t, rng, seed=i) for i, (b, t) in enumerate(specs)]
    srv._run_observe_batch(items)
    for it, (b, t) in zip(items, specs):
        assert it.error is None
        expect = _expected_posterior(it)
        got = np.asarray(it.result["recon"]["recon/x"])
        assert got.shape == (b, t, 4)
        np.testing.assert_allclose(got, 2.0 * expect, rtol=1e-5)
        cont = np.asarray(srv.states.get(it.result["state_id"]))
        np.testing.assert_allclose(cont, expect[:, -1], rtol=1e-5)
        assert it.result["t"] == t and it.result["batch"] == b


def test_coalesced_observe_failure_falls_back(arith_server):
    """A malformed /observe (stream batch mismatch) must not poison the
    coalesced batch."""
    srv = arith_server
    rng = np.random.default_rng(6)
    good1 = _pending_obs(2, 3, rng, seed=1)
    bad = _pending_obs(2, 3, rng, seed=2)
    bad.audio = rng.normal(size=(3, 3, 2, 2, 1)).astype(np.float32)  # B=3 vs 2
    good2 = _pending_obs(1, 2, rng, seed=3)
    srv._run_observe_batch([good1, bad, good2])
    for it in (good1, good2):
        assert it.error is None and it.result is not None
        np.testing.assert_allclose(
            np.asarray(it.result["recon"]["recon/x"]),
            2.0 * _expected_posterior(it), rtol=1e-5)
    assert bad.error is not None


@pytest.fixture(scope="module")
def server_batched():
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
                        paddings=(1, 1), num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                   init_proj_cells=16))
    wm = WorldModel(model, model.init(jax.random.PRNGKey(0)), use_pallas=False)
    srv = InferenceServer(wm, port=0, batch_window_ms=200.0, batch_max=8)
    srv.start()
    yield srv
    srv.stop()


def test_http_concurrent_imagine_coalesces(server_batched):
    """Concurrent /imagine requests with different horizons coalesce into
    one device call; each response keeps its own shape, chains, and the
    decode=False request stays frame-free."""
    import threading

    srv = server_batched
    B, T = 2, 3
    rng = np.random.default_rng(3)
    out = _post(srv, "/observe", {
        "actions": rng.normal(size=(B, T, 6)).tolist(),
        "audio": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
        "vision": rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).tolist(),
        "seed": 1,
    })
    sid = out["state_id"]
    # Warm the jit cache for the coalesced shape class first (one solo call)
    # so the concurrent burst is not serialized behind 3 distinct compiles.
    _post(srv, "/imagine", {"state_id": sid,
                            "actions": rng.normal(size=(B, 2, 6)).tolist()})

    plans = [(2, True), (4, True), (3, False)]
    results: list = [None] * len(plans)
    barrier = threading.Barrier(len(plans))

    def worker(i: int, t: int, decode: bool) -> None:
        barrier.wait()
        results[i] = _post(srv, "/imagine", {
            "state_id": sid, "seed": 10 + i, "decode": decode,
            "actions": rng.normal(size=(B, t, 6)).tolist(),
        })

    threads = [threading.Thread(target=worker, args=(i, t, d))
               for i, (t, d) in enumerate(plans)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    ids = set()
    for (t, decode), res in zip(plans, results):
        assert res is not None and res["t"] == t
        ids.add(res["state_id"])
        if decode:
            frames = np.asarray(res["frames"]["recon/vision"])
            assert frames.shape == (B, t, 32, 32, 1)
        else:
            assert "frames" not in res
    assert len(ids) == len(plans)
    assert max(srv.batcher.batch_sizes) >= 2  # coalescing actually happened
    # Chaining from a coalesced continuation latent works.
    im2 = _post(srv, "/imagine", {"state_id": results[0]["state_id"],
                                  "actions": rng.normal(size=(B, 2, 6)).tolist()})
    assert im2["t"] == 2


def test_http_concurrent_observe_coalesces(server_batched):
    """Concurrent /observe requests coalesce into one device call; each
    response keeps its own (batch, t), states chain into /imagine."""
    import threading

    srv = server_batched
    rng = np.random.default_rng(7)

    def obs_payload(b, t, seed):
        return {
            "actions": rng.normal(size=(b, t, 6)).tolist(),
            "audio": rng.uniform(-1, 1, size=(b, t, 32, 32, 1)).tolist(),
            "vision": rng.uniform(-1, 1, size=(b, t, 32, 32, 1)).tolist(),
            "seed": seed, "decode": False,
        }

    # Warm the coalesced shape class (solo call through the batcher).
    _post(srv, "/observe", obs_payload(2, 3, 0))
    before = len(srv.observe_batcher.batch_sizes)

    plans = [(2, 2), (1, 4), (2, 3)]
    results: list = [None] * len(plans)
    barrier = threading.Barrier(len(plans))

    def worker(i: int, b: int, t: int) -> None:
        barrier.wait()
        results[i] = _post(srv, "/observe", obs_payload(b, t, 10 + i))

    threads = [threading.Thread(target=worker, args=(i, b, t))
               for i, (b, t) in enumerate(plans)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    ids = set()
    for (b, t), res in zip(plans, results):
        assert res is not None and res["t"] == t and res["batch"] == b
        ids.add(res["state_id"])
    assert len(ids) == len(plans)
    assert max(srv.observe_batcher.batch_sizes[before:]) >= 2
    # A coalesced-observe state chains into /imagine.
    im = _post(srv, "/imagine", {"state_id": results[0]["state_id"],
                                 "actions": rng.normal(size=(2, 2, 6)).tolist()})
    assert im["t"] == 2


def test_npz_bad_body_and_unknown_state(server):
    """Binary framing keeps the JSON error contract: errors arrive as JSON.

    Covers all three malformed-body classes: pickle-fallback ValueError,
    zip-magic-prefixed garbage (BadZipFile — a truncated upload), and an
    empty body (EOFError)."""
    for bad in (b"not an npz archive", b"PK\x03\x04garbage-after-zip-magic", b""):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/observe",
            data=bad,
            headers={"Content-Type": "application/x-npz"},
        )
        with pytest.raises(HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400, bad
        assert "bad request body" in json.loads(e.value.read())["error"]

    with pytest.raises(HTTPError) as e:
        _post_npz(server, "/imagine", {
            "state_id": "nope", "actions": np.zeros((1, 1, 6), np.float32),
        })
    assert e.value.code == 404


def test_coalesce_work_gate_routes_large_requests_solo():
    """Requests whose own batch*T exceeds coalesce_max_work bypass the
    window (measured rationale in server.__init__); small ones coalesce."""
    srv = InferenceServer(_ArithmeticWM(), port=0, batch_window_ms=50.0,
                          coalesce_max_work=16)
    try:
        rng = np.random.default_rng(9)
        small = rng.normal(size=(2, 3, 6)).astype(np.float32)   # work 6
        large = rng.normal(size=(4, 8, 6)).astype(np.float32)   # work 32
        assert srv._small_enough_to_coalesce(small)
        assert not srv._small_enough_to_coalesce(large)
        # The large request must still succeed (solo path).
        state = rng.normal(size=(4, 4)).astype(np.float32)
        sid = srv.states.put(state)
        before = len(srv.batcher.batch_sizes)
        out = srv._imagine({"state_id": sid, "actions": large.tolist(),
                            "decode": False})
        assert out["t"] == 8
        assert len(srv.batcher.batch_sizes) == before  # no coalescer entry
        # gate disabled -> everything coalesces
        srv2 = InferenceServer(_ArithmeticWM(), port=0, batch_window_ms=50.0,
                               coalesce_max_work=0)
        try:
            assert srv2._small_enough_to_coalesce(large)
        finally:
            srv2.stop()
    finally:
        srv.stop()
