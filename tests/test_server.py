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
