"""Tests: the driver entry points must be self-sufficient.

Round 1's ``MULTICHIP_r01.json`` recorded rc=1 because ``dryrun_multichip``
assumed the caller pre-forced the CPU platform; in the driver environment it
claimed the TPU backend and crashed (VERDICT.md round 1, item 1). These tests
invoke the entry point from a *clean* environment (no ``XLA_FLAGS``, no
``JAX_PLATFORMS``) in a fresh interpreter — exactly what the driver does.
"""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("_GRAFT_MULTICHIP_SUBPROCESS", None)
    # The dry run must never touch the real TPU chip from a test.
    env["JAX_PLATFORMS"] = ""
    env.pop("JAX_PLATFORMS")
    return env


def test_dryrun_multichip_clean_env():
    """Driver simulation: fresh interpreter, no platform/device-count env."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=_clean_env(), cwd=REPO_ROOT, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_dryrun_multichip_backend_already_claimed():
    """If another platform already claimed the backend, the dry run must
    recover via its subprocess fallback rather than crash."""
    code = (
        "import jax\n"
        # Pin the pre-claimed backend to single-device CPU so this test does
        # not depend on (or wedge) the real TPU tunnel.
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "devs = jax.devices()\n"
        "assert len(devs) == 1, devs\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(), cwd=REPO_ROOT, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_bench_watchdog_emits_json_and_exits():
    """If the TPU claim hangs (known wedged-chip failure mode), bench.py's
    watchdog must still print exactly one JSON line (with an "error" field)
    and exit nonzero instead of hanging silently."""
    import json

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import time\n"
        "import bench\n"
        "bench.WATCHDOG_S = 0.5\n"
        "bench._start_watchdog()\n"
        "time.sleep(60)\n"
        "print('NOT_REACHED')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(), cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=180,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "NOT_REACHED" not in proc.stdout
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(json_lines) == 1, proc.stdout
    d = json.loads(json_lines[0])
    assert d["metric"] == "mopoe_mrssm_train_seq_per_s" and "error" in d


def test_bench_fast_failure_emits_error_json():
    """A fast failure (tunnel refused, libtpu mismatch) must ALSO print the
    one JSON line — the watchdog only covers hangs. Uses bench.py's
    _BENCH_FAIL_FAST injection hook."""
    import json

    env = _clean_env()
    env["_BENCH_FAIL_FAST"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(json_lines) == 1, proc.stdout
    d = json.loads(json_lines[0])
    assert d["metric"] == "mopoe_mrssm_train_seq_per_s"
    assert d["value"] == 0.0 and "injected failure" in d["error"]
    # A deterministic failure must NOT be retried: exactly one child attempt.
    assert proc.stderr.count("bench attempt") == 1, proc.stderr


def test_bench_retries_transient_failures():
    """A transient tunnel/claim-shaped failure (error mentions UNAVAILABLE /
    claim / timeout) must be retried up to 3 bounded attempts with backoff —
    round-3 lesson: a single transient claim failure recorded 0.0 for the
    whole round — while still emitting exactly ONE JSON line at the end."""
    import json

    env = _clean_env()
    env["_BENCH_FAIL_TRANSIENT"] = "1"
    env["_BENCH_RETRY_BACKOFF_S"] = "0.1"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bench.py"], env=env, cwd=REPO_ROOT,
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")]
    assert len(json_lines) == 1, proc.stdout
    d = json.loads(json_lines[0])
    assert d["metric"] == "mopoe_mrssm_train_seq_per_s" and d["value"] == 0.0
    assert "UNAVAILABLE" in d["error"]
    # All 3 attempts ran.
    assert proc.stderr.count("bench attempt") == 3, proc.stderr
