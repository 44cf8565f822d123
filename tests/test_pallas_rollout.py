"""Tests: fused Pallas imagination rollout vs the XLA path.

Runs in Pallas interpret mode on CPU (the TPU compile path is exercised by
bench_pallas.py on hardware). RNG streams differ between the kernel's core
PRNG and jax.random, so correctness is checked by replaying the kernel's
own sampled stochs through pure-numpy reference math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig


def _np_reference_rollout(packed, actions, init_deter, init_stoch, stochs):
    """Numpy replay of the transition math using the kernel's sampled stochs."""
    (w1, b1, w2, b2, wih, bih, whh, bhh, wp1, bp1, wp2, bp2) = [np.asarray(x) for x in packed]
    D = whh.shape[0]
    elu = lambda v: np.where(v > 0, v, np.expm1(v))  # noqa: E731
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
    deter, stoch = np.asarray(init_deter), np.asarray(init_stoch)
    deters, logits_all = [], []
    for t in range(actions.shape[1]):
        x = np.concatenate([actions[:, t], stoch], axis=-1)
        h = elu(x @ w1 + b1)
        x2 = h @ w2 + b2
        gi = x2 @ wih + bih
        gh = deter @ whh + bhh
        r = sig(gi[:, :D] + gh[:, :D])
        z = sig(gi[:, D:2*D] + gh[:, D:2*D])
        n = np.tanh(gi[:, 2*D:] + r * gh[:, 2*D:])
        deter = (1 - z) * n + z * deter
        p1 = elu(deter @ wp1 + bp1)
        logits = p1 @ wp2 + bp2
        deters.append(deter.copy())
        logits_all.append(logits.copy())
        stoch = np.asarray(stochs[:, t])  # replay the kernel's sample
    return np.stack(deters, 1), np.stack(logits_all, 1)


@pytest.fixture(scope="module")
def setup():
    from multimodal_mtrssm_tpu.ops.pallas.rollout import pack_params

    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_params(params)
    B, T = 4, 6
    actions = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, T, 6)))
    init_deter = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, 32)))
    idx = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (B, 4), 0, 4))
    init_stoch = np.eye(4, dtype=np.float32)[idx].reshape(B, 16)
    return model, params, packed, actions, init_deter, init_stoch


def _run_kernel_interpret(packed, actions, init_deter, init_stoch, seed=7):
    """Invoke the public entry point in TPU interpret mode on CPU."""
    from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition

    deters, logits, stochs = fused_rollout_transition(
        packed,
        jnp.asarray(actions, jnp.float32),
        jnp.asarray(init_deter, jnp.float32),
        jnp.asarray(init_stoch, jnp.float32),
        jnp.int32(seed),
        interpret=True,
    )
    return np.asarray(deters), np.asarray(logits), np.asarray(stochs)


def test_kernel_matches_reference_math(setup):
    model, params, packed, actions, init_deter, init_stoch = setup
    deters, logits, stochs = _run_kernel_interpret(packed, actions, init_deter, init_stoch)
    # Samples are valid one-hot blocks.
    s = stochs.reshape(*stochs.shape[:-1], 4, 4)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-6)
    assert set(np.unique(stochs)) <= {0.0, 1.0}
    # Deterministic math replayed with the kernel's stochs must match.
    ref_deters, ref_logits = _np_reference_rollout(packed, actions, init_deter, init_stoch, stochs)
    np.testing.assert_allclose(deters, ref_deters, atol=2e-5)
    np.testing.assert_allclose(logits, ref_logits, atol=2e-5)


def test_kernel_matches_xla_rollout_deterministic_path(setup):
    """Feed the kernel's stochs into the XLA scan path: deters must agree."""
    model, params, packed, actions, init_deter, init_stoch = setup
    deters, _, stochs = _run_kernel_interpret(packed, actions, init_deter, init_stoch)

    # XLA path with the same replayed stoch sequence.
    def step(carry, xs):
        deter, stoch = carry
        action_t, stoch_next = xs
        d, logits = model._transition_core(params, action_t, stoch, deter)
        return (d, stoch_next), d

    xs = (jnp.swapaxes(jnp.asarray(actions, jnp.float32), 0, 1), jnp.swapaxes(jnp.asarray(stochs), 0, 1))
    _, ds = jax.lax.scan(step, (jnp.asarray(init_deter, jnp.float32), jnp.asarray(init_stoch)), xs)
    np.testing.assert_allclose(np.swapaxes(np.asarray(ds), 0, 1), deters, atol=2e-5)


def test_chunked_grid_carries_state(setup):
    """chunk < T (ragged tail) must produce the same deterministic math."""
    from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition

    model, params, packed, actions, init_deter, init_stoch = setup
    out = fused_rollout_transition(
        packed, jnp.asarray(actions, jnp.float32), jnp.asarray(init_deter, jnp.float32),
        jnp.asarray(init_stoch, jnp.float32), jnp.int32(7), interpret=True, chunk=4,
    )  # T=6 → chunks of 4 + ragged 2
    deters, logits, stochs = (np.asarray(x) for x in out)
    ref_deters, ref_logits = _np_reference_rollout(packed, actions, init_deter, init_stoch, stochs)
    np.testing.assert_allclose(deters, ref_deters, atol=2e-5)
    np.testing.assert_allclose(logits, ref_logits, atol=2e-5)


def test_kernel_race_free(setup):
    """Run the kernel under the interpreter's race detector (the TPU build's
    sanitizer story, SURVEY §5.2 — the reference has none)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from multimodal_mtrssm_tpu.ops.pallas import rollout as R

    model, params, packed, actions, init_deter, init_stoch = setup
    B, T, A = actions.shape
    D, S = init_deter.shape[-1], init_stoch.shape[-1]
    chunk = 3  # force multiple sequential grid steps sharing scratch
    n_chunks = -(-T // chunk)
    kernel = functools.partial(R._rollout_kernel, chunk=chunk, class_size=4, category_size=4)
    block = lambda d: pl.BlockSpec((chunk, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=(
            jax.ShapeDtypeStruct((n_chunks * chunk, B, D), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * chunk, B, S), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * chunk, B, S), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), block(A)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(14)],
        out_specs=(block(D), block(S), block(S)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32), pltpu.VMEM((B, S), jnp.float32)],
        interpret=pltpu.InterpretParams(detect_races=True),
    )(
        jnp.asarray([7], jnp.int32),
        jnp.pad(jnp.swapaxes(jnp.asarray(actions, jnp.float32), 0, 1),
                ((0, n_chunks * chunk - T), (0, 0), (0, 0))),
        jnp.asarray(init_deter, jnp.float32),
        jnp.asarray(init_stoch, jnp.float32),
        *packed,
    )
    assert np.isfinite(np.asarray(out[0])).all()


def test_sampling_follows_logits(setup):
    """With one dominant logit per block, samples must be (nearly) deterministic."""
    model, params, packed, actions, init_deter, init_stoch = setup
    # Make wp2 bias hugely favor category 0 of each block.
    packed = list(packed)
    packed[10] = packed[10] * 0.0  # wp2
    b = np.full((16,), -30.0, np.float32)
    b[0::4] = 30.0
    packed[11] = jnp.asarray(b)
    _, _, stochs = _run_kernel_interpret(tuple(packed), actions, init_deter, init_stoch)
    expected = np.zeros((16,), np.float32)
    expected[0::4] = 1.0
    np.testing.assert_allclose(stochs.reshape(-1, 16), np.tile(expected, (stochs.size // 16, 1)))
