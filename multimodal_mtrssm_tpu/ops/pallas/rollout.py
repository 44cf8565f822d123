"""Pallas TPU kernel: fused prior-only rollout (imagination).

The imagination loop (reference ``core.py:170-185``: per step MLP → GRUCell →
MLP → categorical sample) is the serving hot path — the word-transition
evaluation runs it for every interval×sample (reference
``evaluate_word_transitions_mrssm.py:286-372``). Under XLA it compiles to a
``lax.scan`` whose body is a chain of small ops; this kernel fuses the whole
T-step recurrence into ONE Pallas program: all weights live in VMEM for the
duration (they total ~100 KB), the loop runs on-core via ``fori_loop``, and
categorical sampling uses the on-core PRNG (Gumbel-argmax over the
``category_size`` blocks).

Weights are passed as a packed tuple of f32 arrays; use :func:`pack_params`
to extract them from a ``MoPoEMRSSM`` param tree. Shapes (defaults):
A=6 action, S=16 stoch, H=32 hidden, D=32 deter.

The kernel computes the same math as ``MoPoEMRSSM.rollout_transition``
(verified in tests by replaying the kernel's sampled stochs through the XLA
path); only the RNG stream differs (TPU core PRNG vs threefry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_mtrssm_tpu.nn.core import Params

# Packed weight order (all f32):
# w1 [A+S, H], b1 [H]        action_state_projector layer 0
# w2 [H, H],  b2 [H]         action_state_projector layer 1
# wih [H, 3D], bih [3D]      GRU input weights (gate order r, z, n)
# whh [D, 3D], bhh [3D]      GRU hidden weights
# wp1 [D, H], bp1 [H]        rnn_to_prior_projector layer 0
# wp2 [H, S], bp2 [S]        rnn_to_prior_projector layer 1


def pack_params(params: Params) -> tuple[jax.Array, ...]:
    """Extract the transition weights from a MoPoEMRSSM param tree."""
    t = params["transition"]
    asp = t["action_state_projector"]["layers"]
    prior = t["rnn_to_prior_projector"]["layers"]
    gru = t["gru"]
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    return (
        f32(asp[0]["w"]), f32(asp[0]["b"]),
        f32(asp[1]["w"]), f32(asp[1]["b"]),
        f32(gru["w_ih"]), f32(gru["b_ih"]),
        f32(gru["w_hh"]), f32(gru["b_hh"]),
        f32(prior[0]["w"]), f32(prior[0]["b"]),
        f32(prior[1]["w"]), f32(prior[1]["b"]),
    )


def _elu(x: jax.Array) -> jax.Array:
    """ELU without expm1 (unimplemented in Pallas TPU lowering)."""
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _uniform_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 → uniform (0, 1) float32 via mantissa stuffing.

    The low mantissa bit is forced on so u can never be exactly 0 — a
    zero would make the Gumbel score -log(-log(0)) = -inf and bias that
    category to unreachable on the draw (jax.random.gumbel likewise
    samples open-interval uniforms)."""
    mantissa = jax.lax.shift_right_logical(bits, jnp.uint32(9))
    one_to_two = pltpu.bitcast(mantissa | jnp.uint32(0x3F800001), jnp.float32)
    return one_to_two - 1.0


def onehot_blocks(scores: jax.Array, class_size: int, category_size: int) -> jax.Array:
    """First-index argmax one-hot per category block via a static column
    sweep (cumsum/argmax are unimplemented in the Pallas TPU lowering; the
    first-index tie-break matches ``jax.random.categorical``). The ONE home
    of this lowering workaround — shared by the rollout kernels (here) and
    the training kernels (``train_step.py``) so sampling cannot
    desynchronize between serving and training."""
    blocks = []
    for c in range(class_size):
        block = scores[:, c * category_size : (c + 1) * category_size]
        m = jnp.max(block, axis=-1, keepdims=True)
        is_max = (block >= m).astype(jnp.float32)
        taken = jnp.zeros_like(is_max[:, :1])
        cols = []
        for _j in range(category_size):
            col = is_max[:, _j : _j + 1] * (1.0 - taken)
            taken = taken + col
            cols.append(col)
        blocks.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(blocks, axis=-1)


def gumbel_block_sample(logits: jax.Array, class_size: int, category_size: int) -> jax.Array:
    """One-hot categorical sample per category block via Gumbel-argmax,
    using the on-core PRNG (must be seeded)."""
    u = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(logits.shape), jnp.uint32))
    return onehot_blocks(logits + (-jnp.log(-jnp.log(u))), class_size, category_size)


def _rollout_kernel(
    # refs: actions block [C, B, A], init_deter [B, D], init_stoch [B, S], seed [1]
    seed_ref,
    actions_ref,
    init_deter_ref,
    init_stoch_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    wih_ref, bih_ref, whh_ref, bhh_ref,
    wp1_ref, bp1_ref, wp2_ref, bp2_ref,
    deters_ref,  # out block [C, B, D]
    logits_ref,  # out block [C, B, S]
    stochs_ref,  # out block [C, B, S]
    deter_scratch,  # VMEM [B, D] carry across grid steps
    stoch_scratch,  # VMEM [B, S] carry across grid steps
    *,
    chunk: int,
    class_size: int,
    category_size: int,
):
    # The grid runs time-chunks SEQUENTIALLY on TPU; the recurrent carry
    # lives in VMEM scratch, which persists across grid steps. Outputs are
    # per-chunk blocks so arbitrary T streams to HBM without exceeding VMEM.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)

    @pl.when(i == 0)
    def _():
        deter_scratch[:] = init_deter_ref[:]
        stoch_scratch[:] = init_stoch_ref[:]

    w1, b1 = w1_ref[:], b1_ref[:]
    w2, b2 = w2_ref[:], b2_ref[:]
    wih, bih = wih_ref[:], bih_ref[:]
    whh, bhh = whh_ref[:], bhh_ref[:]
    wp1, bp1 = wp1_ref[:], bp1_ref[:]
    wp2, bp2 = wp2_ref[:], bp2_ref[:]
    D = whh.shape[0]

    def body(t, carry):
        deter, stoch = carry
        action = actions_ref[t]
        x = jnp.concatenate([action, stoch], axis=-1)
        h = _elu(jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1)
        x2 = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        # GRU (torch gate order r, z, n).
        gi = jnp.dot(x2, wih, preferred_element_type=jnp.float32) + bih
        gh = jnp.dot(deter, whh, preferred_element_type=jnp.float32) + bhh
        r = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
        z = jax.nn.sigmoid(gi[:, D : 2 * D] + gh[:, D : 2 * D])
        n = jnp.tanh(gi[:, 2 * D :] + r * gh[:, 2 * D :])
        deter = (1.0 - z) * n + z * deter
        p1 = _elu(jnp.dot(deter, wp1, preferred_element_type=jnp.float32) + bp1)
        logits = jnp.dot(p1, wp2, preferred_element_type=jnp.float32) + bp2
        stoch = gumbel_block_sample(logits, class_size, category_size)
        deters_ref[t] = deter
        logits_ref[t] = logits
        stochs_ref[t] = stoch
        return deter, stoch

    deter, stoch = jax.lax.fori_loop(
        0, chunk, body, (deter_scratch[:], stoch_scratch[:])
    )
    deter_scratch[:] = deter
    stoch_scratch[:] = stoch


@functools.partial(
    jax.jit, static_argnames=("class_size", "category_size", "interpret", "chunk")
)
def fused_rollout_transition(
    packed: tuple[jax.Array, ...],
    actions: jax.Array,  # [B, T, A]
    init_deter: jax.Array,  # [B, D]
    init_stoch: jax.Array,  # [B, S]
    seed: jax.Array,  # int32 scalar
    class_size: int = 4,
    category_size: int = 4,
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused prior rollout. Returns (deters, logits, stochs), each [B, T, ·]."""
    B, T, A = actions.shape
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]

    # Time-chunk size: keep the 3 output blocks within a few MB of VMEM
    # (lanes pad to 128, so each [C, B, ·] block costs C·B·128·4 bytes).
    if chunk is None:
        chunk = max(1, min(T, 2730 // max(B, 1)))
    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk
    actions_tm = jnp.swapaxes(actions, 0, 1).astype(jnp.float32)  # [T, B, A]
    if T_pad != T:
        actions_tm = jnp.pad(actions_tm, ((0, T_pad - T), (0, 0), (0, 0)))

    kernel = functools.partial(
        _rollout_kernel, chunk=chunk, class_size=class_size, category_size=category_size
    )
    vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    block = lambda d: pl.BlockSpec((chunk, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    deters, logits, stochs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, D), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, S), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, S), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), block(A)]
        + [vmem_full() for _ in range(14)],
        out_specs=(block(D), block(S), block(S)),
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),
            pltpu.VMEM((B, S), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        actions_tm,
        init_deter.astype(jnp.float32),
        init_stoch.astype(jnp.float32),
        *packed,
    )
    tm = lambda x: jnp.swapaxes(x[:T], 0, 1)  # noqa: E731
    return tm(deters), tm(logits), tm(stochs)
