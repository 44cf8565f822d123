"""Pallas TPU kernel: fused hierarchical (MTRNN) prior-only rollout.

MMTRSSM counterpart of ``rollout.py`` — fuses the two-level multi-timescale
imagination loop (reference ``mopoe_mmtrssm/core.py:496-544``: lower MTRNN →
lower prior sample → higher MTRNN → higher prior sample per step) into one
Pallas program with VMEM-resident weights, on-core PRNG sampling, and the
same sequential time-chunk grid + scratch-carry structure.

Per step (dims A=6, LS=16, HS=16, LD=32, HD=32 by default):
  l_in      = concat(action, ls, hs)
  hidden_l' = (1 - 1/τl)·hidden_l + (d2h_l(ld) + in2h_l(l_in)) / τl
  l_deter   = tanh(hidden_l');  l_logits = MLP_lprior(l_deter);  ls ~ sample
  hidden_h' = (1 - 1/τh)·hidden_h + (d2h_h(hd) + in2h_h(hs)) / τh
  h_deter   = tanh(hidden_h');  h_logits = MLP_hprior(h_deter);  hs ~ sample
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_mtrssm_tpu.nn.core import Params
from multimodal_mtrssm_tpu.ops.pallas.rollout import _elu, gumbel_block_sample

# Packed weight order (all f32):
# l_d2h_w [LD, LD], l_d2h_b, l_in2h_w [A+LS+HS, LD], l_in2h_b
# h_d2h_w [HD, HD], h_d2h_b, h_in2h_w [HS, HD], h_in2h_b
# lp1_w [LD, C], lp1_b, lp2_w [C, LS], lp2_b        l_prior MLP
# hp1_w [HD, C], hp1_b, hp2_w [C, HS], hp2_b        h_prior MLP


def pack_mt_params(params: Params) -> tuple[jax.Array, ...]:
    """Extract MTRNN + prior-head weights from a MoPoEMMTRSSM param tree."""
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    lr, hr = params["l_rnn"], params["h_rnn"]
    lp, hp = params["l_prior"]["layers"], params["h_prior"]["layers"]
    return (
        f32(lr["d2h"]["w"]), f32(lr["d2h"]["b"]),
        f32(lr["input2h"]["w"]), f32(lr["input2h"]["b"]),
        f32(hr["d2h"]["w"]), f32(hr["d2h"]["b"]),
        f32(hr["input2h"]["w"]), f32(hr["input2h"]["b"]),
        f32(lp[0]["w"]), f32(lp[0]["b"]), f32(lp[1]["w"]), f32(lp[1]["b"]),
        f32(hp[0]["w"]), f32(hp[0]["b"]), f32(hp[1]["w"]), f32(hp[1]["b"]),
    )


def _mt_rollout_kernel(
    seed_ref,
    actions_ref,  # block [C, B, A]
    init_hd_ref, init_ld_ref, init_hs_ref, init_ls_ref,
    init_hidh_ref, init_hidl_ref,
    l_d2h_w_ref, l_d2h_b_ref, l_in2h_w_ref, l_in2h_b_ref,
    h_d2h_w_ref, h_d2h_b_ref, h_in2h_w_ref, h_in2h_b_ref,
    lp1_w_ref, lp1_b_ref, lp2_w_ref, lp2_b_ref,
    hp1_w_ref, hp1_b_ref, hp2_w_ref, hp2_b_ref,
    # outs (blocks [C, B, ·])
    h_deter_ref, l_deter_ref, h_logits_ref, l_logits_ref, h_stoch_ref, l_stoch_ref,
    h_hidden_ref, l_hidden_ref,
    # scratch carries
    hd_s, ld_s, hs_s, ls_s, hidh_s, hidl_s,
    *,
    chunk: int,
    l_tau: float,
    h_tau: float,
    ls_class: int,
    ls_category: int,
    hs_class: int,
    hs_category: int,
):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)

    @pl.when(i == 0)
    def _():
        hd_s[:] = init_hd_ref[:]
        ld_s[:] = init_ld_ref[:]
        hs_s[:] = init_hs_ref[:]
        ls_s[:] = init_ls_ref[:]
        hidh_s[:] = init_hidh_ref[:]
        hidl_s[:] = init_hidl_ref[:]

    l_d2h_w, l_d2h_b = l_d2h_w_ref[:], l_d2h_b_ref[:]
    l_in2h_w, l_in2h_b = l_in2h_w_ref[:], l_in2h_b_ref[:]
    h_d2h_w, h_d2h_b = h_d2h_w_ref[:], h_d2h_b_ref[:]
    h_in2h_w, h_in2h_b = h_in2h_w_ref[:], h_in2h_b_ref[:]
    lp1_w, lp1_b = lp1_w_ref[:], lp1_b_ref[:]
    lp2_w, lp2_b = lp2_w_ref[:], lp2_b_ref[:]
    hp1_w, hp1_b = hp1_w_ref[:], hp1_b_ref[:]
    hp2_w, hp2_b = hp2_w_ref[:], hp2_b_ref[:]
    inv_lt, inv_ht = 1.0 / l_tau, 1.0 / h_tau

    def body(t, carry):
        hd, ld, hs, ls, hidh, hidl = carry
        action = actions_ref[t]
        # Lower MTRNN + prior.
        l_in = jnp.concatenate([action, ls, hs], axis=-1)
        hidl = (1.0 - inv_lt) * hidl + (
            jnp.dot(ld, l_d2h_w, preferred_element_type=jnp.float32) + l_d2h_b
            + jnp.dot(l_in, l_in2h_w, preferred_element_type=jnp.float32) + l_in2h_b
        ) * inv_lt
        l_deter = jnp.tanh(hidl)
        lh = _elu(jnp.dot(l_deter, lp1_w, preferred_element_type=jnp.float32) + lp1_b)
        l_logits = jnp.dot(lh, lp2_w, preferred_element_type=jnp.float32) + lp2_b
        ls = gumbel_block_sample(l_logits, ls_class, ls_category)
        # Higher MTRNN + prior (input = previous hs, reference :525-528).
        hidh = (1.0 - inv_ht) * hidh + (
            jnp.dot(hd, h_d2h_w, preferred_element_type=jnp.float32) + h_d2h_b
            + jnp.dot(hs, h_in2h_w, preferred_element_type=jnp.float32) + h_in2h_b
        ) * inv_ht
        h_deter = jnp.tanh(hidh)
        hh = _elu(jnp.dot(h_deter, hp1_w, preferred_element_type=jnp.float32) + hp1_b)
        h_logits = jnp.dot(hh, hp2_w, preferred_element_type=jnp.float32) + hp2_b
        hs = gumbel_block_sample(h_logits, hs_class, hs_category)

        h_deter_ref[t] = h_deter
        l_deter_ref[t] = l_deter
        h_logits_ref[t] = h_logits
        l_logits_ref[t] = l_logits
        h_stoch_ref[t] = hs
        l_stoch_ref[t] = ls
        # Integrator states, emitted so continuations are exact even when
        # tanh saturates (serving.py previously recovered them via arctanh).
        h_hidden_ref[t] = hidh
        l_hidden_ref[t] = hidl
        return h_deter, l_deter, hs, ls, hidh, hidl

    carry = jax.lax.fori_loop(
        0, chunk, body, (hd_s[:], ld_s[:], hs_s[:], ls_s[:], hidh_s[:], hidl_s[:])
    )
    hd_s[:], ld_s[:], hs_s[:], ls_s[:], hidh_s[:], hidl_s[:] = carry


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_tau", "h_tau", "ls_class", "ls_category", "hs_class", "hs_category",
        "interpret", "chunk",
    ),
)
def fused_mt_rollout_transition(
    packed: tuple[jax.Array, ...],
    actions: jax.Array,  # [B, T, A]
    init_state: tuple[jax.Array, ...],  # (hd, ld, hs, ls, hidden_h, hidden_l), each [B, ·]
    seed: jax.Array,
    l_tau: float = 2.0,
    h_tau: float = 4.0,
    ls_class: int = 4,
    ls_category: int = 4,
    hs_class: int = 2,
    hs_category: int = 8,
    interpret: bool = False,
    chunk: int | None = None,
) -> tuple[jax.Array, ...]:
    """Fused hierarchical prior rollout. Returns
    (h_deter, l_deter, h_logits, l_logits, h_stoch, l_stoch, h_hidden,
    l_hidden), each [B, T, ·] — the last two are the MTRNN integrator
    trajectories (``deter = tanh(hidden)``), matching the XLA path's MTState
    so chained continuations are exact even at tanh saturation."""
    B, T, A = actions.shape
    hd0, ld0, hs0, ls0, hidh0, hidl0 = (x.astype(jnp.float32) for x in init_state)
    HD, LD, HS, LS = hd0.shape[-1], ld0.shape[-1], hs0.shape[-1], ls0.shape[-1]

    if chunk is None:
        chunk = max(1, min(T, 1024 // max(B, 1)))  # 8 output blocks in VMEM
    n_chunks = -(-T // chunk)
    T_pad = n_chunks * chunk
    actions_tm = jnp.swapaxes(actions, 0, 1).astype(jnp.float32)
    if T_pad != T:
        actions_tm = jnp.pad(actions_tm, ((0, T_pad - T), (0, 0), (0, 0)))

    kernel = functools.partial(
        _mt_rollout_kernel, chunk=chunk, l_tau=l_tau, h_tau=h_tau,
        ls_class=ls_class, ls_category=ls_category,
        hs_class=hs_class, hs_category=hs_category,
    )
    vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    block = lambda d: pl.BlockSpec((chunk, B, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=(
            jax.ShapeDtypeStruct((T_pad, B, HD), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, LD), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, HS), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, LS), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, HS), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, LS), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, HD), jnp.float32),
            jax.ShapeDtypeStruct((T_pad, B, LD), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), block(A)]
        + [vmem_full() for _ in range(6 + 16)],
        out_specs=(block(HD), block(LD), block(HS), block(LS), block(HS), block(LS),
                   block(HD), block(LD)),
        scratch_shapes=[
            pltpu.VMEM((B, HD), jnp.float32),
            pltpu.VMEM((B, LD), jnp.float32),
            pltpu.VMEM((B, HS), jnp.float32),
            pltpu.VMEM((B, LS), jnp.float32),
            pltpu.VMEM((B, HD), jnp.float32),
            pltpu.VMEM((B, LD), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        actions_tm,
        hd0, ld0, hs0, ls0, hidh0, hidl0,
        *packed,
    )
    tm = lambda x: jnp.swapaxes(x[:T], 0, 1)  # noqa: E731
    return tuple(tm(x) for x in outs)
