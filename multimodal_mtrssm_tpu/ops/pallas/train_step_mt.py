"""Pallas TPU kernels: fused MoPoE-MMTRSSM TRAINING recurrence (fwd + VJP).

The hierarchical training hot loop (reference
``mopoe_mmtrssm/core.py:364-494``: per step lower MTRNN → lower prior head →
two posterior heads + MoPoE fusion → lower ST sample → higher MTRNN →
higher prior/posterior heads → two more ST samples) has even more tiny ops
per step than the MRSSM one — the natural second target of the SURVEY §7.7
plan ("MTRNN variant shared between l/h"). Same design as
``train_step.py``: one Pallas program for the whole T-step forward, a
second for the hand-derived backward (BPTT with per-step recompute from the
stored carries), behind ``jax.custom_vjp``; randomness is pre-generated
Gumbel noise (4 streams: lower prior, lower posterior, higher prior,
higher posterior).

Shapes (defaults): A=6 action, E=64 embed, LD=HD=32 deter, LS=16 (4×4),
HS=16 (2×8), C=32 head width. All math f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_mtrssm_tpu.nn.core import Params
from multimodal_mtrssm_tpu.ops.pallas.train_step import (
    _block_softmax_vjp,
    _d_elu,
    _elu,
    _mopoe_backward,
    _mopoe_forward,
    _rdot,
    _st_sample,
)

# Packed weight order (all f32):
#  0 wld [LD, LD],       1 bld [LD]     l_rnn.d2h
#  2 wli [A+LS+HS, LD],  3 bli [LD]     l_rnn.input2h
#  4 whd [HD, HD],       5 bhd [HD]     h_rnn.d2h
#  6 whi [HS, HD],       7 bhi [HD]     h_rnn.input2h
#  8 lp1 [LD, C],        9 blp1 [C]     l_prior layer 0
# 10 lp2 [C, LS],       11 blp2 [LS]    l_prior layer 1
# 12 hp1 [HD, C],       13 bhp1 [C]     h_prior layer 0
# 14 hp2 [C, HS],       15 bhp2 [HS]    h_prior layer 1
# 16 hq1 [LD+HD, C],    17 bhq1 [C]     h_posterior layer 0
# 18 hq2 [C, HS],       19 bhq2 [HS]    h_posterior layer 1
# 20 wa1 [LD+E, R],     21 ba1 [R]      audio_representation layer 0
# 22 wa2 [R, LS],       23 ba2 [LS]     audio_representation layer 1
# 24 wv1 [LD+E, R],     25 bv1 [R]      vision_representation layer 0
# 26 wv2 [R, LS],       27 bv2 [LS]     vision_representation layer 1
N_W = 28

# VMEM budget the single-block/chunked dispatch is sized against (module
# level so tests can shrink it to force the chunked path on tiny shapes).
MT_VMEM_BUDGET_BYTES = 10 << 20


def pack_mt_train_params(params: Params) -> tuple[jax.Array, ...]:
    """Extract the recurrence weights from a MoPoEMMTRSSM param tree."""
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    out = []
    for cell in ("l_rnn", "h_rnn"):
        out += [f32(params[cell]["d2h"]["w"]), f32(params[cell]["d2h"]["b"]),
                f32(params[cell]["input2h"]["w"]), f32(params[cell]["input2h"]["b"])]
    for head in ("l_prior", "h_prior", "h_posterior",
                 "audio_representation", "vision_representation"):
        layers = params[head]["layers"]
        out += [f32(layers[0]["w"]), f32(layers[0]["b"]),
                f32(layers[1]["w"]), f32(layers[1]["b"])]
    return tuple(out)


def _mt_forward_step(weights, action, a_emb, v_emb,
                     hd0, ld0, hs0, ls0, hidh0, hidl0,
                     g_lp, g_l, g_hp, g_h,
                     l_tau, h_tau, ls_class, ls_category, hs_class, hs_category):
    """One hierarchical step (reference ``core.py:405-490``); full record."""
    (wld, bld, wli, bli, whd, bhd, whi, bhi,
     lp1, blp1, lp2, blp2, hp1, bhp1, hp2, bhp2,
     hq1, bhq1, hq2, bhq2, wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = weights
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    inv_lt, inv_ht = 1.0 / l_tau, 1.0 / h_tau
    # Lower MTRNN.
    xl = jnp.concatenate([action, ls0, hs0], axis=-1)
    ul = (dot(ld0, wld) + bld) + (dot(xl, wli) + bli)
    hidl1 = (1.0 - inv_lt) * hidl0 + ul * inv_lt
    l_deter = jnp.tanh(hidl1)
    # Lower prior head + ST sample.
    lp_pre = dot(l_deter, lp1) + blp1
    lp_h = _elu(lp_pre)
    l_prior_logits = dot(lp_h, lp2) + blp2
    l_prior_stoch, l_prior_probs = _st_sample(l_prior_logits, g_lp, ls_class, ls_category)
    # Modality heads conditioned on l_deter → MoPoE → lower posterior sample.
    xa = jnp.concatenate([l_deter, a_emb], axis=-1)
    ha_pre = dot(xa, wa1) + ba1
    ha = _elu(ha_pre)
    a_logits = dot(ha, wa2) + ba2
    xv = jnp.concatenate([l_deter, v_emb], axis=-1)
    hv_pre = dot(xv, wv1) + bv1
    hv = _elu(hv_pre)
    v_logits = dot(hv, wv2) + bv2
    mixed, la, lv = _mopoe_forward(a_logits, v_logits)
    l_stoch, l_post_probs = _st_sample(mixed, g_l, ls_class, ls_category)
    # Higher MTRNN (input = prev higher stoch).
    uh = (dot(hd0, whd) + bhd) + (dot(hs0, whi) + bhi)
    hidh1 = (1.0 - inv_ht) * hidh0 + uh * inv_ht
    h_deter = jnp.tanh(hidh1)
    # Higher prior / posterior heads + ST samples.
    hp_pre = dot(h_deter, hp1) + bhp1
    hp_h = _elu(hp_pre)
    h_prior_logits = dot(hp_h, hp2) + bhp2
    h_prior_stoch, h_prior_probs = _st_sample(h_prior_logits, g_hp, hs_class, hs_category)
    xq = jnp.concatenate([l_deter, h_deter], axis=-1)
    hq_pre = dot(xq, hq1) + bhq1
    hq_h = _elu(hq_pre)
    h_post_logits = dot(hq_h, hq2) + bhq2
    h_stoch, h_post_probs = _st_sample(h_post_logits, g_h, hs_class, hs_category)
    return dict(
        xl=xl, hidl1=hidl1, l_deter=l_deter, lp_pre=lp_pre, lp_h=lp_h,
        l_prior_logits=l_prior_logits, l_prior_stoch=l_prior_stoch,
        l_prior_probs=l_prior_probs, xa=xa, ha_pre=ha_pre, ha=ha,
        a_logits=a_logits, xv=xv, hv_pre=hv_pre, hv=hv, v_logits=v_logits,
        mixed=mixed, la=la, lv=lv, l_stoch=l_stoch, l_post_probs=l_post_probs,
        hidh1=hidh1, h_deter=h_deter, hp_pre=hp_pre, hp_h=hp_h,
        h_prior_logits=h_prior_logits, h_prior_stoch=h_prior_stoch,
        h_prior_probs=h_prior_probs, xq=xq, hq_pre=hq_pre, hq_h=hq_h,
        h_post_logits=h_post_logits, h_stoch=h_stoch, h_post_probs=h_post_probs,
    )


# Output order (12), matching the model's scan ys
# (models/mmtrssm.py::rollout_representation):
# h_deter, l_deter, hid_h, hid_l,
# l_prior_logits, l_prior_stoch, mixed_logits, l_stoch,
# h_prior_logits, h_prior_stoch, h_post_logits, h_stoch
N_OUT = 12


def _fwd_kernel(
    actions_ref, a_emb_ref, v_emb_ref,
    hd_ref, ld_ref, hs_ref, ls_ref, hidh_ref, hidl_ref,
    glp_ref, gl_ref, ghp_ref, gh_ref,
    *rest,
    T, l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
):
    w_refs, outs = rest[:N_W], rest[N_W:]
    weights = tuple(r[:] for r in w_refs)

    def body(t, carry):
        hd0, ld0, hs0, ls0, hidh0, hidl0 = carry
        rec = _mt_forward_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t],
            hd0, ld0, hs0, ls0, hidh0, hidl0,
            glp_ref[t], gl_ref[t], ghp_ref[t], gh_ref[t],
            l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
        )
        for ref, name in zip(outs, ("h_deter", "l_deter", "hidh1", "hidl1",
                                    "l_prior_logits", "l_prior_stoch", "mixed", "l_stoch",
                                    "h_prior_logits", "h_prior_stoch", "h_post_logits", "h_stoch")):
            ref[t] = rec[name]
        return (rec["h_deter"], rec["l_deter"], rec["h_stoch"], rec["l_stoch"],
                rec["hidh1"], rec["hidl1"])

    jax.lax.fori_loop(0, T, body, (hd_ref[:], ld_ref[:], hs_ref[:], ls_ref[:],
                                   hidh_ref[:], hidl_ref[:]))


def _mt_bwd_step(weights, action, a_emb, v_emb, prev6, g4, gouts_t, carry,
                 l_tau, h_tau, ls_class, ls_category, hs_class, hs_category):
    """One reverse-time BPTT step (recompute + grads). ``prev6`` is the
    carry INTO step t (the shifted sequences — callers pre-shift once in
    XLA instead of branching on t==0 per iteration). Returns
    (new_carry6, (d_action, d_a_emb, d_v_emb), dw28) where dw28 are this
    step's weight-grad contributions (callers accumulate)."""
    (wld, bld, wli, bli, whd, bhd, whi, bhi,
     lp1, blp1, lp2, blp2, hp1, bhp1, hp2, bhp2,
     hq1, bhq1, hq2, bhq2, wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = weights
    (d_hd_c, d_ld_c, d_hs_c, d_ls_c, d_hidh_c, d_hidl_c) = carry
    (gHD, gLD, gHIDH, gHIDL, gLPL, gLPS, gMX, gLS, gHPL, gHPS, gHQL, gHS) = gouts_t
    hd0, ld0, hs0, ls0, hidh0, hidl0 = prev6
    A = action.shape[-1]
    LD = wld.shape[0]
    LS = lp2.shape[1]
    tdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inv_lt, inv_ht = 1.0 / l_tau, 1.0 / h_tau
    dw = [None] * N_W

    rec = _mt_forward_step(
        weights, action, a_emb, v_emb, hd0, ld0, hs0, ls0, hidh0, hidl0,
        *g4, l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
    )

    # --- higher posterior (h_stoch output + next-step hs carry) -------
    g_hs_tot = gHS + d_hs_c
    d_hql = gHQL + _block_softmax_vjp(rec["h_post_probs"], g_hs_tot, hs_class, hs_category)
    dw[18] = tdot(rec["hq_h"], d_hql)
    dw[19] = jnp.sum(d_hql, axis=0)
    d_hq = _rdot(d_hql, hq2) * _d_elu(rec["hq_pre"])
    dw[16] = tdot(rec["xq"], d_hq)
    dw[17] = jnp.sum(d_hq, axis=0)
    d_xq = _rdot(d_hq, hq1)
    d_l_deter = d_xq[:, :LD]
    d_h_deter = d_xq[:, LD:]

    # --- higher prior head ------------------------------------------
    d_hpl = gHPL + _block_softmax_vjp(rec["h_prior_probs"], gHPS, hs_class, hs_category)
    dw[14] = tdot(rec["hp_h"], d_hpl)
    dw[15] = jnp.sum(d_hpl, axis=0)
    d_hp = _rdot(d_hpl, hp2) * _d_elu(rec["hp_pre"])
    dw[12] = tdot(rec["h_deter"], d_hp)
    dw[13] = jnp.sum(d_hp, axis=0)
    d_h_deter += _rdot(d_hp, hp1)

    # --- higher MTRNN backward --------------------------------------
    g_h_deter = gHD + d_hd_c + d_h_deter
    g_hidh1 = gHIDH + d_hidh_c + g_h_deter * (1.0 - rec["h_deter"] * rec["h_deter"])
    d_hidh_prev = g_hidh1 * (1.0 - inv_ht)
    sh = g_hidh1 * inv_ht
    dw[4] = tdot(hd0, sh)
    dw[5] = jnp.sum(sh, axis=0)
    dw[6] = tdot(hs0, sh)
    dw[7] = dw[5]
    d_hd0 = _rdot(sh, whd)
    d_hs0 = _rdot(sh, whi)

    # --- lower posterior (l_stoch output + next-step ls carry) -------
    g_ls_tot = gLS + d_ls_c
    d_mixed = gMX + _block_softmax_vjp(rec["l_post_probs"], g_ls_tot, ls_class, ls_category)
    d_a_logits, d_v_logits = _mopoe_backward(
        d_mixed, rec["mixed"], rec["la"], rec["lv"], rec["a_logits"], rec["v_logits"]
    )
    d_embs = []
    for d_logits, h, pre, xcat, w_hid, w_out, iw1, ib1, iw2, ib2 in (
        (d_a_logits, rec["ha"], rec["ha_pre"], rec["xa"], wa1, wa2, 20, 21, 22, 23),
        (d_v_logits, rec["hv"], rec["hv_pre"], rec["xv"], wv1, wv2, 24, 25, 26, 27),
    ):
        dw[iw2] = tdot(h, d_logits)
        dw[ib2] = jnp.sum(d_logits, axis=0)
        d_h = _rdot(d_logits, w_out) * _d_elu(pre)
        dw[iw1] = tdot(xcat, d_h)
        dw[ib1] = jnp.sum(d_h, axis=0)
        d_xcat = _rdot(d_h, w_hid)
        d_l_deter += d_xcat[:, :LD]
        d_embs.append(d_xcat[:, LD:])

    # --- lower prior head -------------------------------------------
    d_lpl = gLPL + _block_softmax_vjp(rec["l_prior_probs"], gLPS, ls_class, ls_category)
    dw[10] = tdot(rec["lp_h"], d_lpl)
    dw[11] = jnp.sum(d_lpl, axis=0)
    d_lp = _rdot(d_lpl, lp2) * _d_elu(rec["lp_pre"])
    dw[8] = tdot(rec["l_deter"], d_lp)
    dw[9] = jnp.sum(d_lp, axis=0)
    d_l_deter += _rdot(d_lp, lp1)

    # --- lower MTRNN backward ---------------------------------------
    g_l_deter = gLD + d_ld_c + d_l_deter
    g_hidl1 = gHIDL + d_hidl_c + g_l_deter * (1.0 - rec["l_deter"] * rec["l_deter"])
    d_hidl_prev = g_hidl1 * (1.0 - inv_lt)
    sl = g_hidl1 * inv_lt
    dw[0] = tdot(ld0, sl)
    dw[1] = jnp.sum(sl, axis=0)
    dw[2] = tdot(rec["xl"], sl)
    dw[3] = dw[1]
    d_ld0 = _rdot(sl, wld)
    d_xl = _rdot(sl, wli)
    d_action = d_xl[:, :A]
    d_ls0 = d_xl[:, A : A + LS]
    d_hs0 = d_hs0 + d_xl[:, A + LS :]
    new_carry = (d_hd0, d_ld0, d_hs0, d_ls0, d_hidh_prev, d_hidl_prev)
    return new_carry, (d_action, d_embs[0], d_embs[1]), tuple(dw)


def _bwd_kernel(
    # residuals: inputs + gumbels + SHIFTED carry sequences (prev6[t] is
    # the carry INTO step t; callers pre-shift, so no t==0 branch here)
    actions_ref, a_emb_ref, v_emb_ref,
    glp_ref, gl_ref, ghp_ref, gh_ref,
    phd_ref, pld_ref, phs_ref, pls_ref, phidh_ref, phidl_ref,
    *rest,
    T, l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
):
    w_refs = rest[:N_W]
    gouts = rest[N_W : N_W + N_OUT]
    out_w = rest[N_W + N_OUT : 2 * N_W + N_OUT]
    (d_actions_ref, d_a_emb_ref, d_v_emb_ref,
     d_hd_ref, d_ld_ref, d_hs_ref, d_ls_ref, d_hidh_ref, d_hidl_ref) = rest[2 * N_W + N_OUT :]
    weights = tuple(r[:] for r in w_refs)

    for r in out_w:
        r[:] = jnp.zeros_like(r)

    def body(i, carry):
        t = T - 1 - i
        prev6 = (phd_ref[t], pld_ref[t], phs_ref[t], pls_ref[t],
                 phidh_ref[t], phidl_ref[t])
        g4 = (glp_ref[t], gl_ref[t], ghp_ref[t], gh_ref[t])
        gouts_t = tuple(g[t] for g in gouts)
        new_carry, d_ins, dw = _mt_bwd_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t], prev6, g4,
            gouts_t, carry, l_tau, h_tau, ls_class, ls_category,
            hs_class, hs_category,
        )
        for r, contrib in zip(out_w, dw):
            r[:] += contrib
        d_actions_ref[t], d_a_emb_ref[t], d_v_emb_ref[t] = d_ins
        return new_carry

    B = actions_ref.shape[1]
    zeros = tuple(
        jnp.zeros((B, r.shape[-1]), jnp.float32)
        for r in (d_hd_ref, d_ld_ref, d_hs_ref, d_ls_ref, d_hidh_ref, d_hidl_ref)
    )
    d_hd, d_ld, d_hs, d_ls, d_hidh, d_hidl = jax.lax.fori_loop(0, T, body, zeros)
    d_hd_ref[:] = d_hd
    d_ld_ref[:] = d_ld
    d_hs_ref[:] = d_hs
    d_ls_ref[:] = d_ls
    d_hidh_ref[:] = d_hidh
    d_hidl_ref[:] = d_hidl


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _fwd_call(packed, actions, a_emb, v_emb, init6, gumbels, hp, interpret):
    T, B, _ = actions.shape
    HD, LD = init6[0].shape[-1], init6[1].shape[-1]
    HS, LS = init6[2].shape[-1], init6[3].shape[-1]
    tc = mt_chunk_len(
        B, MT_VMEM_BUDGET_BYTES,
        action_size=actions.shape[-1], obs_embed_size=a_emb.shape[-1],
        hd_dim=HD, ld_dim=LD, hs_size=HS, ls_size=LS,
    )
    if tc < T:
        return _fwd_call_chunked(
            packed, actions, a_emb, v_emb, init6, gumbels, tc, hp, interpret)
    kernel = functools.partial(_fwd_kernel, T=T, **hp)
    dims = (HD, LD, HD, LD, LS, LS, LS, LS, HS, HS, HS, HS)
    return pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((T, B, d), jnp.float32) for d in dims),
        in_specs=[_vmem()] * (3 + 6 + 4 + N_W),
        out_specs=tuple(_vmem() for _ in range(N_OUT)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(actions, a_emb, v_emb, *init6, *gumbels, *packed)


def _shift_prev(init6, seqs6):
    """prev6[t] = the carry INTO step t: init at t=0, seqs[t-1] after."""
    return tuple(
        jnp.concatenate([i[None], s[:-1]], axis=0) for i, s in zip(init6, seqs6)
    )


def _bwd_call(packed, actions, a_emb, v_emb, init6, gumbels, seqs6, gouts, hp, interpret):
    T, B, A = actions.shape
    E = a_emb.shape[-1]
    prev6 = _shift_prev(init6, seqs6)
    tc = mt_chunk_len(
        B, MT_VMEM_BUDGET_BYTES,
        action_size=A, obs_embed_size=E,
        hd_dim=init6[0].shape[-1], ld_dim=init6[1].shape[-1],
        hs_size=init6[2].shape[-1], ls_size=init6[3].shape[-1],
    )
    if tc < T:
        return _bwd_call_chunked(
            packed, actions, a_emb, v_emb, gumbels, prev6, gouts, tc,
            hp, interpret)
    kernel = functools.partial(_bwd_kernel, T=T, **hp)
    out_shape = (
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed)
        + (jax.ShapeDtypeStruct((T, B, A), jnp.float32),
           jax.ShapeDtypeStruct((T, B, E), jnp.float32),
           jax.ShapeDtypeStruct((T, B, E), jnp.float32))
        + tuple(jax.ShapeDtypeStruct(x.shape, jnp.float32) for x in init6)
    )
    n_in = 3 + 4 + 6 + N_W + N_OUT
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[_vmem()] * n_in,
        out_specs=tuple(_vmem() for _ in range(N_W + 3 + 6)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(actions, a_emb, v_emb, *gumbels, *prev6, *packed, *gouts)
    d_packed = tuple(outs[:N_W])
    d_actions, d_a_emb, d_v_emb = outs[N_W : N_W + 3]
    d_init6 = tuple(outs[N_W + 3 :])
    return d_packed, d_actions, d_a_emb, d_v_emb, d_init6


# ---------------------------------------------------------------------------
# Time-chunked variants (VERDICT r4: VMEM guard stops excluding large [T, B])
#
# One Pallas grid dimension iterates time chunks SEQUENTIALLY on the core
# ("arbitrary" semantics): per-chunk [Tc, B, ·] blocks stream through VMEM
# (double-buffered by the pipeline) while the recurrence carry persists in
# VMEM scratch across grid steps and weight-grad outputs accumulate into
# revisited constant-index blocks. This removes the whole-[T, B] VMEM
# residency that forced the B=32 fallback — the spill is the input/output
# streaming the pipeline already does, overlapping DMA with compute.
# ---------------------------------------------------------------------------


def _fwd_kernel_chunked(
    actions_ref, a_emb_ref, v_emb_ref,
    hd_ref, ld_ref, hs_ref, ls_ref, hidh_ref, hidl_ref,
    glp_ref, gl_ref, ghp_ref, gh_ref,
    *rest,
    Tc, l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
):
    w_refs = rest[:N_W]
    outs = rest[N_W : N_W + N_OUT]
    carry_refs = rest[N_W + N_OUT :]  # 6 scratch [B, ·]
    weights = tuple(r[:] for r in w_refs)

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        for c, i in zip(carry_refs, (hd_ref, ld_ref, hs_ref, ls_ref, hidh_ref, hidl_ref)):
            c[:] = i[:]

    def body(t, carry):
        hd0, ld0, hs0, ls0, hidh0, hidl0 = carry
        rec = _mt_forward_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t],
            hd0, ld0, hs0, ls0, hidh0, hidl0,
            glp_ref[t], gl_ref[t], ghp_ref[t], gh_ref[t],
            l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
        )
        for ref, name in zip(outs, ("h_deter", "l_deter", "hidh1", "hidl1",
                                    "l_prior_logits", "l_prior_stoch", "mixed", "l_stoch",
                                    "h_prior_logits", "h_prior_stoch", "h_post_logits", "h_stoch")):
            ref[t] = rec[name]
        return (rec["h_deter"], rec["l_deter"], rec["h_stoch"], rec["l_stoch"],
                rec["hidh1"], rec["hidl1"])

    final = jax.lax.fori_loop(0, Tc, body, tuple(c[:] for c in carry_refs))
    for c, v in zip(carry_refs, final):
        c[:] = v


def _bwd_kernel_chunked(
    actions_ref, a_emb_ref, v_emb_ref,
    glp_ref, gl_ref, ghp_ref, gh_ref,
    phd_ref, pld_ref, phs_ref, pls_ref, phidh_ref, phidl_ref,
    *rest,
    Tc, n_chunks, l_tau, h_tau, ls_class, ls_category, hs_class, hs_category,
):
    w_refs = rest[:N_W]
    gouts = rest[N_W : N_W + N_OUT]
    out_w = rest[N_W + N_OUT : 2 * N_W + N_OUT]
    (d_actions_ref, d_a_emb_ref, d_v_emb_ref,
     d_hd_ref, d_ld_ref, d_hs_ref, d_ls_ref, d_hidh_ref, d_hidl_ref) = (
        rest[2 * N_W + N_OUT : 2 * N_W + N_OUT + 9])
    carry_refs = rest[2 * N_W + N_OUT + 9 :]  # 6 scratch [B, ·]
    weights = tuple(r[:] for r in w_refs)
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        for r in out_w:
            r[:] = jnp.zeros_like(r)
        for c in carry_refs:
            c[:] = jnp.zeros_like(c)

    def body(i, carry):
        t = Tc - 1 - i
        prev6 = (phd_ref[t], pld_ref[t], phs_ref[t], pls_ref[t],
                 phidh_ref[t], phidl_ref[t])
        g4 = (glp_ref[t], gl_ref[t], ghp_ref[t], gh_ref[t])
        gouts_t = tuple(go[t] for go in gouts)
        new_carry, d_ins, dw = _mt_bwd_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t], prev6, g4,
            gouts_t, carry, l_tau, h_tau, ls_class, ls_category,
            hs_class, hs_category,
        )
        for r, contrib in zip(out_w, dw):
            r[:] += contrib
        d_actions_ref[t], d_a_emb_ref[t], d_v_emb_ref[t] = d_ins
        return new_carry

    final = jax.lax.fori_loop(0, Tc, body, tuple(c[:] for c in carry_refs))
    for c, v in zip(carry_refs, final):
        c[:] = v

    @pl.when(g == n_chunks - 1)
    def _emit_init_grads():
        for ref, c in zip(
            (d_hd_ref, d_ld_ref, d_hs_ref, d_ls_ref, d_hidh_ref, d_hidl_ref),
            carry_refs,
        ):
            ref[:] = c[:]


def _pad_t(x, T_pad):
    t = x.shape[0]
    return x if t == T_pad else jnp.pad(x, ((0, T_pad - t),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call_chunked(packed, actions, a_emb, v_emb, init6, gumbels, tc, hp, interpret):
    T, B, _ = actions.shape
    HD, LD = init6[0].shape[-1], init6[1].shape[-1]
    HS, LS = init6[2].shape[-1], init6[3].shape[-1]
    n = -(-T // tc)
    T_pad = n * tc
    seq_in = tuple(_pad_t(x, T_pad) for x in (actions, a_emb, v_emb) + tuple(gumbels))
    kernel = functools.partial(_fwd_kernel_chunked, Tc=tc, **hp)
    dims = (HD, LD, HD, LD, LS, LS, LS, LS, HS, HS, HS, HS)
    chunk = lambda x: pl.BlockSpec(  # noqa: E731
        (tc,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))
    whole = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i, _nd=x.ndim: (0,) * _nd)
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=tuple(jax.ShapeDtypeStruct((T_pad, B, d), jnp.float32) for d in dims),
        in_specs=(
            [chunk(seq_in[0]), chunk(seq_in[1]), chunk(seq_in[2])]
            + [whole(x) for x in init6]
            + [chunk(x) for x in seq_in[3:]]
            + [whole(w) for w in packed]
        ),
        out_specs=tuple(
            pl.BlockSpec((tc, B, d), lambda i: (i, 0, 0)) for d in dims),
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32) for d in (HD, LD, HS, LS, HD, LD)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seq_in[0], seq_in[1], seq_in[2], *init6, *seq_in[3:], *packed)
    return tuple(o[:T] for o in outs)


def _bwd_call_chunked(packed, actions, a_emb, v_emb, gumbels, prev6, gouts,
                      tc, hp, interpret):
    T, B, A = actions.shape
    E = a_emb.shape[-1]
    HD, LD = prev6[0].shape[-1], prev6[1].shape[-1]
    HS, LS = prev6[2].shape[-1], prev6[3].shape[-1]
    n = -(-T // tc)
    T_pad = n * tc
    seq_in = tuple(
        _pad_t(x, T_pad)
        for x in (actions, a_emb, v_emb) + tuple(gumbels) + tuple(prev6) + tuple(gouts)
    )
    # Reverse chunk order: grid step i processes chunk n-1-i (padded tail
    # first — its zero cotangents contribute zero, so the carry stays zero
    # until real steps).
    kernel = functools.partial(_bwd_kernel_chunked, Tc=tc, n_chunks=n, **hp)
    rchunk = lambda x: pl.BlockSpec(  # noqa: E731
        (tc,) + x.shape[1:], lambda i, _n=n: (_n - 1 - i,) + (0,) * (x.ndim - 1))
    whole = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i, _nd=x.ndim: (0,) * _nd)
    out_shape = (
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed)
        + (jax.ShapeDtypeStruct((T_pad, B, A), jnp.float32),
           jax.ShapeDtypeStruct((T_pad, B, E), jnp.float32),
           jax.ShapeDtypeStruct((T_pad, B, E), jnp.float32))
        + tuple(jax.ShapeDtypeStruct((B, d), jnp.float32)
                for d in (HD, LD, HS, LS, HD, LD))
    )
    out_specs = (
        tuple(whole(w) for w in packed)  # weight grads: revisited accumulators
        + (rchunk(seq_in[0]), rchunk(seq_in[1]), rchunk(seq_in[2]))
        + tuple(pl.BlockSpec((B, d), lambda i: (0, 0))
                for d in (HD, LD, HS, LS, HD, LD))
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=out_shape,
        in_specs=(
            [rchunk(x) for x in seq_in[:7]]
            + [rchunk(x) for x in seq_in[7:13]]
            + [whole(w) for w in packed]
            + [rchunk(x) for x in seq_in[13:]]
        ),
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((B, d), jnp.float32) for d in (HD, LD, HS, LS, HD, LD)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*seq_in[:13], *packed, *seq_in[13:])
    d_packed = tuple(outs[:N_W])
    d_actions, d_a_emb, d_v_emb = (o[:T] for o in outs[N_W : N_W + 3])
    d_init6 = tuple(outs[N_W + 3 :])
    return d_packed, d_actions, d_a_emb, d_v_emb, d_init6


@functools.lru_cache(maxsize=None)
def _make_fused(l_tau, h_tau, ls_class, ls_category, hs_class, hs_category, interpret):
    hp = dict(l_tau=l_tau, h_tau=h_tau, ls_class=ls_class, ls_category=ls_category,
              hs_class=hs_class, hs_category=hs_category)

    @jax.custom_vjp
    def fused(packed, actions, a_emb, v_emb, init6, gumbels):
        return _fwd_call(packed, actions, a_emb, v_emb, init6, gumbels, hp, interpret)

    def fwd(packed, actions, a_emb, v_emb, init6, gumbels):
        outs = fused(packed, actions, a_emb, v_emb, init6, gumbels)
        # Stored sequences for the backward recompute: the six carries
        # (h_deter, l_deter, h_stoch, l_stoch, hid_h, hid_l).
        seqs6 = (outs[0], outs[1], outs[11], outs[7], outs[2], outs[3])
        return outs, (packed, actions, a_emb, v_emb, init6, gumbels, seqs6)

    def bwd(res, gouts):
        packed, actions, a_emb, v_emb, init6, gumbels, seqs6 = res
        d_packed, d_actions, d_a_emb, d_v_emb, d_init6 = _bwd_call(
            packed, actions, a_emb, v_emb, init6, gumbels, seqs6, tuple(gouts),
            hp, interpret,
        )
        return (d_packed, d_actions, d_a_emb, d_v_emb, d_init6,
                tuple(jnp.zeros_like(g) for g in gumbels))

    fused.defvjp(fwd, bwd)
    return fused


def fused_mt_train_recurrence(
    packed: tuple[jax.Array, ...],
    actions: jax.Array,  # [T, B, A] time-major f32
    a_emb: jax.Array,    # [T, B, E]
    v_emb: jax.Array,    # [T, B, E]
    init6: tuple[jax.Array, ...],   # (hd, ld, hs, ls, hid_h, hid_l), each [B, ·]
    gumbels: tuple[jax.Array, ...],  # (g_lprior, g_lpost, g_hprior, g_hpost), [T, B, ·]
    l_tau: float = 2.0,
    h_tau: float = 4.0,
    ls_class: int = 4,
    ls_category: int = 4,
    hs_class: int = 2,
    hs_category: int = 8,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Fused, differentiable hierarchical training recurrence.

    Returns the 12 time-major sequences of the model's scan
    (``models/mmtrssm.py::rollout_representation`` ys order).
    """
    fn = _make_fused(l_tau, h_tau, ls_class, ls_category, hs_class, hs_category, interpret)
    return fn(packed, actions, a_emb, v_emb, tuple(init6), tuple(gumbels))


def reference_mt_train_recurrence(
    packed: jax.Array, actions: jax.Array, a_emb: jax.Array, v_emb: jax.Array,
    init6: tuple, gumbels: tuple,
    l_tau: float = 2.0, h_tau: float = 4.0, ls_class: int = 4,
    ls_category: int = 4, hs_class: int = 2, hs_category: int = 8,
) -> tuple:
    """Pure-JAX twin (same math via ``lax.scan``): the equivalence/grad
    oracle, with the ST estimator re-injected for autodiff."""
    g_lp, g_l, g_hp, g_h = gumbels

    def st(sample, probs):
        return jax.lax.stop_gradient(sample - probs) + probs

    def step(carry, xs):
        hd0, ld0, hs0, ls0, hidh0, hidl0 = carry
        action, ae, ve, glp, gl, ghp, gh = xs
        rec = _mt_forward_step(packed, action, ae, ve, hd0, ld0, hs0, ls0,
                               hidh0, hidl0, glp, gl, ghp, gh,
                               l_tau, h_tau, ls_class, ls_category, hs_class, hs_category)
        l_prior_st = st(rec["l_prior_stoch"], rec["l_prior_probs"])
        l_st = st(rec["l_stoch"], rec["l_post_probs"])
        h_prior_st = st(rec["h_prior_stoch"], rec["h_prior_probs"])
        h_st = st(rec["h_stoch"], rec["h_post_probs"])
        ys = (rec["h_deter"], rec["l_deter"], rec["hidh1"], rec["hidl1"],
              rec["l_prior_logits"], l_prior_st, rec["mixed"], l_st,
              rec["h_prior_logits"], h_prior_st, rec["h_post_logits"], h_st)
        carry = (rec["h_deter"], rec["l_deter"], h_st, l_st, rec["hidh1"], rec["hidl1"])
        return carry, ys

    _, ys = jax.lax.scan(step, tuple(init6), (actions, a_emb, v_emb, g_lp, g_l, g_hp, g_h))
    return ys


def fits_vmem_mt(
    T: int,
    B: int,
    budget_bytes: int = 10 << 20,
    *,
    action_size: int = 6,
    obs_embed_size: int = 64,
    hd_dim: int = 32,
    ld_dim: int = 32,
    hs_size: int = 16,
    ls_size: int = 16,
) -> bool:
    """VMEM guard for the MT kernel, sized from the actual feature dims
    (``ceil(d/128)`` lane tiles per array — a flat per-array estimate
    under-counts configs with dims > 128). Backward [T, B, ·] residency:
    inputs (actions A, embeds E×2, gumbels LS×2 + HS×2, carry seqs
    HD×2 + LD×2 + HS + LS), output grads (HD×2 + LD×2 + LS×4 + HS×4),
    input grads (A + E×2) = 28 arrays, plus 6 lane-tiles of margin for
    per-step scratch (reproducing the previously calibrated 34-tile
    estimate exactly at the default dims)."""
    pad = lambda d: -(-d // 128) * 128  # noqa: E731
    A, E = pad(action_size), pad(obs_embed_size)
    HD, LD, HS, LS = pad(hd_dim), pad(ld_dim), pad(hs_size), pad(ls_size)
    lanes = 2 * A + 4 * E + 4 * HD + 4 * LD + 7 * LS + 7 * HS + 6 * 128
    B_pad = -(-B // 8) * 8
    return T * B_pad * lanes * 4 <= budget_bytes


def mt_chunk_len(
    B: int,
    budget_bytes: int = 10 << 20,
    *,
    action_size: int = 6,
    obs_embed_size: int = 64,
    hd_dim: int = 32,
    ld_dim: int = 32,
    hs_size: int = 16,
    ls_size: int = 16,
) -> int:
    """Time-chunk length for the grid-chunked kernels: the largest Tc whose
    per-grid-step VMEM residency (28 blocked [Tc, B, ·] arrays in the
    backward — inputs, gumbels, shifted carries, output cotangents, input
    grads — double-buffered by the pipeline, plus the fits_vmem_mt margin)
    stays inside the budget. ≥ T means the single-block kernels fit and the
    grid is unnecessary."""
    pad = lambda d: -(-d // 128) * 128  # noqa: E731
    A, E = pad(action_size), pad(obs_embed_size)
    HD, LD, HS, LS = pad(hd_dim), pad(ld_dim), pad(hs_size), pad(ls_size)
    lanes = 2 * A + 4 * E + 4 * HD + 4 * LD + 7 * LS + 7 * HS + 6 * 128
    B_pad = -(-B // 8) * 8
    return max(1, budget_bytes // (2 * B_pad * lanes * 4))


# "auto" dispatch policy (set from benchmarks/bench_train_kernel.py --model
# mmtrssm measurements; BASELINE.md records them): B=8 2.687→1.986 ms/step
# (1.35×), B=16 1.32×.
AUTO_MT_TRAIN_KERNEL = True

# Whether "auto" also dispatches shapes past the single-block VMEM fit
# through the time-chunked grid kernels. Measured 2026-08-19, 1× v5e, bf16
# convs, full train step at the first guard-rejected shape: B=32 T=30 XLA
# 4.442 → chunked kernel 3.547 ms/step (**1.252×**) — the round-3 "VMEM
# guard → XLA fallback, 0.99×" regression is gone, so "auto" now keeps the
# kernel everywhere it is eligible (models/mmtrssm.py threads this with
# fits_vmem_mt into the auto flag).
AUTO_MT_TRAIN_KERNEL_CHUNKED = True
