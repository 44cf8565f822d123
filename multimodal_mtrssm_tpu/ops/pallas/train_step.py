"""Pallas TPU kernels: fused MoPoE-MRSSM TRAINING recurrence (fwd + VJP).

The training hot loop (reference ``mopoe_mrssm/core.py:221-256``: per step
Transition MLP → GRUCell → prior head → two posterior-head MLPs → MoPoE
fusion → straight-through categorical sample, 30 sequential iterations) is
the latency floor of the train step at the reference's B=8 — BASELINE.md
measured ~2.1 ms/step with every op-count attack exhausted INSIDE the XLA
scan. This module is the SURVEY §7.7 attack: the whole T-step recurrence as
ONE Pallas program (weights VMEM-resident, loop on-core), plus a second
Pallas program for the hand-derived backward pass, packaged behind
``jax.custom_vjp`` so the kernel sits inside ``jax.grad``.

Differences from the XLA path (``models/mrssm.py::rollout_representation``):

- Randomness is PRE-GENERATED Gumbel noise ([T, B, S] per sample site),
  threaded in as plain inputs. ``jax.random.categorical`` IS Gumbel-argmax,
  so the sampling distribution is identical; only the stream differs (one
  ``jax.random.gumbel`` call outside the kernel vs per-step key splits).
  This keeps the kernel deterministic given inputs — the property the
  equivalence tests and the backward pass rely on.
- The straight-through estimator's backward is explicit: samples carry the
  per-block softmax jacobian (probs path), one-hots carry nothing — exactly
  what autodiff derives for ``onehot + p - stop_gradient(p)``.
- All math f32 (the surrounding f32 islands already force this; bf16
  configs take the XLA path).

Shapes (defaults): A=6 action, S=16 stoch, H=32 hidden, D=32 deter,
E=64 obs embed. The kernel runs the full T loop in one grid step; VMEM
holds inputs+outputs+residuals (~123 KB per [T,B,·] array at T=30, B=8 —
see ``fits_vmem`` for the guard used by the model-level dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_mtrssm_tpu.nn.core import Params

# Packed weight order (all f32) — transition block identical to rollout.py:
#  0 w1  [A+S, H], 1 b1 [H]      action_state_projector layer 0
#  2 w2  [H, H],   3 b2 [H]      action_state_projector layer 1
#  4 wih [H, 3D],  5 bih [3D]    GRU input weights (gate order r, z, n)
#  6 whh [D, 3D],  7 bhh [3D]    GRU hidden weights
#  8 wp1 [D, H],   9 bp1 [H]     rnn_to_prior_projector layer 0
# 10 wp2 [H, S],  11 bp2 [S]     rnn_to_prior_projector layer 1
# 12 wa1 [D+E, H],13 ba1 [H]     audio_representation layer 0
# 14 wa2 [H, S],  15 ba2 [S]     audio_representation layer 1
# 16 wv1 [D+E, H],17 bv1 [H]     vision_representation layer 0
# 18 wv2 [H, S],  19 bv2 [S]     vision_representation layer 1
N_W = 20

# VMEM budget the single-block/chunked dispatch is sized against (module
# level so tests can shrink it to force the chunked path on tiny shapes).
VMEM_BUDGET_BYTES = 10 << 20


def pack_train_params(params: Params) -> tuple[jax.Array, ...]:
    """Extract transition + both posterior-head weights from a MoPoEMRSSM
    param tree (prefix = ``rollout.pack_params`` order)."""
    from multimodal_mtrssm_tpu.ops.pallas.rollout import pack_params

    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    heads = []
    for which in ("audio", "vision"):
        layers = params[f"{which}_representation"]["layers"]
        heads += [f32(layers[0]["w"]), f32(layers[0]["b"]), f32(layers[1]["w"]), f32(layers[1]["b"])]
    return pack_params(params) + tuple(heads)


def unpack_train_grads(model_params: Params, grads: tuple[jax.Array, ...]) -> Params:
    """Scatter packed weight grads back into a MoPoEMRSSM-shaped zero tree
    (helper for tests; the model path uses custom_vjp end-to-end instead)."""
    tree = jax.tree.map(jnp.zeros_like, model_params)
    t = tree["transition"]
    (t["action_state_projector"]["layers"][0]["w"], t["action_state_projector"]["layers"][0]["b"],
     t["action_state_projector"]["layers"][1]["w"], t["action_state_projector"]["layers"][1]["b"],
     t["gru"]["w_ih"], t["gru"]["b_ih"], t["gru"]["w_hh"], t["gru"]["b_hh"],
     t["rnn_to_prior_projector"]["layers"][0]["w"], t["rnn_to_prior_projector"]["layers"][0]["b"],
     t["rnn_to_prior_projector"]["layers"][1]["w"],
     t["rnn_to_prior_projector"]["layers"][1]["b"]) = grads[:12]
    a = tree["audio_representation"]["layers"]
    a[0]["w"], a[0]["b"], a[1]["w"], a[1]["b"] = grads[12:16]
    v = tree["vision_representation"]["layers"]
    v[0]["w"], v[0]["b"], v[1]["w"], v[1]["b"] = grads[16:20]
    return tree


# ---------------------------------------------------------------------------
# Shared math helpers (used by both kernels; plain jnp so they also serve the
# pure-JAX reference implementation in the tests)
# ---------------------------------------------------------------------------


def _elu(x):
    """ELU without expm1 (unimplemented in the Pallas TPU lowering)."""
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _d_elu(pre):
    """ELU derivative from the pre-activation."""
    return jnp.where(pre > 0, 1.0, jnp.exp(pre))


def _log_softmax_full(x):
    """log_softmax over the FULL flat axis (the reference fusion quirk,
    reference ``mopoe_mrssm/core.py:101-102``)."""
    m = jnp.max(x, axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


def _block_probs(logits, class_size, category_size):
    """Per-block softmax of flat logits [B, class*category]."""
    outs = []
    for c in range(class_size):
        lb = logits[:, c * category_size : (c + 1) * category_size]
        m = jnp.max(lb, axis=-1, keepdims=True)
        e = jnp.exp(lb - m)
        outs.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return jnp.concatenate(outs, axis=-1)


def _block_softmax_vjp(probs, g, class_size, category_size):
    """VJP of per-block softmax given its output ``probs``:
    d_logits = p * (g - <p, g>_block). This is the straight-through sample's
    entire gradient (the one-hot term carries none)."""
    outs = []
    for c in range(class_size):
        sl = slice(c * category_size, (c + 1) * category_size)
        p, gb = probs[:, sl], g[:, sl]
        outs.append(p * (gb - jnp.sum(p * gb, axis=-1, keepdims=True)))
    return jnp.concatenate(outs, axis=-1)


def _st_sample(logits, gumbel, class_size, category_size):
    """Straight-through sample VALUE: (onehot + p) - p, matching the XLA
    path's ``onehot + probs - stop_gradient(probs)`` bit-for-bit (same
    association order). Returns (sample, probs). The tie-break sweep is
    shared with the rollout kernels (``rollout.onehot_blocks``)."""
    from multimodal_mtrssm_tpu.ops.pallas.rollout import onehot_blocks

    onehot = onehot_blocks(logits + gumbel, class_size, category_size)
    p = _block_probs(logits, class_size, category_size)
    return (onehot + p) - p, p


from multimodal_mtrssm_tpu.ops.fusion import _LOG_THIRD  # noqa: E402  (exact f32 constant)

# Matmul with the SECOND operand transposed, via dimension numbers (in-kernel
# jnp transposes lower poorly on Mosaic): [B, O] × [I, O]ᵀ → [B, I].
_rdot = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (1,)), ((), ())),
    preferred_element_type=jnp.float32,
)


def _mopoe_forward(a_logits, v_logits):
    """Fusion forward: la/lv (full-axis log-softmax) and the equal-weight
    MoE logsumexp over {A}, {V}, {A+V} with the UNNORMALIZED PoE term
    (reference ``mopoe_mrssm/core.py:86-163`` quirks preserved).
    Returns (mixed, la, lv)."""
    la = _log_softmax_full(a_logits)
    lv = _log_softmax_full(v_logits)
    fused = la + lv
    m = jnp.maximum(jnp.maximum(la, lv), fused)
    mixed = m + _LOG_THIRD + jnp.log(
        jnp.exp(la - m) + jnp.exp(lv - m) + jnp.exp(fused - m)
    )
    return mixed, la, lv


def _mopoe_backward(d_mixed, mixed, la, lv, a_logits, v_logits):
    """VJP of the fusion. Mixture weights are recovered from the forward
    values (w_i = exp(s_i + log⅓ - mixed), Σ=1); then the full-axis
    log-softmax VJP maps d_la/d_lv to logit grads."""
    wa = jnp.exp(la + _LOG_THIRD - mixed)
    wv = jnp.exp(lv + _LOG_THIRD - mixed)
    wf = jnp.exp(la + lv + _LOG_THIRD - mixed)
    d_la = d_mixed * (wa + wf)
    d_lv = d_mixed * (wv + wf)

    def ls_vjp(d_y, x):
        # y = x - LSE(x)  ⇒  d_x = d_y - softmax(x) * Σ d_y
        m = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - m)
        sm = e / jnp.sum(e, axis=-1, keepdims=True)
        return d_y - sm * jnp.sum(d_y, axis=-1, keepdims=True)

    return ls_vjp(d_la, a_logits), ls_vjp(d_lv, v_logits)


def _forward_step(weights, action, a_emb, v_emb, in_deter, in_stoch,
                  g_prior, g_post, class_size, category_size):
    """One recurrence step (shared by fwd kernel / backward recompute /
    pure-JAX reference). Returns the full activation record."""
    (w1, b1, w2, b2, wih, bih, whh, bhh, wp1, bp1, wp2, bp2,
     wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = weights
    D = whh.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    x = jnp.concatenate([action, in_stoch], axis=-1)
    h1_pre = dot(x, w1) + b1
    h1 = _elu(h1_pre)
    x2 = dot(h1, w2) + b2
    gi = dot(x2, wih) + bih
    gh = dot(in_deter, whh) + bhh
    r = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
    z = jax.nn.sigmoid(gi[:, D : 2 * D] + gh[:, D : 2 * D])
    n = jnp.tanh(gi[:, 2 * D :] + r * gh[:, 2 * D :])
    deter = (1.0 - z) * n + z * in_deter
    p1_pre = dot(deter, wp1) + bp1
    p1 = _elu(p1_pre)
    prior_logits = dot(p1, wp2) + bp2
    prior_stoch, prior_probs = _st_sample(prior_logits, g_prior, class_size, category_size)
    xa = jnp.concatenate([deter, a_emb], axis=-1)
    ha_pre = dot(xa, wa1) + ba1
    ha = _elu(ha_pre)
    a_logits = dot(ha, wa2) + ba2
    xv = jnp.concatenate([deter, v_emb], axis=-1)
    hv_pre = dot(xv, wv1) + bv1
    hv = _elu(hv_pre)
    v_logits = dot(hv, wv2) + bv2
    mixed, la, lv = _mopoe_forward(a_logits, v_logits)
    post_stoch, post_probs = _st_sample(mixed, g_post, class_size, category_size)
    return dict(
        x=x, h1_pre=h1_pre, h1=h1, x2=x2, gh=gh, r=r, z=z, n=n, deter=deter,
        p1_pre=p1_pre, p1=p1, prior_logits=prior_logits, prior_stoch=prior_stoch,
        prior_probs=prior_probs, xa=xa, ha_pre=ha_pre, ha=ha, a_logits=a_logits,
        xv=xv, hv_pre=hv_pre, hv=hv, v_logits=v_logits, mixed=mixed, la=la, lv=lv,
        post_stoch=post_stoch, post_probs=post_probs,
    )


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    actions_ref, a_emb_ref, v_emb_ref, init_deter_ref, init_stoch_ref,
    g_prior_ref, g_post_ref,
    *rest,
    T: int, class_size: int, category_size: int,
):
    w_refs, outs = rest[:N_W], rest[N_W:]
    deter_ref, prior_logits_ref, prior_stoch_ref, mixed_ref, post_stoch_ref = outs
    weights = tuple(r[:] for r in w_refs)

    def body(t, carry):
        in_deter, in_stoch = carry
        rec = _forward_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t], in_deter, in_stoch,
            g_prior_ref[t], g_post_ref[t], class_size, category_size,
        )
        deter_ref[t] = rec["deter"]
        prior_logits_ref[t] = rec["prior_logits"]
        prior_stoch_ref[t] = rec["prior_stoch"]
        mixed_ref[t] = rec["mixed"]
        post_stoch_ref[t] = rec["post_stoch"]
        return rec["deter"], rec["post_stoch"]

    jax.lax.fori_loop(0, T, body, (init_deter_ref[:], init_stoch_ref[:]))


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_step(weights, action, a_emb, v_emb, in_deter, in_stoch,
              g_prior, g_post, gouts_t, carry, class_size, category_size):
    """One reverse-time BPTT step (recompute + grads). ``in_deter``/
    ``in_stoch`` are the carry INTO step t (callers pre-shift the stored
    sequences once in XLA). Returns (new_carry2, (d_action, d_a_emb,
    d_v_emb), dw20) — callers accumulate the weight contributions."""
    (w1, b1, w2, b2, wih, bih, whh, bhh, wp1, bp1, wp2, bp2,
     wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = weights
    (gd, gpl, gps, gmx, gpo) = gouts_t
    d_deter_c, d_stoch_c = carry
    D = whh.shape[0]
    A = action.shape[-1]
    # Contract over the batch axis: [in, B] × [B, out] without materializing
    # transposes (x^T g as dot_general).
    tdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw = [None] * N_W
    rec = _forward_step(
        weights, action, a_emb, v_emb, in_deter, in_stoch,
        g_prior, g_post, class_size, category_size,
    )

    # ST posterior sample: output grad + next-step carry, through the
    # per-block softmax jacobian into the mixed logits.
    g_s = gpo + d_stoch_c
    d_mixed = gmx + _block_softmax_vjp(rec["post_probs"], g_s, class_size, category_size)
    d_a_logits, d_v_logits = _mopoe_backward(
        d_mixed, rec["mixed"], rec["la"], rec["lv"], rec["a_logits"], rec["v_logits"]
    )

    # Posterior heads → weight grads + d_emb + deter contribution.
    def head_bwd(d_logits, h, h_pre, xcat, w_hid, w_out, iw1, ib1, iw2, ib2):
        dw[iw2] = tdot(h, d_logits)
        dw[ib2] = jnp.sum(d_logits, axis=0)
        d_h = _rdot(d_logits, w_out) * _d_elu(h_pre)
        dw[iw1] = tdot(xcat, d_h)
        dw[ib1] = jnp.sum(d_h, axis=0)
        d_xcat = _rdot(d_h, w_hid)
        return d_xcat[:, :D], d_xcat[:, D:]

    d_deter_a, d_a_emb = head_bwd(
        d_a_logits, rec["ha"], rec["ha_pre"], rec["xa"], wa1, wa2, 12, 13, 14, 15)
    d_deter_v, d_v_emb = head_bwd(
        d_v_logits, rec["hv"], rec["hv_pre"], rec["xv"], wv1, wv2, 16, 17, 18, 19)

    # Prior head: external logit grad + the prior ST sample's probs path.
    d_prior_logits = gpl + _block_softmax_vjp(
        rec["prior_probs"], gps, class_size, category_size
    )
    dw[10] = tdot(rec["p1"], d_prior_logits)
    dw[11] = jnp.sum(d_prior_logits, axis=0)
    d_p1 = _rdot(d_prior_logits, wp2) * _d_elu(rec["p1_pre"])
    dw[8] = tdot(rec["deter"], d_p1)
    dw[9] = jnp.sum(d_p1, axis=0)
    d_deter_p = _rdot(d_p1, wp1)

    # Total gradient into deter_t: output + future carry + in-step heads.
    g_deter = gd + d_deter_c + d_deter_a + d_deter_v + d_deter_p

    # GRU backward (deter = (1-z)·n + z·in_deter).
    r_, z_, n_ = rec["r"], rec["z"], rec["n"]
    gh_n = rec["gh"][:, 2 * D :]
    d_z = g_deter * (in_deter - n_)
    d_n = g_deter * (1.0 - z_)
    d_pre_n = d_n * (1.0 - n_ * n_)
    d_r = d_pre_n * gh_n
    d_pre_z = d_z * z_ * (1.0 - z_)
    d_pre_r = d_r * r_ * (1.0 - r_)
    d_gi = jnp.concatenate([d_pre_r, d_pre_z, d_pre_n], axis=-1)
    d_gh = jnp.concatenate([d_pre_r, d_pre_z, d_pre_n * r_], axis=-1)
    dw[4] = tdot(rec["x2"], d_gi)
    dw[5] = jnp.sum(d_gi, axis=0)
    dw[6] = tdot(in_deter, d_gh)
    dw[7] = jnp.sum(d_gh, axis=0)
    d_x2 = _rdot(d_gi, wih)
    d_in_deter = g_deter * z_ + _rdot(d_gh, whh)

    # action_state_projector backward.
    dw[2] = tdot(rec["h1"], d_x2)
    dw[3] = jnp.sum(d_x2, axis=0)
    d_h1 = _rdot(d_x2, w2) * _d_elu(rec["h1_pre"])
    dw[0] = tdot(rec["x"], d_h1)
    dw[1] = jnp.sum(d_h1, axis=0)
    d_x = _rdot(d_h1, w1)
    new_carry = (d_in_deter, d_x[:, A:])
    return new_carry, (d_x[:, :A], d_a_emb, d_v_emb), tuple(dw)


def _bwd_kernel(
    # residual inputs: prev_* are the SHIFTED stored sequences (carry INTO
    # step t — callers pre-shift, so no t==0 branch per iteration)
    actions_ref, a_emb_ref, v_emb_ref,
    g_prior_ref, g_post_ref, prev_deter_ref, prev_stoch_ref,
    *rest,
    T: int, class_size: int, category_size: int,
):
    w_refs = rest[:N_W]
    gouts = rest[N_W : N_W + 5]
    out_w_refs = rest[N_W + 5 : 2 * N_W + 5]
    d_actions_ref, d_a_emb_ref, d_v_emb_ref, d_init_deter_ref, d_init_stoch_ref = rest[2 * N_W + 5 :]
    weights = tuple(r[:] for r in w_refs)

    for r in out_w_refs:
        r[:] = jnp.zeros_like(r)

    def body(i, carry):
        t = T - 1 - i
        new_carry, d_ins, dw = _bwd_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t],
            prev_deter_ref[t], prev_stoch_ref[t],
            g_prior_ref[t], g_post_ref[t],
            tuple(g[t] for g in gouts), carry, class_size, category_size,
        )
        for r, contrib in zip(out_w_refs, dw):
            r[:] += contrib
        d_actions_ref[t], d_a_emb_ref[t], d_v_emb_ref[t] = d_ins
        return new_carry

    B = actions_ref.shape[1]
    zero_d = jnp.zeros((B, d_init_deter_ref.shape[-1]), jnp.float32)
    zero_s = jnp.zeros((B, d_init_stoch_ref.shape[-1]), jnp.float32)
    d_init_deter, d_init_stoch = jax.lax.fori_loop(0, T, body, (zero_d, zero_s))
    d_init_deter_ref[:] = d_init_deter
    d_init_stoch_ref[:] = d_init_stoch


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _fwd_call(packed, actions, a_emb, v_emb, init_deter, init_stoch,
              g_prior, g_post, class_size, category_size, interpret):
    T, B, _ = actions.shape
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]
    tc = chunk_len(B, VMEM_BUDGET_BYTES, action_size=actions.shape[-1],
                   stoch_size=S, deter_size=D, obs_embed_size=a_emb.shape[-1])
    if tc < T:
        return _fwd_call_chunked(
            packed, actions, a_emb, v_emb, init_deter, init_stoch,
            g_prior, g_post, tc, class_size, category_size, interpret)
    kernel = functools.partial(
        _fwd_kernel, T=T, class_size=class_size, category_size=category_size
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((T, B, d), jnp.float32) for d in (D, S, S, S, S)
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[_vmem_spec()] * (7 + N_W),
        out_specs=tuple(_vmem_spec() for _ in range(5)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post, *packed)


def _bwd_call(packed, actions, a_emb, v_emb, init_deter, init_stoch,
              g_prior, g_post, deter_seq, post_stoch_seq, gouts,
              class_size, category_size, interpret):
    T, B, A = actions.shape
    E = a_emb.shape[-1]
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]
    # prev_*[t] = the carry INTO step t (init at t=0, stored seq after).
    prev_deter = jnp.concatenate([init_deter[None], deter_seq[:-1]], axis=0)
    prev_stoch = jnp.concatenate([init_stoch[None], post_stoch_seq[:-1]], axis=0)
    tc = chunk_len(B, VMEM_BUDGET_BYTES, action_size=A, stoch_size=S,
                   deter_size=D, obs_embed_size=E)
    if tc < T:
        return _bwd_call_chunked(
            packed, actions, a_emb, v_emb, g_prior, g_post,
            prev_deter, prev_stoch, gouts, tc, class_size, category_size,
            interpret)
    kernel = functools.partial(
        _bwd_kernel, T=T, class_size=class_size, category_size=category_size
    )
    out_shape = (
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed)
        + (
            jax.ShapeDtypeStruct((T, B, A), jnp.float32),
            jax.ShapeDtypeStruct((T, B, E), jnp.float32),
            jax.ShapeDtypeStruct((T, B, E), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        )
    )
    n_in = 7 + N_W + 5
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[_vmem_spec()] * n_in,
        out_specs=tuple(_vmem_spec() for _ in range(N_W + 5)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        actions, a_emb, v_emb, g_prior, g_post, prev_deter, prev_stoch,
        *packed, *gouts,
    )
    d_packed = tuple(outs[:N_W])
    d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch = outs[N_W:]
    return d_packed, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch


# ---------------------------------------------------------------------------
# Time-chunked variants (same design as train_step_mt.py: one sequential
# Pallas grid dimension streams [Tc, B, .] blocks through VMEM while the
# BPTT carry persists in scratch and weight grads accumulate into revisited
# constant-index output blocks - so oversized [T, B] no longer forces the
# XLA fallback)
# ---------------------------------------------------------------------------


def _fwd_kernel_chunked(
    actions_ref, a_emb_ref, v_emb_ref, init_deter_ref, init_stoch_ref,
    g_prior_ref, g_post_ref,
    *rest,
    Tc: int, class_size: int, category_size: int,
):
    w_refs = rest[:N_W]
    outs = rest[N_W : N_W + 5]
    deter_c_ref, stoch_c_ref = rest[N_W + 5 :]  # scratch carries
    deter_ref, prior_logits_ref, prior_stoch_ref, mixed_ref, post_stoch_ref = outs
    weights = tuple(r[:] for r in w_refs)

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        deter_c_ref[:] = init_deter_ref[:]
        stoch_c_ref[:] = init_stoch_ref[:]

    def body(t, carry):
        in_deter, in_stoch = carry
        rec = _forward_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t], in_deter, in_stoch,
            g_prior_ref[t], g_post_ref[t], class_size, category_size,
        )
        deter_ref[t] = rec["deter"]
        prior_logits_ref[t] = rec["prior_logits"]
        prior_stoch_ref[t] = rec["prior_stoch"]
        mixed_ref[t] = rec["mixed"]
        post_stoch_ref[t] = rec["post_stoch"]
        return rec["deter"], rec["post_stoch"]

    deter, stoch = jax.lax.fori_loop(
        0, Tc, body, (deter_c_ref[:], stoch_c_ref[:]))
    deter_c_ref[:] = deter
    stoch_c_ref[:] = stoch


def _bwd_kernel_chunked(
    actions_ref, a_emb_ref, v_emb_ref,
    g_prior_ref, g_post_ref, prev_deter_ref, prev_stoch_ref,
    *rest,
    Tc: int, n_chunks: int, class_size: int, category_size: int,
):
    w_refs = rest[:N_W]
    gouts = rest[N_W : N_W + 5]
    out_w_refs = rest[N_W + 5 : 2 * N_W + 5]
    (d_actions_ref, d_a_emb_ref, d_v_emb_ref,
     d_init_deter_ref, d_init_stoch_ref) = rest[2 * N_W + 5 : 2 * N_W + 10]
    deter_c_ref, stoch_c_ref = rest[2 * N_W + 10 :]  # scratch carries
    weights = tuple(r[:] for r in w_refs)
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        for r in out_w_refs:
            r[:] = jnp.zeros_like(r)
        deter_c_ref[:] = jnp.zeros_like(deter_c_ref)
        stoch_c_ref[:] = jnp.zeros_like(stoch_c_ref)

    def body(i, carry):
        t = Tc - 1 - i
        new_carry, d_ins, dw = _bwd_step(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t],
            prev_deter_ref[t], prev_stoch_ref[t],
            g_prior_ref[t], g_post_ref[t],
            tuple(go[t] for go in gouts), carry, class_size, category_size,
        )
        for r, contrib in zip(out_w_refs, dw):
            r[:] += contrib
        d_actions_ref[t], d_a_emb_ref[t], d_v_emb_ref[t] = d_ins
        return new_carry

    deter, stoch = jax.lax.fori_loop(
        0, Tc, body, (deter_c_ref[:], stoch_c_ref[:]))
    deter_c_ref[:] = deter
    stoch_c_ref[:] = stoch

    @pl.when(g == n_chunks - 1)
    def _emit_init_grads():
        d_init_deter_ref[:] = deter_c_ref[:]
        d_init_stoch_ref[:] = stoch_c_ref[:]


def _pad_t(x, T_pad):
    t = x.shape[0]
    return x if t == T_pad else jnp.pad(x, ((0, T_pad - t),) + ((0, 0),) * (x.ndim - 1))


def _fwd_call_chunked(packed, actions, a_emb, v_emb, init_deter, init_stoch,
                      g_prior, g_post, tc, class_size, category_size, interpret):
    T, B, _ = actions.shape
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]
    n = -(-T // tc)
    T_pad = n * tc
    seq_in = tuple(_pad_t(x, T_pad) for x in (actions, a_emb, v_emb, g_prior, g_post))
    kernel = functools.partial(
        _fwd_kernel_chunked, Tc=tc, class_size=class_size, category_size=category_size
    )
    chunk = lambda x: pl.BlockSpec(  # noqa: E731
        (tc,) + x.shape[1:], lambda i: (i,) + (0,) * (x.ndim - 1))
    whole = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i, _nd=x.ndim: (0,) * _nd)
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((T_pad, B, d), jnp.float32) for d in (D, S, S, S, S)),
        in_specs=(
            [chunk(seq_in[0]), chunk(seq_in[1]), chunk(seq_in[2])]
            + [whole(init_deter), whole(init_stoch)]
            + [chunk(seq_in[3]), chunk(seq_in[4])]
            + [whole(w) for w in packed]
        ),
        out_specs=tuple(
            pl.BlockSpec((tc, B, d), lambda i: (i, 0, 0)) for d in (D, S, S, S, S)),
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((B, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seq_in[0], seq_in[1], seq_in[2], init_deter, init_stoch,
      seq_in[3], seq_in[4], *packed)
    return tuple(o[:T] for o in outs)


def _bwd_call_chunked(packed, actions, a_emb, v_emb, g_prior, g_post,
                      prev_deter, prev_stoch, gouts, tc,
                      class_size, category_size, interpret):
    T, B, A = actions.shape
    E = a_emb.shape[-1]
    D = prev_deter.shape[-1]
    S = prev_stoch.shape[-1]
    n = -(-T // tc)
    T_pad = n * tc
    seq_in = tuple(
        _pad_t(x, T_pad)
        for x in (actions, a_emb, v_emb, g_prior, g_post, prev_deter, prev_stoch)
        + tuple(gouts)
    )
    # Grid step i processes chunk n-1-i (reverse time; padded-tail chunk
    # first - its zero cotangents contribute zero, so the carry stays zero
    # until real steps).
    kernel = functools.partial(
        _bwd_kernel_chunked, Tc=tc, n_chunks=n,
        class_size=class_size, category_size=category_size,
    )
    rchunk = lambda x: pl.BlockSpec(  # noqa: E731
        (tc,) + x.shape[1:], lambda i, _n=n: (_n - 1 - i,) + (0,) * (x.ndim - 1))
    whole = lambda x: pl.BlockSpec(  # noqa: E731
        x.shape, lambda i, _nd=x.ndim: (0,) * _nd)
    out_shape = (
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed)
        + (jax.ShapeDtypeStruct((T_pad, B, A), jnp.float32),
           jax.ShapeDtypeStruct((T_pad, B, E), jnp.float32),
           jax.ShapeDtypeStruct((T_pad, B, E), jnp.float32),
           jax.ShapeDtypeStruct((B, D), jnp.float32),
           jax.ShapeDtypeStruct((B, S), jnp.float32))
    )
    out_specs = (
        tuple(whole(w) for w in packed)  # weight grads: revisited accumulators
        + (rchunk(seq_in[0]), rchunk(seq_in[1]), rchunk(seq_in[2]))
        + (pl.BlockSpec((B, D), lambda i: (0, 0)),
           pl.BlockSpec((B, S), lambda i: (0, 0)))
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        out_shape=out_shape,
        in_specs=(
            [rchunk(x) for x in seq_in[:7]]
            + [whole(w) for w in packed]
            + [rchunk(x) for x in seq_in[7:]]
        ),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((B, D), jnp.float32),
                        pltpu.VMEM((B, S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*seq_in[:7], *packed, *seq_in[7:])
    d_packed = tuple(outs[:N_W])
    d_actions, d_a_emb, d_v_emb = (o[:T] for o in outs[N_W : N_W + 3])
    d_init_deter, d_init_stoch = outs[N_W + 3 :]
    return d_packed, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch


@functools.lru_cache(maxsize=None)
def _make_fused(class_size: int, category_size: int, interpret: bool):
    @jax.custom_vjp
    def fused(packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post):
        return _fwd_call(packed, actions, a_emb, v_emb, init_deter, init_stoch,
                         g_prior, g_post, class_size, category_size, interpret)

    def fwd(packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post):
        outs = fused(packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post)
        deter_seq, _, _, _, post_stoch_seq = outs
        res = (packed, actions, a_emb, v_emb, init_deter, init_stoch,
               g_prior, g_post, deter_seq, post_stoch_seq)
        return outs, res

    def bwd(res, gouts):
        (packed, actions, a_emb, v_emb, init_deter, init_stoch,
         g_prior, g_post, deter_seq, post_stoch_seq) = res
        # Upstream cotangents: (deter, prior_logits, prior_stoch, mixed,
        # post_stoch). None → zeros (jax passes zeros already for unused).
        d_packed, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch = _bwd_call(
            packed, actions, a_emb, v_emb, init_deter, init_stoch,
            g_prior, g_post, deter_seq, post_stoch_seq, tuple(gouts),
            class_size, category_size, interpret,
        )
        return (d_packed, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch,
                jnp.zeros_like(g_prior), jnp.zeros_like(g_post))

    fused.defvjp(fwd, bwd)
    return fused


def fused_train_recurrence(
    packed: tuple[jax.Array, ...],
    actions: jax.Array,     # [T, B, A] time-major f32
    a_emb: jax.Array,       # [T, B, E]
    v_emb: jax.Array,       # [T, B, E]
    init_deter: jax.Array,  # [B, D]
    init_stoch: jax.Array,  # [B, S]
    g_prior: jax.Array,     # [T, B, S] standard Gumbel noise
    g_post: jax.Array,      # [T, B, S]
    class_size: int = 4,
    category_size: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, ...]:
    """Fused, differentiable training recurrence.

    Returns time-major ``(deter, prior_logits, prior_stoch, mixed_logits,
    post_stoch)``, each ``[T, B, ·]`` — the full per-step record
    ``rollout_representation`` needs to build its posterior/prior States.
    """
    fn = _make_fused(class_size, category_size, interpret)
    return fn(packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post)


def reference_train_recurrence(
    packed: jax.Array, actions: jax.Array, a_emb: jax.Array, v_emb: jax.Array,
    init_deter: jax.Array, init_stoch: jax.Array, g_prior: jax.Array,
    g_post: jax.Array, class_size: int = 4, category_size: int = 4,
) -> tuple:
    """Pure-JAX twin of the kernel (same math, ``lax.scan``): the
    equivalence/grad oracle for the tests, differentiable by autodiff."""

    def step(carry, xs):
        in_deter, in_stoch = carry
        action, ae, ve, gp, gq = xs
        rec = _forward_step(packed, action, ae, ve, in_deter, in_stoch,
                            gp, gq, class_size, category_size)
        # Re-inject the ST estimator for autodiff: sample value stays the
        # kernel's, gradient flows through the probs path only.
        prior_st = jax.lax.stop_gradient(rec["prior_stoch"] - rec["prior_probs"]) + rec["prior_probs"]
        post_st = jax.lax.stop_gradient(rec["post_stoch"] - rec["post_probs"]) + rec["post_probs"]
        ys = (rec["deter"], rec["prior_logits"], prior_st, rec["mixed"], post_st)
        return (rec["deter"], post_st), ys

    _, ys = jax.lax.scan(step, (init_deter, init_stoch),
                         (actions, a_emb, v_emb, g_prior, g_post))
    return ys


def fits_vmem(
    T: int,
    B: int,
    budget_bytes: int = 10 << 20,
    *,
    action_size: int = 6,
    stoch_size: int = 16,
    deter_size: int = 32,
    obs_embed_size: int = 64,
) -> bool:
    """Conservative VMEM guard for the single-program kernel, sized from
    the actual feature dims (each pads to ``ceil(d/128)`` 128-lane tiles;
    a flat one-tile-per-array estimate would under-count configs with
    deter/obs_embed > 128 and dispatch a kernel whose backward fails to
    fit). The backward pass is the larger program; its [T, B, ·] residency
    is 15 arrays — inputs (actions A, embeds E×2, gumbels S×2, deter_seq D,
    post_stoch_seq S), output grads (D + S×4), input grads (A + E×2) —
    plus 2 lane-tiles of margin for per-step scratch (at the default dims
    this reproduces the previously calibrated 17-tile estimate exactly)."""
    pad = lambda d: -(-d // 128) * 128  # noqa: E731
    A, S, D, E = pad(action_size), pad(stoch_size), pad(deter_size), pad(obs_embed_size)
    lanes = 2 * A + 4 * E + 7 * S + 2 * D + 2 * 128
    B_pad = -(-B // 8) * 8
    return T * B_pad * lanes * 4 <= budget_bytes


def chunk_len(
    B: int,
    budget_bytes: int = 10 << 20,
    *,
    action_size: int = 6,
    stoch_size: int = 16,
    deter_size: int = 32,
    obs_embed_size: int = 64,
) -> int:
    """Time-chunk length for the grid-chunked kernels: the largest Tc whose
    per-grid-step VMEM residency (15 blocked [Tc, B, ·] arrays in the
    backward — inputs, gumbels, shifted carries, output cotangents, input
    grads — double-buffered by the pipeline, plus the fits_vmem margin)
    stays inside the budget. ≥ T means the single-block kernels fit."""
    pad = lambda d: -(-d // 128) * 128  # noqa: E731
    A, S = pad(action_size), pad(stoch_size)
    D, E = pad(deter_size), pad(obs_embed_size)
    lanes = 2 * A + 4 * E + 7 * S + 2 * D + 2 * 128
    B_pad = -(-B // 8) * 8
    return max(1, budget_bytes // (2 * B_pad * lanes * 4))


# "auto" dispatch policy for MRSSMConfig(use_pallas_train="auto"): whether
# the measured kernel beats the XLA scan on TPU at eligible shapes. Set from
# benchmarks/bench_train_kernel.py measurements (BASELINE.md records them):
# 2026-08-17, 1× v5e, full train step in the K=32-scan harness —
# B=8 T=30: XLA 2.071 ms/step, kernel 1.835 ms/step (1.13×).
AUTO_TRAIN_KERNEL = True

# Whether "auto" also dispatches shapes PAST the single-block VMEM fit
# through the time-chunked grid kernels (the [Tc, B, ·] streaming fwd/bwd
# variants above). Measured 2026-08-19, 1× v5e, bf16 convs, full train
# step: B=128 T=30 XLA 12.341 → chunked kernel 11.714 ms/step (1.054×) —
# a win at the first shape the single-block guard rejects, so "auto" no
# longer forfeits the kernel at production batch.
AUTO_TRAIN_KERNEL_CHUNKED = True
