"""Stacked-layout variant of the fused MoPoE-MRSSM training kernel.

VERDICT r3 item 5: the fused train step floors at ~0.97 ms/step — ~32 µs
per timestep for ~10 tiny matmuls ([8,38]×[38,32] scale, far below one MXU
tile), i.e. the floor is op-ISSUE latency, not FLOPs. This variant attacks
the issue count directly by folding weight blocks so each step runs FEWER,
slightly larger matmuls — identical math (zero blocks contribute exact
0.0 terms; nonzero-row accumulation order is preserved):

- the three state heads (rnn_to_prior + audio/vision representation) fold
  into TWO stacked matmuls: ``xc = [deter|a_emb|v_emb] [B, D+2E]`` times a
  block matrix ``Wc1 [D+2E, 3H]`` (zero off-blocks), then
  ``hc [B, 3H] × Wc2 [3H, 3S]`` (block-diagonal) — replacing 6 matmuls;
- the GRU gate pair folds into ONE ``[x2|deter] [B, H+D] × Wg [H+D, 6D]``
  block-diagonal matmul producing ``[gi|gh]`` — replacing 2.

Per-step matmul count: forward 10 → 5, backward ~30 → ~15 (weight-grad
contractions fold the same way; the zero blocks of ``d_Wc1``/``d_Wg``
receive garbage that the unstack SLICES AWAY, so every returned gradient
is exact — pinned against autodiff in tests/test_pallas_train_stacked.py).

External contract matches ``train_step.fused_train_recurrence`` exactly
(same packed 20-tuple in, same outputs, same gradient layout out), so the
model dispatch can A/B the two kernels; stacking happens once per train
step outside the T loop (weight-sized reshuffles, fused by XLA).

Reference provenance: same recurrence as ``train_step.py`` (reference
``mopoe_mrssm/core.py:221-256``); this file changes only the on-core
schedule, not semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_mtrssm_tpu.ops.pallas.train_step import (
    _block_softmax_vjp,
    _d_elu,
    _elu,
    _mopoe_backward,
    _mopoe_forward,
    _rdot,
    _st_sample,
)

# Stacked weight order:
#  0 w1  [A+S, H], 1 b1 [H]     action_state_projector layer 0 (unchanged)
#  2 w2  [H, H],   3 b2 [H]     action_state_projector layer 1 (unchanged)
#  4 wg  [H+D, 6D], 5 bg [6D]   GRU gates: block-diag(w_ih, w_hh), [b_ih|b_hh]
#  6 wc1 [D+2E, 3H], 7 bc1 [3H] heads layer 0: cols [prior|audio|vision]
#  8 wc2 [3H, 3S],  9 bc2 [3S]  heads layer 1: block-diag(wp2, wa2, wv2)
N_WS = 10


def stack_train_params(packed: tuple[jax.Array, ...]) -> tuple[jax.Array, ...]:
    """Fold a ``train_step.pack_train_params`` 20-tuple into the stacked
    10-tuple layout. Pure jnp — jitted into the train step, runs once per
    step outside the T loop."""
    (w1, b1, w2, b2, wih, bih, whh, bhh, wp1, bp1, wp2, bp2,
     wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = packed
    H = w2.shape[1]
    D = whh.shape[0]
    E = wa1.shape[0] - D
    S = wp2.shape[1]
    f32 = jnp.float32

    z = jnp.zeros
    # GRU gates: [x2 | in_deter] [B, H+D] @ wg → [gi | gh] [B, 6D].
    wg = jnp.concatenate([
        jnp.concatenate([wih, z((H, 3 * D), f32)], axis=1),
        jnp.concatenate([z((D, 3 * D), f32), whh], axis=1),
    ], axis=0)
    bg = jnp.concatenate([bih, bhh])

    # Heads layer 0: xc = [deter | a_emb | v_emb] [B, D+2E] @ wc1 → [B, 3H].
    # Column blocks: prior (deter rows only), audio (deter + a_emb rows),
    # vision (deter + v_emb rows).
    wc1 = jnp.concatenate([
        jnp.concatenate([wp1, wa1[:D], wv1[:D]], axis=1),          # deter rows
        jnp.concatenate([z((E, H), f32), wa1[D:], z((E, H), f32)], axis=1),
        jnp.concatenate([z((E, H), f32), z((E, H), f32), wv1[D:]], axis=1),
    ], axis=0)
    bc1 = jnp.concatenate([bp1, ba1, bv1])

    # Heads layer 1: hc [B, 3H] @ wc2 → [prior|audio|vision] logits [B, 3S].
    wc2 = jnp.concatenate([
        jnp.concatenate([wp2, z((H, S), f32), z((H, S), f32)], axis=1),
        jnp.concatenate([z((H, S), f32), wa2, z((H, S), f32)], axis=1),
        jnp.concatenate([z((H, S), f32), z((H, S), f32), wv2], axis=1),
    ], axis=0)
    bc2 = jnp.concatenate([bp2, ba2, bv2])

    return (w1, b1, w2, b2, wg, bg, wc1, bc1, wc2, bc2)


def unstack_train_grads(
    d_stacked: tuple[jax.Array, ...], dims: tuple[int, int, int, int],
) -> tuple[jax.Array, ...]:
    """Slice stacked-weight gradients back to the 20-tuple layout. The zero
    blocks of the stacked matrices received garbage contractions in the
    backward — slicing discards them, making every returned grad exact."""
    (d_w1, d_b1, d_w2, d_b2, d_wg, d_bg, d_wc1, d_bc1, d_wc2, d_bc2) = d_stacked
    _, H, D, E = dims
    S = d_wc2.shape[1] // 3
    d_wih = d_wg[:H, : 3 * D]
    d_bih = d_bg[: 3 * D]
    d_whh = d_wg[H:, 3 * D :]
    d_bhh = d_bg[3 * D :]
    d_wp1 = d_wc1[:D, :H]
    d_wa1 = jnp.concatenate([d_wc1[:D, H : 2 * H], d_wc1[D : D + E, H : 2 * H]], axis=0)
    d_wv1 = jnp.concatenate([d_wc1[:D, 2 * H :], d_wc1[D + E :, 2 * H :]], axis=0)
    d_bp1, d_ba1, d_bv1 = d_bc1[:H], d_bc1[H : 2 * H], d_bc1[2 * H :]
    d_wp2 = d_wc2[:H, :S]
    d_wa2 = d_wc2[H : 2 * H, S : 2 * S]
    d_wv2 = d_wc2[2 * H :, 2 * S :]
    d_bp2, d_ba2, d_bv2 = d_bc2[:S], d_bc2[S : 2 * S], d_bc2[2 * S :]
    return (d_w1, d_b1, d_w2, d_b2, d_wih, d_bih, d_whh, d_bhh,
            d_wp1, d_bp1, d_wp2, d_bp2, d_wa1, d_ba1, d_wa2, d_ba2,
            d_wv1, d_bv1, d_wv2, d_bv2)


def _forward_step_stacked(weights, action, a_emb, v_emb, in_deter, in_stoch,
                          g_prior, g_post, class_size, category_size):
    """One recurrence step on the stacked layout (5 matmuls)."""
    (w1, b1, w2, b2, wg, bg, wc1, bc1, wc2, bc2) = weights
    H = w2.shape[1]
    D = wg.shape[0] - H
    S = wc2.shape[1] // 3
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    x = jnp.concatenate([action, in_stoch], axis=-1)
    h1_pre = dot(x, w1) + b1
    h1 = _elu(h1_pre)
    x2 = dot(h1, w2) + b2
    gg = dot(jnp.concatenate([x2, in_deter], axis=-1), wg) + bg
    gi, gh = gg[:, : 3 * D], gg[:, 3 * D :]
    r = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
    z = jax.nn.sigmoid(gi[:, D : 2 * D] + gh[:, D : 2 * D])
    n = jnp.tanh(gi[:, 2 * D :] + r * gh[:, 2 * D :])
    deter = (1.0 - z) * n + z * in_deter
    xc = jnp.concatenate([deter, a_emb, v_emb], axis=-1)
    hc_pre = dot(xc, wc1) + bc1
    hc = _elu(hc_pre)
    logits_c = dot(hc, wc2) + bc2
    prior_logits = logits_c[:, :S]
    a_logits = logits_c[:, S : 2 * S]
    v_logits = logits_c[:, 2 * S :]
    prior_stoch, prior_probs = _st_sample(prior_logits, g_prior, class_size, category_size)
    mixed, la, lv = _mopoe_forward(a_logits, v_logits)
    post_stoch, post_probs = _st_sample(mixed, g_post, class_size, category_size)
    return dict(
        x=x, h1_pre=h1_pre, h1=h1, x2=x2, gh=gh, r=r, z=z, n=n, deter=deter,
        xc=xc, hc_pre=hc_pre, hc=hc, prior_logits=prior_logits,
        prior_stoch=prior_stoch, prior_probs=prior_probs,
        a_logits=a_logits, v_logits=v_logits, mixed=mixed, la=la, lv=lv,
        post_stoch=post_stoch, post_probs=post_probs,
    )


def _fwd_kernel_stacked(
    actions_ref, a_emb_ref, v_emb_ref, init_deter_ref, init_stoch_ref,
    g_prior_ref, g_post_ref,
    *rest,
    T: int, class_size: int, category_size: int,
):
    w_refs, outs = rest[:N_WS], rest[N_WS:]
    deter_ref, prior_logits_ref, prior_stoch_ref, mixed_ref, post_stoch_ref = outs
    weights = tuple(r[:] for r in w_refs)

    def body(t, carry):
        in_deter, in_stoch = carry
        rec = _forward_step_stacked(
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


def _bwd_kernel_stacked(
    actions_ref, a_emb_ref, v_emb_ref, init_deter_ref, init_stoch_ref,
    g_prior_ref, g_post_ref, deter_seq_ref, post_stoch_seq_ref,
    *rest,
    T: int, class_size: int, category_size: int,
):
    w_refs = rest[:N_WS]
    (gd_ref, gpl_ref, gps_ref, gmx_ref, gpo_ref) = rest[N_WS : N_WS + 5]
    out_w_refs = rest[N_WS + 5 : 2 * N_WS + 5]
    d_actions_ref, d_a_emb_ref, d_v_emb_ref, d_init_deter_ref, d_init_stoch_ref = (
        rest[2 * N_WS + 5 :]
    )
    weights = tuple(r[:] for r in w_refs)
    (w1, b1, w2, b2, wg, bg, wc1, bc1, wc2, bc2) = weights
    H = w2.shape[1]
    D = wg.shape[0] - H
    A = actions_ref.shape[-1]
    E = a_emb_ref.shape[-1]
    tdot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    for r in out_w_refs:
        r[:] = jnp.zeros_like(r)

    init_deter = init_deter_ref[:]
    init_stoch = init_stoch_ref[:]

    def body(i, carry):
        d_deter_c, d_stoch_c = carry
        t = T - 1 - i
        prev = jnp.maximum(t - 1, 0)
        in_deter = jnp.where(t == 0, init_deter, deter_seq_ref[prev])
        in_stoch = jnp.where(t == 0, init_stoch, post_stoch_seq_ref[prev])
        rec = _forward_step_stacked(
            weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t], in_deter, in_stoch,
            g_prior_ref[t], g_post_ref[t], class_size, category_size,
        )

        # ST posterior sample → fusion → head logits.
        g_s = gpo_ref[t] + d_stoch_c
        d_mixed = gmx_ref[t] + _block_softmax_vjp(
            rec["post_probs"], g_s, class_size, category_size)
        d_a_logits, d_v_logits = _mopoe_backward(
            d_mixed, rec["mixed"], rec["la"], rec["lv"],
            rec["a_logits"], rec["v_logits"],
        )
        d_prior_logits = gpl_ref[t] + _block_softmax_vjp(
            rec["prior_probs"], gps_ref[t], class_size, category_size)

        # Stacked heads backward: one [B, 3S] cotangent through both layers.
        d_logits_c = jnp.concatenate([d_prior_logits, d_a_logits, d_v_logits], axis=-1)
        out_w_refs[8][:] += tdot(rec["hc"], d_logits_c)
        out_w_refs[9][:] += jnp.sum(d_logits_c, axis=0)
        d_hc = _rdot(d_logits_c, wc2) * _d_elu(rec["hc_pre"])
        out_w_refs[6][:] += tdot(rec["xc"], d_hc)
        out_w_refs[7][:] += jnp.sum(d_hc, axis=0)
        d_xc = _rdot(d_hc, wc1)
        d_a_emb_ref[t] = d_xc[:, D : D + E]
        d_v_emb_ref[t] = d_xc[:, D + E :]

        # Total gradient into deter_t: output + future carry + all heads
        # (d_xc's deter columns accumulate prior+audio+vision in one slice).
        g_deter = gd_ref[t] + d_deter_c + d_xc[:, :D]

        # GRU backward (deter = (1-z)·n + z·in_deter), stacked gate matmul.
        r_, z_, n_ = rec["r"], rec["z"], rec["n"]
        gh_n = rec["gh"][:, 2 * D :]
        d_z = g_deter * (in_deter - n_)
        d_n = g_deter * (1.0 - z_)
        d_pre_n = d_n * (1.0 - n_ * n_)
        d_r = d_pre_n * gh_n
        d_pre_z = d_z * z_ * (1.0 - z_)
        d_pre_r = d_r * r_ * (1.0 - r_)
        d_gg = jnp.concatenate(
            [d_pre_r, d_pre_z, d_pre_n, d_pre_r, d_pre_z, d_pre_n * r_], axis=-1)
        x2d = jnp.concatenate([rec["x2"], in_deter], axis=-1)
        out_w_refs[4][:] += tdot(x2d, d_gg)
        out_w_refs[5][:] += jnp.sum(d_gg, axis=0)
        d_x2d = _rdot(d_gg, wg)
        d_x2 = d_x2d[:, :H]
        d_in_deter = g_deter * z_ + d_x2d[:, H:]

        # action_state_projector backward (unchanged layout).
        out_w_refs[2][:] += tdot(rec["h1"], d_x2)
        out_w_refs[3][:] += jnp.sum(d_x2, axis=0)
        d_h1 = _rdot(d_x2, w2) * _d_elu(rec["h1_pre"])
        out_w_refs[0][:] += tdot(rec["x"], d_h1)
        out_w_refs[1][:] += jnp.sum(d_h1, axis=0)
        d_x = _rdot(d_h1, w1)
        d_actions_ref[t] = d_x[:, :A]
        return d_in_deter, d_x[:, A:]

    zero_d = jnp.zeros_like(init_deter)
    zero_s = jnp.zeros_like(init_stoch)
    d_init_deter, d_init_stoch = jax.lax.fori_loop(0, T, body, (zero_d, zero_s))
    d_init_deter_ref[:] = d_init_deter
    d_init_stoch_ref[:] = d_init_stoch


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _fwd_call(stacked, actions, a_emb, v_emb, init_deter, init_stoch,
              g_prior, g_post, class_size, category_size, interpret):
    T, B, _ = actions.shape
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]
    kernel = functools.partial(
        _fwd_kernel_stacked, T=T, class_size=class_size, category_size=category_size
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((T, B, d), jnp.float32) for d in (D, S, S, S, S)
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[_vmem_spec()] * (7 + N_WS),
        out_specs=tuple(_vmem_spec() for _ in range(5)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post, *stacked)


def _bwd_call(stacked, actions, a_emb, v_emb, init_deter, init_stoch,
              g_prior, g_post, deter_seq, post_stoch_seq, gouts,
              class_size, category_size, interpret):
    T, B, A = actions.shape
    E = a_emb.shape[-1]
    D = init_deter.shape[-1]
    S = init_stoch.shape[-1]
    kernel = functools.partial(
        _bwd_kernel_stacked, T=T, class_size=class_size, category_size=category_size
    )
    out_shape = (
        tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in stacked)
        + (
            jax.ShapeDtypeStruct((T, B, A), jnp.float32),
            jax.ShapeDtypeStruct((T, B, E), jnp.float32),
            jax.ShapeDtypeStruct((T, B, E), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, S), jnp.float32),
        )
    )
    n_in = 9 + N_WS + 5
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[_vmem_spec()] * n_in,
        out_specs=tuple(_vmem_spec() for _ in range(N_WS + 5)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(
        actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post,
        deter_seq, post_stoch_seq, *stacked, *gouts,
    )
    d_stacked = tuple(outs[:N_WS])
    d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch = outs[N_WS:]
    return d_stacked, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch


@functools.lru_cache(maxsize=None)
def _make_fused_stacked(class_size: int, category_size: int, interpret: bool):
    @jax.custom_vjp
    def fused(stacked, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post):
        return _fwd_call(stacked, actions, a_emb, v_emb, init_deter, init_stoch,
                         g_prior, g_post, class_size, category_size, interpret)

    def fwd(stacked, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post):
        outs = fused(stacked, actions, a_emb, v_emb, init_deter, init_stoch,
                     g_prior, g_post)
        deter_seq, _, _, _, post_stoch_seq = outs
        res = (stacked, actions, a_emb, v_emb, init_deter, init_stoch,
               g_prior, g_post, deter_seq, post_stoch_seq)
        return outs, res

    def bwd(res, gouts):
        (stacked, actions, a_emb, v_emb, init_deter, init_stoch,
         g_prior, g_post, deter_seq, post_stoch_seq) = res
        d_stacked, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch = _bwd_call(
            stacked, actions, a_emb, v_emb, init_deter, init_stoch,
            g_prior, g_post, deter_seq, post_stoch_seq, tuple(gouts),
            class_size, category_size, interpret,
        )
        return (d_stacked, d_actions, d_a_emb, d_v_emb, d_init_deter, d_init_stoch,
                jnp.zeros_like(g_prior), jnp.zeros_like(g_post))

    fused.defvjp(fwd, bwd)
    return fused


def fused_train_recurrence_stacked(
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
    """Drop-in twin of ``train_step.fused_train_recurrence`` on the stacked
    layout: same packed 20-tuple in, same time-major outputs, same gradient
    layout (stacking/unstacking are linear reshuffles wrapped around the
    kernel pair via a second custom_vjp-free layer — jax differentiates
    through them mechanically, and the stacked kernels' zero-block garbage
    grads are sliced away by construction)."""
    fn = _make_fused_stacked(class_size, category_size, interpret)
    stacked = stack_train_params(packed)
    return fn(stacked, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post)
