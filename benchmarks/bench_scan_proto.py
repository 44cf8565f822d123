"""Prototype: op-count-reduced representation rollout vs the current one.

Measures the candidate optimizations for the latency-bound B=8 T=30 train
step before they land in models/mrssm.py:

- hoist the prior head (MLP + ST-sample) out of the scan, vectorized [B,T]
- precompute embed/action first-layer contributions outside the scan
- verify numerics match the existing rollout (prior hoist is bit-exact;
  matmul splits reassociate adds → ~1e-6)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.utils.benchtools import synthetic_batch6
from multimodal_mtrssm_tpu.models.state import State
from multimodal_mtrssm_tpu.nn.conv import encoder_apply
from multimodal_mtrssm_tpu.nn.core import activation, dense_apply, gru_apply, mlp_apply
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot
from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs
from multimodal_mtrssm_tpu.train.optim import make_optimizer

B, T = 8, 30
cfg = MRSSMConfig()
model = MoPoEMRSSM(cfg)


def fast_rollout(params, actions, audio_embed, vision_embed, prev_state, key):
    """Optimized rollout_representation: same math, fewer in-scan ops."""
    act = activation(cfg.activation_name)
    Tn = actions.shape[1]
    step_keys = jax.random.split(key, Tn)
    k_priors = jax.vmap(lambda k: jax.random.split(k)[0])(step_keys)
    k_posts = jax.vmap(lambda k: jax.random.split(k)[1])(step_keys)

    t = params["transition"]
    asp1, asp2 = t["action_state_projector"]["layers"]
    A = cfg.action_size
    # Split asp layer 1: W @ cat(action, stoch) = Wa@action + Ws@stoch + b.
    asp1_wa, asp1_ws = asp1["w"][:A], asp1["w"][A:]
    # Precompute the action contribution for all t outside the scan.
    act_contrib = actions @ asp1_wa + asp1["b"]  # [B, T, hidden]

    D = cfg.deterministic_size
    ar1, ar2 = params["audio_representation"]["layers"]
    vr1, vr2 = params["vision_representation"]["layers"]
    ar1_wd, ar1_we = ar1["w"][:D], ar1["w"][D:]
    vr1_wd, vr1_we = vr1["w"][:D], vr1["w"][D:]
    a_contrib = audio_embed @ ar1_we + ar1["b"]  # [B, T, hidden]
    v_contrib = vision_embed @ vr1_we + vr1["b"]

    def step(carry, xs):
        prev_deter, prev_stoch = carry
        act_c, a_c, v_c, k_post = xs
        x = act(prev_stoch @ asp1_ws + act_c)
        x = dense_apply(asp2, x)
        deter = gru_apply(t["gru"], x, prev_deter)
        a_logits = dense_apply(ar2, act(deter @ ar1_wd + a_c))
        v_logits = dense_apply(vr2, act(deter @ vr1_wd + v_c))
        mixed_logits = mopoe_mix_log_probs(a_logits, v_logits)
        post_dist = MultiOneHot(logits=mixed_logits, class_size=cfg.class_size,
                                category_size=cfg.category_size)
        post_stoch = post_dist.rsample(k_post)
        carry = (deter, post_stoch.astype(deter.dtype))
        return carry, (deter, mixed_logits, post_stoch)

    xs = (
        jnp.swapaxes(act_contrib, 0, 1),
        jnp.swapaxes(a_contrib, 0, 1),
        jnp.swapaxes(v_contrib, 0, 1),
        k_posts,
    )
    _, (deter, mixed_logits, post_stoch) = jax.lax.scan(
        step, (prev_state.deter, prev_state.stoch.astype(prev_state.deter.dtype)), xs
    )
    # Prior head hoisted out of the scan: vectorized over [T, B].
    prior_logits = mlp_apply(t["rnn_to_prior_projector"], deter, cfg.activation_name)
    prior_stoch = jax.vmap(
        lambda k, lg: MultiOneHot(logits=lg, class_size=cfg.class_size,
                                  category_size=cfg.category_size).rsample(k)
    )(k_priors, prior_logits)
    tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
    prior = State(deter=tm(deter), stoch=tm(prior_stoch), distribution=model._dist(tm(prior_logits)))
    posterior = State(deter=tm(deter), stoch=tm(post_stoch), distribution=model._dist(tm(mixed_logits)))
    return posterior, prior


def shared_step_fast(params, batch, key):
    action_input, audio_in, vision_in = batch[0], batch[1], batch[2]
    k_init, k_roll, _ = jax.random.split(key, 3)
    init = model.initial_state(params, audio_in[:, 0], vision_in[:, 0], k_init)
    audio_embed = encoder_apply(params["audio_encoder"], cfg.audio_encoder, audio_in)
    vision_embed = encoder_apply(params["vision_encoder"], cfg.vision_encoder, vision_in)
    posterior, prior = fast_rollout(params, action_input, audio_embed, vision_embed, init, k_roll)
    recons = model.decode_state(params, posterior)
    targets = {"recon/audio": batch[4], "recon/vision": batch[5]}
    ld = model.compute_reconstruction_loss(recons, targets)
    from multimodal_mtrssm_tpu.ops.distributions import kl_balanced

    kl_bt = kl_balanced(posterior.distribution, prior.distribution, use_balancing=cfg.use_kl_balancing)
    ld["loss"] = ld["recon"] + jnp.mean(jnp.sum(kl_bt, axis=-1)) * cfg.kl_coeff
    return ld


def shared_step_fast2(params, batch, key):
    """fast + modality-stacked encoders/decoders (one vmapped conv stack
    instead of two per direction)."""
    action_input, audio_in, vision_in = batch[0], batch[1], batch[2]
    k_init, k_roll, _ = jax.random.split(key, 3)

    enc_stacked = jax.tree.map(
        lambda a, v: jnp.stack([a, v]), params["audio_encoder"], params["vision_encoder"]
    )
    enc = jax.vmap(lambda p, x: encoder_apply(p, cfg.audio_encoder, x))
    embeds = enc(enc_stacked, jnp.stack([audio_in, vision_in]))
    audio_embed, vision_embed = embeds[0], embeds[1]

    # initial_state from frame-0 mean-fused embed (same math as model.initial_state)
    embed0 = (audio_embed[:, 0] + vision_embed[:, 0]) / 2.0
    deter0 = mlp_apply(params["init_proj"], embed0, cfg.init_proj_activation)
    logits0 = mlp_apply(params["transition"]["rnn_to_prior_projector"], deter0, cfg.activation_name)
    d0 = model._dist(logits0)
    init = State(deter=deter0, stoch=d0.rsample(k_init), distribution=d0)

    posterior, prior = fast_rollout(params, action_input, audio_embed, vision_embed, init, k_roll)

    from multimodal_mtrssm_tpu.nn.conv import decoder_apply

    dcfg = model.decoder_cfg("audio")
    dec_stacked = jax.tree.map(
        lambda a, v: jnp.stack([a, v]), params["audio_decoder"], params["vision_decoder"]
    )
    outs = jax.vmap(lambda p: decoder_apply(p, dcfg, posterior.feature))(dec_stacked)
    recons = {"recon/audio": outs[0], "recon/vision": outs[1]}
    targets = {"recon/audio": batch[4], "recon/vision": batch[5]}
    ld = model.compute_reconstruction_loss(recons, targets)
    from multimodal_mtrssm_tpu.ops.distributions import kl_balanced

    kl_bt = kl_balanced(posterior.distribution, prior.distribution, use_balancing=cfg.use_kl_balancing)
    ld["loss"] = ld["recon"] + jnp.mean(jnp.sum(kl_bt, axis=-1)) * cfg.kl_coeff
    return ld


def main() -> None:
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = synthetic_batch6(jax.random.PRNGKey(0), B, T)
    params = model.init(jax.random.PRNGKey(1))
    key = ks[3]

    # --- numerics check -------------------------------------------------
    base = jax.jit(model.shared_step)(params, batch, key)
    fast = jax.jit(shared_step_fast)(params, batch, key)
    fast2 = jax.jit(shared_step_fast2)(params, batch, key)
    for k in ("loss", "recon", "kl"):
        if k in base and k in fast and k in fast2:
            print(f"{k}: base={float(base[k]):.6f} fast={float(fast[k]):.6f} "
                  f"fast2={float(fast2[k]):.6f}")
    np.testing.assert_allclose(float(base["loss"]), float(fast["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(base["loss"]), float(fast2["loss"]), rtol=1e-5)
    print("numerics OK")

    # --- timing (interleaved) --------------------------------------------
    def make_train(step_fn):
        def train_step(params, opt_state, batch, key, step):
            k = jax.random.fold_in(key, step)
            loss, grads = jax.value_and_grad(lambda p: step_fn(p, batch, k)["loss"])(params)
            u, opt_state = opt.update(grads, opt_state, params)
            return jax.tree.map(lambda a, b: a + b, params, u), opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    fns = {
        "base": make_train(model.shared_step),
        "fast": make_train(shared_step_fast),
        "fast2": make_train(shared_step_fast2),
    }
    states = {}
    for name, f in fns.items():
        p, s = model.init(jax.random.PRNGKey(1)), opt.init(model.init(jax.random.PRNGKey(1)))
        for i in range(25):
            p, s, loss = f(p, s, batch, key, i)
        jax.device_get(loss)  # host-transfer fence (CLAUDE.md)
        states[name] = [f, p, s]
    best = {n: 1e9 for n in fns}
    for _ in range(6):
        for name in fns:
            f, p, s = states[name]
            t0 = time.perf_counter()
            for i in range(30):
                p, s, loss = f(p, s, batch, key, i)
            jax.device_get(loss)  # host-transfer fence (CLAUDE.md)
            best[name] = min(best[name], (time.perf_counter() - t0) / 30)
            states[name][1], states[name][2] = p, s
    for name, dt in best.items():
        print(f"{name}: {dt * 1e3:.3f} ms/step  {B / dt:.1f} seq/s")
    print(f"fast  speedup: {best['base'] / best['fast']:.3f}x")
    print(f"fast2 speedup: {best['base'] / best['fast2']:.3f}x")


if __name__ == "__main__":
    main()
