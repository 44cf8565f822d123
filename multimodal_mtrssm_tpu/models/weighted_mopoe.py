"""WeightedMoPoE-MRSSM: learned per-subset mixture weights.

The reference contains a *dead* visualization callback for a
``WeightedMoPoE_MRSSM`` with a learned ``weights_timeseries`` [B, T, 3]
(reference ``mopoe_mrssm/callback.py:40-163`` — body disabled, model class
absent from the snapshot). This implements the working model: the MoE
mixture over the subsets {audio}, {vision}, {audio+vision} uses weights
predicted from the deterministic state instead of the fixed 1/3
(reference ``mopoe_mrssm/core.py:139-154``), letting the posterior learn
when to trust which modality.

Everything else (PoE term, sampling, ELBO) is inherited from MoPoE-MRSSM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.models.mrssm import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.models.state import State
from multimodal_mtrssm_tpu.nn.core import Params, mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class WeightedMRSSMConfig(MRSSMConfig):
    """MRSSM config plus the learned-subset-weight head size."""

    weight_head_cells: int = 32  # MLP deter → 3 subset logits


class WeightedMoPoEMRSSM(MoPoEMRSSM):
    """MoPoE-MRSSM with a learned 3-way subset-mixture weight head."""

    def __init__(self, config: WeightedMRSSMConfig | None = None):
        super().__init__(config or WeightedMRSSMConfig())

    def init(self, key: jax.Array) -> Params:
        params = super().init(key)
        params["moe_weight_head"] = mlp_init(
            jax.random.fold_in(key, 1234),
            self.cfg.deterministic_size, 3, self.cfg.weight_head_cells, depth=1,
        )
        return params

    def _mix_weighted(self, params: Params, deter: jax.Array,
                      a_logits: jax.Array, v_logits: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Weighted MoE logsumexp; returns (mixed log-probs, subset weights [.., 3])."""
        w_logits = mlp_apply(params["moe_weight_head"], deter, self.cfg.activation_name)
        log_w = jax.nn.log_softmax(w_logits.astype(jnp.float32), axis=-1)
        a = jax.nn.log_softmax(a_logits.astype(jnp.float32), axis=-1)
        v = jax.nn.log_softmax(v_logits.astype(jnp.float32), axis=-1)
        fused = a + v  # unnormalized PoE term (reference quirk, kept)
        stacked = jnp.stack([a, v, fused], axis=-2) + log_w[..., None]
        return jax.nn.logsumexp(stacked, axis=-2), jnp.exp(log_w)

    def rollout_representation(self, params, actions, audio_obs, vision_obs, prev_state, key):
        posterior, prior, _ = self.rollout_representation_with_weights(
            params, actions, audio_obs, vision_obs, prev_state, key
        )
        return posterior, prior

    def rollout_representation_with_weights(
        self, params, actions, audio_obs, vision_obs, prev_state, key
    ) -> tuple[State, State, jax.Array]:
        """Like the base rollout, additionally returning the learned subset
        weights over time (``weights_timeseries`` [B, T, 3] — the quantity
        the reference's dead callback wanted to plot)."""
        from multimodal_mtrssm_tpu.nn.conv import encoder_apply

        cfg = self.cfg
        audio_embed = self._conv_out(
            encoder_apply(params["audio_encoder"], cfg.audio_encoder, self._conv_in(audio_obs))
        )
        vision_embed = self._conv_out(
            encoder_apply(params["vision_encoder"], cfg.vision_encoder, self._conv_in(vision_obs))
        )
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            prev_deter, prev_stoch = carry
            action_t, a_emb_t, v_emb_t, k = xs
            k_prior, k_post = jax.random.split(k)
            deter, prior_logits = self._transition_core(params, action_t, prev_stoch, prev_deter)
            prior_stoch = self._dist(prior_logits).rsample(k_prior)
            a_logits = self._posterior_logits(params, "audio", deter, a_emb_t)
            v_logits = self._posterior_logits(params, "vision", deter, v_emb_t)
            mixed, weights = self._mix_weighted(params, deter, a_logits, v_logits)
            post_stoch = self._dist(mixed).rsample(k_post)
            carry = (deter, post_stoch.astype(deter.dtype))
            return carry, (deter, prior_logits, prior_stoch, mixed, post_stoch, weights)

        xs = (
            jnp.swapaxes(actions, 0, 1),
            jnp.swapaxes(audio_embed, 0, 1),
            jnp.swapaxes(vision_embed, 0, 1),
            step_keys,
        )
        if cfg.remat:
            step = jax.checkpoint(step)
        _, (deter, prior_logits, prior_stoch, mixed, post_stoch, weights) = jax.lax.scan(
            step, (prev_state.deter, prev_state.stoch.astype(prev_state.deter.dtype)), xs,
            unroll=cfg.scan_unroll,
        )
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        prior = State(deter=tm(deter), stoch=tm(prior_stoch), distribution=self._dist(tm(prior_logits)))
        posterior = State(deter=tm(deter), stoch=tm(post_stoch), distribution=self._dist(tm(mixed)))
        return posterior, prior, tm(weights)


def plot_weights_timeseries(weights: jax.Array, out_path, episode: int = 0):
    """Plot one episode's learned subset weights over time (the chart the
    reference's dead ``LogWeightedMoPoEWeights`` was meant to draw,
    reference ``mopoe_mrssm/callback.py:71-163``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from pathlib import Path

    w = np.asarray(weights[episode])  # [T, 3]
    fig, ax = plt.subplots(figsize=(6, 3))
    for i, label in enumerate(("audio", "vision", "audio+vision")):
        ax.plot(w[:, i], label=label)
    ax.set_xlabel("t")
    ax.set_ylabel("mixture weight")
    ax.set_ylim(0, 1)
    ax.legend()
    fig.tight_layout()
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
