"""Unimodal RSSM: single-modality DreamerV2-style world model.

The reference's ``BaseRSSM`` is written generically over single- and
multi-modal observations (reference ``models/core.py:33-119``: the abstract
accessors' single-modality contract — ``{"recon": ...}`` keys, passthrough
``encode_observation``), and its lint config points at removed unimodal
siblings (``models/rssm/core.py``, ``models/mrssm/nn_mrssm/*`` in reference
``pyproject.toml:73-77``). This rebuilds that family: one encoder, one
posterior head (no fusion), one decoder — sharing the transition core,
distribution ops, and scan skeleton with MoPoE-MRSSM.

Batch contract (single modality): (action_input, obs_input, action_target,
obs_target), observations NHWC [B, T, H, W, C].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.nn.conv import (
    DecoderConfig,
    EncoderConfig,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
)
from multimodal_mtrssm_tpu.nn.core import Params, gru_init, mlp_apply, mlp_init
from multimodal_mtrssm_tpu.models.mrssm import _add_input_noise
from multimodal_mtrssm_tpu.models.state import State
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot, kl_balanced
from multimodal_mtrssm_tpu.ops.likelihood import gaussian_nll


@dataclasses.dataclass(frozen=True)
class RSSMConfig:
    """Shared RSSM hyperparameters (reference mopoe_mrssm/configs/default.yaml:7-30)."""

    deterministic_size: int = 32
    hidden_size: int = 32
    obs_embed_size: int = 64
    class_size: int = 4
    category_size: int = 4
    action_size: int = 6
    activation_name: str = "ELU"
    init_proj_cells: int = 200
    init_proj_activation: str = "Tanh"  # torchrl MLP default (see MRSSMConfig)
    kl_coeff: float = 1.0
    use_kl_balancing: bool = True
    # Scalar or per-stream (action, obs) 2-tuple (see MRSSMConfig).
    input_noise_std: float | tuple[float, float] = 0.0
    remat: bool = False
    encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    decoder: DecoderConfig | None = None
    compute_dtype: Any = jnp.float32

    @property
    def stoch_size(self) -> int:
        return self.class_size * self.category_size

    @property
    def feature_size(self) -> int:
        return self.deterministic_size + self.stoch_size

    def decoder_cfg(self) -> DecoderConfig:
        return self.decoder if self.decoder is not None else DecoderConfig(in_features=self.feature_size)


class RSSM:
    """Functional unimodal RSSM (same method surface as MoPoEMRSSM)."""

    def __init__(self, config: RSSMConfig | None = None):
        self.cfg = config or RSSMConfig()

    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 6)
        stoch = cfg.stoch_size
        return {
            "transition": {
                "action_state_projector": mlp_init(
                    keys[0], cfg.action_size + stoch, cfg.hidden_size, cfg.hidden_size, depth=1
                ),
                "gru": gru_init(keys[1], cfg.hidden_size, cfg.deterministic_size),
                "rnn_to_prior_projector": mlp_init(
                    keys[2], cfg.deterministic_size, stoch, cfg.hidden_size, depth=1
                ),
            },
            "representation": mlp_init(
                keys[3], cfg.deterministic_size + cfg.obs_embed_size, stoch, cfg.hidden_size, depth=1
            ),
            "encoder": encoder_init(keys[4], cfg.encoder),
            "decoder": decoder_init(keys[5], self.cfg.decoder_cfg()),
        } | {
            "init_proj": mlp_init(
                jax.random.fold_in(key, 99), cfg.obs_embed_size, cfg.deterministic_size,
                cfg.init_proj_cells, depth=1,
            ),
        }

    def _dist(self, logits: jax.Array) -> MultiOneHot:
        return MultiOneHot(
            logits=logits, class_size=self.cfg.class_size, category_size=self.cfg.category_size
        )

    def encode_observation(self, params: Params, obs: jax.Array) -> jax.Array:
        return encoder_apply(params["encoder"], self.cfg.encoder, obs)

    def _transition_core(self, params, action, prev_stoch, prev_deter):
        from multimodal_mtrssm_tpu.nn.core import rssm_transition_core

        return rssm_transition_core(
            params["transition"], action, prev_stoch, prev_deter, self.cfg.activation_name
        )

    def initial_state(self, params: Params, obs0: jax.Array, key: jax.Array) -> State:
        return self.initial_state_from_embed(params, self.encode_observation(params, obs0), key)

    def initial_state_from_embed(self, params: Params, embed: jax.Array, key: jax.Array) -> State:
        """``initial_state`` from a pre-computed embedding (lets
        ``shared_step`` reuse the rollout's encoder pass for frame 0)."""
        act = self.cfg.activation_name
        deter = mlp_apply(params["init_proj"], embed, self.cfg.init_proj_activation)
        logits = mlp_apply(params["transition"]["rnn_to_prior_projector"], deter, act)
        dist = self._dist(logits)
        return State(deter=deter, stoch=dist.rsample(key), distribution=dist)

    def rollout_representation(self, params: Params, actions: jax.Array, obs: jax.Array,
                               prev_state: State, key: jax.Array) -> tuple[State, State]:
        embed = self.encode_observation(params, obs)
        return self._rollout_from_embed(params, actions, embed, prev_state, key)

    def _rollout_from_embed(self, params, actions, embed, prev_state, key):
        """Representation rollout from a pre-computed embedding sequence."""
        cfg = self.cfg
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            prev_deter, prev_stoch = carry
            action_t, emb_t, k = xs
            k_prior, k_post = jax.random.split(k)
            deter, prior_logits = self._transition_core(params, action_t, prev_stoch, prev_deter)
            prior_stoch = self._dist(prior_logits).rsample(k_prior)
            post_logits = mlp_apply(
                params["representation"], jnp.concatenate([deter, emb_t], -1), cfg.activation_name
            )
            post_stoch = self._dist(post_logits).rsample(k_post)
            carry = (deter, post_stoch.astype(deter.dtype))
            return carry, (deter, prior_logits, prior_stoch, post_logits, post_stoch)

        if cfg.remat:
            step = jax.checkpoint(step)
        xs = (jnp.swapaxes(actions, 0, 1), jnp.swapaxes(embed, 0, 1), step_keys)
        _, (deter, prior_logits, prior_stoch, post_logits, post_stoch) = jax.lax.scan(
            step, (prev_state.deter, prev_state.stoch.astype(prev_state.deter.dtype)), xs
        )
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        prior = State(deter=tm(deter), stoch=tm(prior_stoch), distribution=self._dist(tm(prior_logits)))
        posterior = State(deter=tm(deter), stoch=tm(post_stoch), distribution=self._dist(tm(post_logits)))
        return posterior, prior

    def rollout_transition(self, params: Params, actions: jax.Array,
                           prev_state: State, key: jax.Array) -> State:
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            prev_deter, prev_stoch = carry
            action_t, k = xs
            deter, logits = self._transition_core(params, action_t, prev_stoch, prev_deter)
            stoch = self._dist(logits).rsample(k)
            return (deter, stoch.astype(deter.dtype)), (deter, logits, stoch)

        _, (deter, logits, stoch) = jax.lax.scan(
            step,
            (prev_state.deter, prev_state.stoch.astype(prev_state.deter.dtype)),
            (jnp.swapaxes(actions, 0, 1), step_keys),
        )
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        return State(deter=tm(deter), stoch=tm(stoch), distribution=self._dist(tm(logits)))

    def decode_state(self, params: Params, state: State) -> dict[str, jax.Array]:
        return {"recon": decoder_apply(params["decoder"], self.cfg.decoder_cfg(), state.feature)}

    def shared_step(self, params: Params, batch: tuple, key: jax.Array) -> dict[str, jax.Array]:
        """(action_input, obs_input, action_target, obs_target) → loss dict."""
        cfg = self.cfg
        action_input, obs_in = batch[0], batch[1]
        k_init, k_roll, k_noise = jax.random.split(key, 3)
        from multimodal_mtrssm_tpu.models.mrssm import _stream_stds

        stds = _stream_stds(cfg.input_noise_std)[:2]
        if any(s > 0 for s in stds):
            action_input, obs_in = _add_input_noise(k_noise, stds, action_input, obs_in)
        dt = cfg.compute_dtype
        # One encoder pass for both the initial state (frame 0) and the
        # recurrence (see the MRSSM counterpart).
        embed = self.encode_observation(params, obs_in.astype(dt))
        init = self.initial_state_from_embed(params, embed[:, 0], k_init)
        posterior, prior = self._rollout_from_embed(
            params, action_input.astype(dt), embed, init, k_roll
        )
        recon = gaussian_nll(self.decode_state(params, posterior)["recon"], batch[3], event_ndims=3)
        kl = jnp.mean(jnp.sum(
            kl_balanced(posterior.distribution, prior.distribution, use_balancing=cfg.use_kl_balancing),
            axis=-1,
        )) * cfg.kl_coeff
        return {"recon": recon, "kl": kl, "loss": recon + kl}
