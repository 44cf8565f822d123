"""MoPoE-MMTRSSM: hierarchical multi-timescale multimodal RSSM.

TPU-native rebuild of the reference model (reference
``src/multimodal_rssm/models/mmtrssm/mopoe_mmtrssm/core.py:77-610``):
MoPoE fusion on the lower (fast, tau_l) layer of a two-level MTRNN
hierarchy, with the higher (slow, tau_h) layer's posterior conditioned on
both deterministic paths, and a dual-KL ELBO
(``loss = recon + kl_l*kl_coeff + kl_h*kl_coeff*w_kl_h``, reference
``:563-606``).

Redesign notes vs the reference:

- The reference's ``MTRNN.hidden`` is *mutable module state* seeded by
  ``_set_prev_hiddens`` and mutated every step (reference ``core.py:51-59,
  206-239``). Here the two integrator cells are explicit fields of the
  ``MTState`` carry, so the whole rollout is one pure ``lax.scan``.
- The reference builds a vestigial dummy ``Transition`` just to satisfy the
  base-class constructor (reference ``core.py:141-151``); this build has no
  such artifact.
- The l_posterior MLP from the reference config is *dead weight* — the
  lower posterior actually comes from the modality Representation heads +
  MoPoE fusion (reference ``core.py:420-455``; the ``l_posterior`` module is
  stored but never called). We do not allocate it.
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
from multimodal_mtrssm_tpu.nn.core import Params, mlp_apply, mlp_init, mtrnn_apply, mtrnn_init
from multimodal_mtrssm_tpu.models.state import MTState
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot, kl_balanced
from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs
from multimodal_mtrssm_tpu.ops.likelihood import gaussian_nll


@dataclasses.dataclass(frozen=True)
class MMTRSSMConfig:
    """Static hyperparameters (defaults = reference
    ``mopoe_mmtrssm/configs/default.yaml:85-148``)."""

    action_size: int = 6
    obs_embed_size: int = 64
    hd_dim: int = 32
    hs_class: int = 2
    hs_category: int = 8
    ld_dim: int = 32
    ls_class: int = 4
    ls_category: int = 4
    l_tau: float = 2.0
    h_tau: float = 4.0
    prior_cells: int = 32  # l/h prior+posterior MLP width (configs :102-137)
    rep_hidden_size: int = 32  # Representation MLP width (configs :7-21)
    activation_name: str = "ELU"
    init_proj_cells: int = 200
    init_proj_activation: str = "Tanh"  # torchrl MLP default (see MRSSMConfig)
    kl_coeff: float = 1.0
    use_kl_balancing: bool = True
    # Device-side GaussianNoise; scalar or per-stream (action, audio, vision)
    # 3-tuple (see MRSSMConfig).
    input_noise_std: float | tuple[float, float, float] = 0.0
    remat: bool = False  # rematerialize scan step in backward (see MRSSMConfig)
    scan_unroll: int = 1  # lax.scan unroll factor (see MRSSMConfig)
    # Fused Pallas hierarchical TRAINING recurrence (see MRSSMConfig
    # .use_pallas_train for values/semantics; kernel in
    # ops/pallas/train_step_mt.py). Same RNG caveat: the kernel path draws
    # bulk Gumbel noise, so trajectories are not bit-comparable to the
    # per-step-key XLA path.
    use_pallas_train: bool | str = "auto"
    w_kl_h: float = 1.0
    audio_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    vision_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    audio_decoder: DecoderConfig | None = None
    vision_decoder: DecoderConfig | None = None
    compute_dtype: Any = jnp.float32
    # Conv-stack compute dtype (None = compute_dtype) — same mixed-precision
    # knob as ``MRSSMConfig.conv_dtype``: bf16 convs, f32 recurrence (keeps
    # the fused hierarchical training kernel eligible).
    conv_dtype: Any = None
    # Conv-stack layout ("auto" | "nhwc" | "s2d") — same exact-
    # re-expression knob as ``MRSSMConfig.conv_layout`` (see its comment;
    # pinned by tests/test_s2d_layout.py). "auto" picks s2d only at
    # narrow widths where it measured faster (B=8 1.04×, B=32 neutral,
    # 2026-08-19); wide stacks resolve to nhwc (the 27M config measured
    # s2d 0.93×, 2026-08-20).
    conv_layout: str = "auto"

    @property
    def hs_dim(self) -> int:
        return self.hs_class * self.hs_category

    @property
    def ls_dim(self) -> int:
        return self.ls_class * self.ls_category

    @property
    def feature_size(self) -> int:
        """hd + hs + ld + ls (reference ``core.py:196-204``): 32+16+32+16 = 96."""
        return self.hd_dim + self.hs_dim + self.ld_dim + self.ls_dim

    def decoder_cfg(self, which: str) -> DecoderConfig:
        cfg = getattr(self, f"{which}_decoder")
        return cfg if cfg is not None else DecoderConfig(in_features=self.feature_size)


class MoPoEMMTRSSM:
    """Functional MoPoE-MMTRSSM: static config + pure methods over a param pytree."""

    def __init__(self, config: MMTRSSMConfig | None = None):
        self.cfg = config or MMTRSSMConfig()
        # Device count of the mesh this model trains on; the Trainer sets it
        # after resolving its mesh (None = consult the global backend).
        self.mesh_devices: int | None = None
        from multimodal_mtrssm_tpu.models.mrssm import _resolve_conv_layout

        mode = _resolve_conv_layout(
            self.cfg.conv_layout,
            (self.cfg.audio_encoder, self.cfg.vision_encoder),
            (self.cfg.decoder_cfg("audio"), self.cfg.decoder_cfg("vision")),
        )
        self._use_s2d = mode == "s2d"
        self._use_fused_enc = mode == "fused_enc"

    # ---- init ------------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 12)
        params: Params = {
            # MTRNN cells (reference core.py:175-184).
            "l_rnn": mtrnn_init(keys[0], cfg.action_size + cfg.ls_dim + cfg.hs_dim, cfg.ld_dim),
            "h_rnn": mtrnn_init(keys[1], cfg.hs_dim, cfg.hd_dim),
            # Prior / posterior heads (reference configs :102-137).
            "l_prior": mlp_init(keys[2], cfg.ld_dim, cfg.ls_dim, cfg.prior_cells, depth=1),
            "h_prior": mlp_init(keys[3], cfg.hd_dim, cfg.hs_dim, cfg.prior_cells, depth=1),
            "h_posterior": mlp_init(keys[4], cfg.ld_dim + cfg.hd_dim, cfg.hs_dim, cfg.prior_cells, depth=1),
            # Modality Representation heads conditioned on l_deter
            # (reference core.py:243-267: cat(l_deter, obs_embed)).
            "audio_representation": mlp_init(
                keys[5], cfg.ld_dim + cfg.obs_embed_size, cfg.ls_dim, cfg.rep_hidden_size, depth=1
            ),
            "vision_representation": mlp_init(
                keys[6], cfg.ld_dim + cfg.obs_embed_size, cfg.ls_dim, cfg.rep_hidden_size, depth=1
            ),
            "audio_encoder": encoder_init(keys[7], cfg.audio_encoder),
            "vision_encoder": encoder_init(keys[8], cfg.vision_encoder),
            "audio_decoder": decoder_init(keys[9], cfg.decoder_cfg("audio")),
            "vision_decoder": decoder_init(keys[10], cfg.decoder_cfg("vision")),
            # init_proj: obs_embed → [hd | ld] halves (reference core.py:341-347;
            # configs :85-91: 64 → 64, 200 cells).
            "init_proj": mlp_init(
                keys[11], cfg.obs_embed_size, cfg.hd_dim + cfg.ld_dim, cfg.init_proj_cells, depth=1
            ),
        }
        return params

    # ---- distribution helpers ---------------------------------------------
    def _l_dist(self, logits: jax.Array) -> MultiOneHot:
        return MultiOneHot(logits=logits, class_size=self.cfg.ls_class, category_size=self.cfg.ls_category)

    def _h_dist(self, logits: jax.Array) -> MultiOneHot:
        return MultiOneHot(logits=logits, class_size=self.cfg.hs_class, category_size=self.cfg.hs_category)

    # ---- encoding -----------------------------------------------------------
    def _conv_in(self, x: jax.Array) -> jax.Array:
        """Cast a conv-stack input per the shared mixed-precision policy."""
        from multimodal_mtrssm_tpu.nn.conv import cast_conv_in

        return cast_conv_in(self.cfg, x)

    def _conv_out(self, x: jax.Array) -> jax.Array:
        """Cast a conv-stack output back to the model compute dtype."""
        from multimodal_mtrssm_tpu.nn.conv import cast_conv_out

        return cast_conv_out(self.cfg, x)

    def _encode_embeds(self, params: Params, audio_obs: jax.Array, vision_obs: jax.Array):
        """Raw (conv-dtype) encoder outputs for both modalities (see the
        MRSSM counterpart — single home of the encoder call pair)."""
        enc = encoder_apply
        if self._use_s2d:
            from multimodal_mtrssm_tpu.nn.conv import encoder_apply_s2d

            enc = encoder_apply_s2d
        elif self._use_fused_enc:
            from multimodal_mtrssm_tpu.ops.pallas.fused_conv import (
                fused_encoder_apply,
            )

            enc = fused_encoder_apply
        a = enc(params["audio_encoder"], self.cfg.audio_encoder, self._conv_in(audio_obs))
        v = enc(params["vision_encoder"], self.cfg.vision_encoder, self._conv_in(vision_obs))
        return a, v

    def encode_observation(self, params: Params, audio_obs: jax.Array, vision_obs: jax.Array) -> jax.Array:
        """Mean-fused embedding (inherited contract, reference
        ``mopoe_mrssm/core.py:165-182``)."""
        a, v = self._encode_embeds(params, audio_obs, vision_obs)
        return self._conv_out((a + v) / 2.0)

    # ---- per-step cores ------------------------------------------------------
    def _lower_prior(
        self,
        params: Params,
        action: jax.Array,
        prev_ls: jax.Array,
        prev_hs: jax.Array,
        prev_ld: jax.Array,
        hidden_l: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Lower prior step (reference ``core.py:263-287``).

        Returns (l_deter, l_prior_logits, new_hidden_l).
        """
        act = self.cfg.activation_name
        x = jnp.concatenate([action, prev_ls, prev_hs], axis=-1)
        l_deter, hidden_l = mtrnn_apply(params["l_rnn"], x, prev_ld, hidden_l, self.cfg.l_tau)
        logits = mlp_apply(params["l_prior"], l_deter, act)
        return l_deter, logits, hidden_l

    def _higher_prior_posterior(
        self,
        params: Params,
        l_deter: jax.Array,
        prev_hd: jax.Array,
        prev_hs: jax.Array,
        hidden_h: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Higher prior + posterior step (reference ``core.py:289-319``).

        Returns (h_deter, h_prior_logits, h_posterior_logits, new_hidden_h).
        """
        act = self.cfg.activation_name
        h_deter, hidden_h = mtrnn_apply(params["h_rnn"], prev_hs, prev_hd, hidden_h, self.cfg.h_tau)
        prior_logits = mlp_apply(params["h_prior"], h_deter, act)
        post_logits = mlp_apply(
            params["h_posterior"], jnp.concatenate([l_deter, h_deter], axis=-1), act
        )
        return h_deter, prior_logits, post_logits, hidden_h

    def _posterior_logits(
        self, params: Params, which: str, l_deter: jax.Array, obs_embed: jax.Array
    ) -> jax.Array:
        x = jnp.concatenate([l_deter, obs_embed], axis=-1)
        return mlp_apply(params[f"{which}_representation"], x, self.cfg.activation_name)

    # ---- public API -----------------------------------------------------------
    def initial_state(
        self, params: Params, audio_obs0: jax.Array, vision_obs0: jax.Array, key: jax.Array
    ) -> MTState:
        """Initial hierarchical latent (reference ``core.py:321-362``):
        ``init_proj(embed)`` split into [hd | ld] halves seeds both the deter
        states and the MTRNN integrators; stochs sampled from the priors."""
        embed = self.encode_observation(params, audio_obs0, vision_obs0)
        return self.initial_state_from_embed(params, embed, key)

    def initial_state_from_embed(self, params: Params, embed: jax.Array, key: jax.Array) -> MTState:
        """``initial_state`` from a pre-computed mean-fused embedding (lets
        ``shared_step`` reuse the rollout's encoder pass for frame 0)."""
        cfg = self.cfg
        h = mlp_apply(params["init_proj"], embed, cfg.init_proj_activation)
        higher_h = h[..., : cfg.hd_dim]
        lower_h = h[..., cfg.hd_dim :]
        act = cfg.activation_name
        h_logits = mlp_apply(params["h_prior"], higher_h, act)
        l_logits = mlp_apply(params["l_prior"], lower_h, act)
        h_dist = self._h_dist(h_logits)
        l_dist = self._l_dist(l_logits)
        k_h, k_l = jax.random.split(key)
        return MTState(
            deter_h=higher_h,
            deter_l=lower_h,
            stoch_h=h_dist.rsample(k_h),
            stoch_l=l_dist.rsample(k_l),
            distribution_h=h_dist,
            distribution_l=l_dist,
            hidden_h=higher_h,
            hidden_l=lower_h,
        )

    def rollout_representation(
        self,
        params: Params,
        actions: jax.Array,
        audio_obs: jax.Array,
        vision_obs: jax.Array,
        prev_state: MTState,
        key: jax.Array,
    ) -> tuple[MTState, MTState]:
        """Posterior/prior rollout over [B, T] (reference ``core.py:364-494``)
        as one ``lax.scan``. Returns ``(mixed posterior, prior)``, time axis 1."""
        a_raw, v_raw = self._encode_embeds(params, audio_obs, vision_obs)
        return self._rollout_from_embeds(
            params, actions, self._conv_out(a_raw), self._conv_out(v_raw), prev_state, key
        )

    def _rollout_from_embeds(
        self, params, actions, audio_embed, vision_embed, prev_state, key
    ) -> tuple[MTState, MTState]:
        """Representation rollout from pre-computed per-modality embeddings
        (kernel dispatch + XLA-scan fallback)."""
        cfg = self.cfg
        mode = self._train_kernel_mode(actions.shape[0], actions.shape[1])
        if mode is not None:
            return self._rollout_representation_fused(
                params, actions, audio_embed, vision_embed, prev_state, key, mode
            )
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            hd, ld, hs, ls, hid_h, hid_l = carry
            action_t, a_emb_t, v_emb_t, k = xs
            k_lp, k_l, k_hp, k_h = jax.random.split(k, 4)
            # Lower prior (MTRNN).
            l_deter, l_prior_logits, hid_l = self._lower_prior(params, action_t, ls, hs, ld, hid_l)
            l_prior_stoch = self._l_dist(l_prior_logits).rsample(k_lp)
            # Modality posteriors conditioned on l_deter → MoPoE fusion.
            a_logits = self._posterior_logits(params, "audio", l_deter, a_emb_t)
            v_logits = self._posterior_logits(params, "vision", l_deter, v_emb_t)
            mixed_logits = mopoe_mix_log_probs(a_logits, v_logits)
            l_stoch = self._l_dist(mixed_logits).rsample(k_l)
            # Higher prior + posterior.
            h_deter, h_prior_logits, h_post_logits, hid_h = self._higher_prior_posterior(
                params, l_deter, hd, hs, hid_h
            )
            h_prior_stoch = self._h_dist(h_prior_logits).rsample(k_hp)
            h_stoch = self._h_dist(h_post_logits).rsample(k_h)
            # Samples are f32; carry runs in the compute dtype (bf16-safe).
            cdt = h_deter.dtype
            carry = (h_deter, l_deter, h_stoch.astype(cdt), l_stoch.astype(cdt), hid_h, hid_l)
            ys = (
                h_deter, l_deter, hid_h, hid_l,
                l_prior_logits, l_prior_stoch, mixed_logits, l_stoch,
                h_prior_logits, h_prior_stoch, h_post_logits, h_stoch,
            )
            return carry, ys

        cdt = prev_state.deter_h.dtype
        carry0 = (
            prev_state.deter_h, prev_state.deter_l,
            prev_state.stoch_h.astype(cdt), prev_state.stoch_l.astype(cdt),
            prev_state.hidden_h, prev_state.hidden_l,
        )
        xs = (
            jnp.swapaxes(actions, 0, 1),
            jnp.swapaxes(audio_embed, 0, 1),
            jnp.swapaxes(vision_embed, 0, 1),
            step_keys,
        )
        if cfg.remat:
            step = jax.checkpoint(step)
        _, ys = jax.lax.scan(step, carry0, xs, unroll=cfg.scan_unroll)
        (
            h_deter, l_deter, hid_h, hid_l,
            l_prior_logits, l_prior_stoch, mixed_logits, l_stoch,
            h_prior_logits, h_prior_stoch, h_post_logits, h_stoch,
        ) = ys
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        prior = MTState(
            deter_h=tm(h_deter), deter_l=tm(l_deter),
            stoch_h=tm(h_prior_stoch), stoch_l=tm(l_prior_stoch),
            distribution_h=self._h_dist(tm(h_prior_logits)),
            distribution_l=self._l_dist(tm(l_prior_logits)),
            hidden_h=tm(hid_h), hidden_l=tm(hid_l),
        )
        posterior = MTState(
            deter_h=tm(h_deter), deter_l=tm(l_deter),
            stoch_h=tm(h_stoch), stoch_l=tm(l_stoch),
            distribution_h=self._h_dist(tm(h_post_logits)),
            distribution_l=self._l_dist(tm(mixed_logits)),
            hidden_h=tm(hid_h), hidden_l=tm(hid_l),
        )
        return posterior, prior

    def _train_kernel_mode(self, batch: int, horizon: int) -> str | None:
        """Resolve ``use_pallas_train`` (see MRSSM counterpart): ELU + f32 +
        VMEM-sized shapes only; the dispatch ladder is shared
        (``ops.pallas.resolve_train_kernel_mode``)."""
        from multimodal_mtrssm_tpu.ops.pallas import resolve_train_kernel_mode
        from multimodal_mtrssm_tpu.ops.pallas.train_step_mt import (
            AUTO_MT_TRAIN_KERNEL,
            AUTO_MT_TRAIN_KERNEL_CHUNKED,
            fits_vmem_mt,
        )

        # "auto" and an explicit True both run oversized [T, B] through the
        # TIME-CHUNKED grid kernels (train_step_mt.py) — measured-win policy
        # per regime: AUTO_MT_TRAIN_KERNEL (single-block) /
        # AUTO_MT_TRAIN_KERNEL_CHUNKED (chunked, 2026-08-19 B=32 A/B).
        single_fit = fits_vmem_mt(
            horizon, batch,
            action_size=self.cfg.action_size,
            obs_embed_size=self.cfg.obs_embed_size,
            hd_dim=self.cfg.hd_dim,
            ld_dim=self.cfg.ld_dim,
            hs_size=self.cfg.hs_dim,
            ls_size=self.cfg.ls_dim,
        )
        return resolve_train_kernel_mode(
            self.cfg.use_pallas_train,
            eligible=(
                self.cfg.activation_name == "ELU"
                and self.cfg.compute_dtype == jnp.float32
            ),
            auto_flag=AUTO_MT_TRAIN_KERNEL
            and (single_fit or AUTO_MT_TRAIN_KERNEL_CHUNKED),
            warn_ineligible=(
                "use_pallas_train=True ignored: the fused hierarchical training "
                "kernel requires ELU + float32; taking the XLA scan path"
            ),
            n_devices=getattr(self, "mesh_devices", None),
        )

    def _rollout_representation_fused(
        self, params, actions, audio_embed, vision_embed, prev_state, key, mode: str
    ) -> tuple[MTState, MTState]:
        """Representation rollout through the fused hierarchical training
        kernel (or its pure-JAX twin) — same outputs as the scan path, RNG
        drawn as bulk Gumbel noise (4 streams)."""
        from multimodal_mtrssm_tpu.ops.pallas.train_step_mt import (
            fused_mt_train_recurrence,
            pack_mt_train_params,
            reference_mt_train_recurrence,
        )

        cfg = self.cfg
        B, T = actions.shape[:2]
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        ks = jax.random.split(key, 4)
        gumbels = (
            jax.random.gumbel(ks[0], (T, B, cfg.ls_dim), jnp.float32),
            jax.random.gumbel(ks[1], (T, B, cfg.ls_dim), jnp.float32),
            jax.random.gumbel(ks[2], (T, B, cfg.hs_dim), jnp.float32),
            jax.random.gumbel(ks[3], (T, B, cfg.hs_dim), jnp.float32),
        )
        init6 = (
            f32(prev_state.deter_h), f32(prev_state.deter_l),
            f32(prev_state.stoch_h), f32(prev_state.stoch_l),
            f32(prev_state.hidden_h), f32(prev_state.hidden_l),
        )
        args = (pack_mt_train_params(params), f32(tm(actions)),
                f32(tm(audio_embed)), f32(tm(vision_embed)), init6, gumbels)
        kw = dict(l_tau=cfg.l_tau, h_tau=cfg.h_tau, ls_class=cfg.ls_class,
                  ls_category=cfg.ls_category, hs_class=cfg.hs_class,
                  hs_category=cfg.hs_category)
        if mode in ("stacked", "stacked_interpret"):
            raise ValueError(
                "use_pallas_train='stacked' is MRSSM-only (the MT kernel has "
                "no stacked-layout variant); use 'auto'/True for MMTRSSM"
            )
        if mode == "reference":
            ys = reference_mt_train_recurrence(*args, **kw)
        else:
            ys = fused_mt_train_recurrence(*args, **kw, interpret=(mode == "interpret"))
        (h_deter, l_deter, hid_h, hid_l,
         l_prior_logits, l_prior_stoch, mixed_logits, l_stoch,
         h_prior_logits, h_prior_stoch, h_post_logits, h_stoch) = (tm(o) for o in ys)
        prior = MTState(
            deter_h=h_deter, deter_l=l_deter,
            stoch_h=h_prior_stoch, stoch_l=l_prior_stoch,
            distribution_h=self._h_dist(h_prior_logits),
            distribution_l=self._l_dist(l_prior_logits),
            hidden_h=hid_h, hidden_l=hid_l,
        )
        posterior = MTState(
            deter_h=h_deter, deter_l=l_deter,
            stoch_h=h_stoch, stoch_l=l_stoch,
            distribution_h=self._h_dist(h_post_logits),
            distribution_l=self._l_dist(mixed_logits),
            hidden_h=hid_h, hidden_l=hid_l,
        )
        return posterior, prior

    def rollout_transition(
        self, params: Params, actions: jax.Array, prev_state: MTState, key: jax.Array
    ) -> MTState:
        """Prior-only imagination rollout (reference ``core.py:496-544``)."""
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            hd, ld, hs, ls, hid_h, hid_l = carry
            action_t, k = xs
            k_l, k_h = jax.random.split(k)
            l_deter, l_prior_logits, hid_l = self._lower_prior(params, action_t, ls, hs, ld, hid_l)
            l_stoch = self._l_dist(l_prior_logits).rsample(k_l)
            act = self.cfg.activation_name
            h_deter, hid_h = mtrnn_apply(params["h_rnn"], hs, hd, hid_h, self.cfg.h_tau)
            h_prior_logits = mlp_apply(params["h_prior"], h_deter, act)
            h_stoch = self._h_dist(h_prior_logits).rsample(k_h)
            cdt = h_deter.dtype
            carry = (h_deter, l_deter, h_stoch.astype(cdt), l_stoch.astype(cdt), hid_h, hid_l)
            ys = (h_deter, l_deter, hid_h, hid_l, l_prior_logits, l_stoch, h_prior_logits, h_stoch)
            return carry, ys

        cdt0 = prev_state.deter_h.dtype
        carry0 = (
            prev_state.deter_h, prev_state.deter_l,
            prev_state.stoch_h.astype(cdt0), prev_state.stoch_l.astype(cdt0),
            prev_state.hidden_h, prev_state.hidden_l,
        )
        _, ys = jax.lax.scan(step, carry0, (jnp.swapaxes(actions, 0, 1), step_keys),
                             unroll=self.cfg.scan_unroll)
        h_deter, l_deter, hid_h, hid_l, l_prior_logits, l_stoch, h_prior_logits, h_stoch = ys
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        return MTState(
            deter_h=tm(h_deter), deter_l=tm(l_deter),
            stoch_h=tm(h_stoch), stoch_l=tm(l_stoch),
            distribution_h=self._h_dist(tm(h_prior_logits)),
            distribution_l=self._l_dist(tm(l_prior_logits)),
            hidden_h=tm(hid_h), hidden_l=tm(hid_l),
        )

    def decode_state(self, params: Params, state: MTState) -> dict[str, jax.Array]:
        """Decode both modalities from 96-dim features (reference ``core.py:546-561``)."""
        feature = self._conv_in(state.feature)
        return {
            "recon/audio": self._conv_out(
                decoder_apply(params["audio_decoder"], self.cfg.decoder_cfg("audio"), feature)
            ),
            "recon/vision": self._conv_out(
                decoder_apply(params["vision_decoder"], self.cfg.decoder_cfg("vision"), feature)
            ),
        }

    def _decode_for_loss(
        self,
        params: Params,
        posterior: MTState,
        audio_target: jax.Array,
        vision_target: jax.Array,
    ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
        """(reconstructions, targets) for the training NLL — see the MRSSM
        counterpart: s2d layout decodes depth-to-space phases against
        s2d'd targets (the NLL sums over event dims, so the loss is a
        permutation-identical sum)."""
        if not self._use_s2d:
            recons = self.decode_state(params, posterior)
            return recons, {"recon/audio": audio_target, "recon/vision": vision_target}
        from multimodal_mtrssm_tpu.nn.conv import decoder_apply_s2d, space_to_depth

        feature = self._conv_in(posterior.feature)
        recons = {
            "recon/audio": self._conv_out(
                decoder_apply_s2d(params["audio_decoder"], self.cfg.decoder_cfg("audio"), feature)
            ),
            "recon/vision": self._conv_out(
                decoder_apply_s2d(params["vision_decoder"], self.cfg.decoder_cfg("vision"), feature)
            ),
        }
        return recons, {
            "recon/audio": space_to_depth(audio_target),
            "recon/vision": space_to_depth(vision_target),
        }

    def compute_reconstruction_loss(
        self, reconstructions: dict[str, jax.Array], targets: dict[str, jax.Array]
    ) -> dict[str, jax.Array]:
        audio = gaussian_nll(reconstructions["recon/audio"], targets["recon/audio"], event_ndims=3)
        vision = gaussian_nll(reconstructions["recon/vision"], targets["recon/vision"], event_ndims=3)
        return {"recon": audio + vision, "recon/audio": audio, "recon/vision": vision}

    def shared_step(
        self, params: Params, batch: tuple[jax.Array, ...], key: jax.Array
    ) -> dict[str, jax.Array]:
        """Dual-KL ELBO step (reference ``core.py:563-606``)."""
        cfg = self.cfg
        action_input, audio_in, vision_in = batch[0], batch[1], batch[2]
        k_init, k_roll, k_noise = jax.random.split(key, 3)
        from multimodal_mtrssm_tpu.models.mrssm import _add_input_noise, _stream_stds

        stds = _stream_stds(cfg.input_noise_std)
        if any(s > 0 for s in stds):
            action_input, audio_in, vision_in = _add_input_noise(
                k_noise, stds, action_input, audio_in, vision_in
            )
        dt = cfg.compute_dtype
        # One encoder pass for both the initial state and the recurrence
        # (see the MRSSM counterpart: the reference re-encodes frame 0,
        # an extra [B]-frame conv pass per training step).
        a_raw, v_raw = self._encode_embeds(
            params, audio_in.astype(dt), vision_in.astype(dt)
        )
        init = self.initial_state_from_embed(
            params, self._conv_out((a_raw[:, 0] + v_raw[:, 0]) / 2.0), k_init
        )
        posterior, prior = self._rollout_from_embeds(
            params, action_input.astype(dt), self._conv_out(a_raw), self._conv_out(v_raw),
            init, k_roll,
        )
        recons, targets = self._decode_for_loss(params, posterior, batch[4], batch[5])
        loss_dict = self.compute_reconstruction_loss(recons, targets)
        kl_l = jnp.mean(jnp.sum(
            kl_balanced(posterior.distribution_l, prior.distribution_l, use_balancing=cfg.use_kl_balancing),
            axis=-1,
        )) * cfg.kl_coeff
        kl_h = jnp.mean(jnp.sum(
            kl_balanced(posterior.distribution_h, prior.distribution_h, use_balancing=cfg.use_kl_balancing),
            axis=-1,
        )) * (cfg.kl_coeff * cfg.w_kl_h)
        loss_dict["kl"] = kl_l
        loss_dict["kl_h"] = kl_h
        loss_dict["loss"] = loss_dict["recon"] + kl_l + kl_h
        return loss_dict
