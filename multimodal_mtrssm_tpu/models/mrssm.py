"""MoPoE-MRSSM: multimodal RSSM with Mixture-of-Products-of-Experts posteriors.

TPU-native rebuild of the reference model (reference
``src/multimodal_rssm/models/mrssm/mopoe_mrssm/core.py:12-355`` on top of
``models/core.py:13-266`` and ``models/networks.py:18-173``). Semantics are
replicated exactly (including the unnormalized PoE term inside the MoE
mixture, reference ``mopoe_mrssm/core.py:240-251``); the implementation is
redesigned for XLA:

- The per-timestep recurrence is a single fused ``lax.scan`` step (the
  reference runs a Python ``for t in range(T)`` loop of ~6 tiny CUDA
  launches per step, ``core.py:159-164``). Under ``jit`` the scan compiles
  to one on-device loop.
- Encoders/decoders run once over the flattened [B·T] frame batch — big
  MXU-friendly convs (reference batches the same way,
  ``mopoe_mrssm/core.py:215-216,272-273``).
- RNG is an explicit per-step key array threaded through the scan
  (replacing torch's implicit global RNG in ``rsample``).
- All state flows through ``State`` pytrees; nothing is mutable.
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
from multimodal_mtrssm_tpu.nn.core import (
    Params,
    gru_init,
    mlp_apply,
    mlp_init,
    rssm_transition_core,
)
from multimodal_mtrssm_tpu.models.state import State
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot, kl_balanced
from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs
from multimodal_mtrssm_tpu.ops.likelihood import gaussian_nll


@dataclasses.dataclass(frozen=True)
class MRSSMConfig:
    """Static hyperparameters (defaults = reference
    ``mopoe_mrssm/configs/default.yaml:7-101``)."""

    deterministic_size: int = 32
    hidden_size: int = 32
    obs_embed_size: int = 64
    class_size: int = 4
    category_size: int = 4
    action_size: int = 6
    activation_name: str = "ELU"
    init_proj_cells: int = 200
    # The reference's init_proj is a torchrl MLP with NO activation_class in
    # its config (reference configs :93-99) ⇒ torchrl's default hidden
    # activation, Tanh — unlike the explicit ELU everywhere else.
    init_proj_activation: str = "Tanh"
    kl_coeff: float = 1.0
    use_kl_balancing: bool = True
    # Input-noise std applied on device inside shared_step (TPU-native home
    # of the reference's host-side GaussianNoise input transform, reference
    # configs :157-220 — host generation of ~0.5M gaussians/batch costs as
    # much as the whole train step). 0 disables (host pipeline noise then).
    # A scalar applies to all three input streams; a 3-tuple sets
    # (action, audio, vision) stds independently, matching the reference's
    # per-stream transform composition.
    input_noise_std: float | tuple[float, float, float] = 0.0
    # Rematerialize the scan step in the backward pass: trades recompute for
    # O(1)-per-step activation memory — enables full-length (T=180+) training
    # at large batch (SURVEY §5.7 long-sequence story).
    remat: bool = False
    # lax.scan unroll factor for the recurrence (hardware-dependent tuning
    # knob; 1 = compiler default loop).
    scan_unroll: int = 1
    # Fused Pallas TRAINING recurrence (SURVEY §7.7): run the whole T-step
    # representation recurrence (transition + posterior heads + MoPoE fusion
    # + ST sampling) as one Pallas program with a hand-derived backward
    # kernel (ops/pallas/train_step.py). Values:
    #   "auto"      — kernel on TPU when eligible and measured-faster
    #                 (ops.pallas.train_step.AUTO_TRAIN_KERNEL policy);
    #   True        — kernel whenever eligible (ELU, f32, VMEM fits);
    #   False       — always the XLA lax.scan path;
    #   "interpret" — kernel in interpreter mode (CPU tests);
    #   "reference" — the kernel's pure-JAX twin (same pre-generated-Gumbel
    #                 RNG layout, XLA execution; equivalence testing);
    #   "stacked"   — the stacked-layout kernel variant (fewer, larger
    #                 matmuls per step — ops/pallas/train_step_stacked.py);
    #   "stacked_interpret" — its interpreter mode (CPU tests).
    # RNG NOTE: the kernel path draws its per-step Gumbel noise from two
    # bulk jax.random.gumbel calls instead of per-step key splits — the
    # sampling DISTRIBUTION is identical but the stream differs, so
    # trajectories are not bit-comparable across the two paths.
    use_pallas_train: bool | str = "auto"
    audio_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    vision_encoder: EncoderConfig = dataclasses.field(default_factory=EncoderConfig)
    audio_decoder: DecoderConfig | None = None
    vision_decoder: DecoderConfig | None = None
    compute_dtype: Any = jnp.float32
    # Conv-stack compute dtype (None = compute_dtype). bf16 convs halve the
    # conv HBM traffic and double MXU rate while the recurrence (and the
    # fused Pallas training kernel, which requires f32 compute) stays f32 —
    # a mixed setup full-model bf16 cannot express because it disables the
    # kernel. Embeddings/reconstructions are cast back to compute_dtype at
    # the conv boundary; the ELBO ops upcast to f32 internally regardless.
    conv_dtype: Any = None
    # Conv-stack layout: "auto" (default), "nhwc" (canonical) or "s2d" —
    # the space-to-depth exact re-expression of narrow conv stacks
    # (nn/conv.py): every k3 s2 conv reads 4× the input lanes and the last
    # deconv emits depth-to-space phases, recovering part of the 128-lane
    # padding waste the roofline analysis measured (BASELINE.md; isolated
    # conv win 1.05-1.11× on-chip, exact to ≤3e-8). Same params, same math
    # (pinned by tests/test_s2d_layout.py): encoders switch layout
    # everywhere, the TRAINING loss compares phase reconstructions against
    # s2d'd targets, and decode_state/viz/eval/serving always emit
    # canonical frames. Explicit "s2d" requires the stacks to be
    # s2d-eligible; construction raises otherwise. The win is
    # width-dependent (the re-expression costs 16/9× nominal taps per
    # mid-stack conv): the toy-width reference stacks measured B=128
    # 1.086×, B=8 1.043×, B=32 neutral (2026-08-19), while the 27M
    # wide-channel config measured 0.93× (2026-08-20) — so "auto" picks
    # s2d exactly when every expanded read fits one 128-lane tile
    # (nn.conv.s2d_auto_profitable), nhwc otherwise. "nhwc" restores the
    # canonical layout (bit-identical streams to pre-s2d runs).
    conv_layout: str = "auto"

    @property
    def stoch_size(self) -> int:
        return self.class_size * self.category_size

    @property
    def feature_size(self) -> int:
        return self.deterministic_size + self.stoch_size

    def decoder_cfg(self, which: str) -> DecoderConfig:
        cfg = getattr(self, f"{which}_decoder")
        return cfg if cfg is not None else DecoderConfig(in_features=self.feature_size)


def _resolve_conv_layout(
    layout: str,
    encoder_cfgs: tuple[EncoderConfig, ...],
    decoder_cfgs: tuple[DecoderConfig, ...],
) -> str:
    """Validate a ``conv_layout`` config value against the model's conv
    stacks. Returns the resolved mode: "nhwc", "s2d", or "fused_enc" (the
    VMEM-resident Pallas encoder kernels, ``ops/pallas/fused_conv.py``,
    with nhwc decoders). Explicit "s2d"/"fused_enc" raise when some stack
    cannot be re-expressed exactly (a silent fallback would misreport what
    the benchmark measured); "auto" resolves via the measured-width
    heuristic (:func:`~multimodal_mtrssm_tpu.nn.conv.s2d_auto_profitable`)."""
    if layout == "nhwc":
        return "nhwc"
    if layout == "auto":
        from multimodal_mtrssm_tpu.nn.conv import s2d_auto_profitable

        return "s2d" if s2d_auto_profitable(encoder_cfgs, decoder_cfgs) else "nhwc"
    if layout == "fused_enc":
        from multimodal_mtrssm_tpu.ops.pallas.fused_conv import (
            fused_encoder_applicable,
        )

        bad = [f"encoder[{i}]" for i, c in enumerate(encoder_cfgs)
               if not fused_encoder_applicable(c)]
        if bad:
            raise ValueError(
                "conv_layout='fused_enc' requires reference-shaped encoder "
                f"stacks (3× k3 s2 p1 from 32×32, ELU, one linear); not: {bad}"
            )
        return "fused_enc"
    if layout != "s2d":
        raise ValueError(
            f"conv_layout must be 'auto', 'nhwc', 's2d' or 'fused_enc', got {layout!r}"
        )
    from multimodal_mtrssm_tpu.nn.conv import (
        decoder_s2d_applicable,
        encoder_s2d_applicable,
    )

    bad = [f"encoder[{i}]" for i, c in enumerate(encoder_cfgs) if not encoder_s2d_applicable(c)]
    bad += [f"decoder[{i}]" for i, c in enumerate(decoder_cfgs) if not decoder_s2d_applicable(c)]
    if bad:
        raise ValueError(
            "conv_layout='s2d' requires every conv stack to be s2d-eligible "
            f"(k3 s2 p1 convs / k4 s2 p1 last deconv, even spatial dims); not: {bad}"
        )
    return "s2d"


class MoPoEMRSSM:
    """Functional MoPoE-MRSSM: static config + pure methods over a param pytree."""

    def __init__(self, config: MRSSMConfig | None = None):
        self.cfg = config or MRSSMConfig()
        # Device count of the mesh this model trains on; the Trainer sets it
        # after resolving its mesh (None = consult the global backend).
        self.mesh_devices: int | None = None
        mode = _resolve_conv_layout(
            self.cfg.conv_layout,
            (self.cfg.audio_encoder, self.cfg.vision_encoder),
            (self.decoder_cfg("audio"), self.decoder_cfg("vision")),
        )
        self._use_s2d = mode == "s2d"
        self._use_fused_enc = mode == "fused_enc"

    # ---- init ------------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        cfg = self.cfg
        keys = jax.random.split(key, 10)
        stoch = cfg.stoch_size
        params: Params = {
            # Transition (prior head), reference networks.py:87-173.
            "transition": {
                "action_state_projector": mlp_init(
                    keys[0], cfg.action_size + stoch, cfg.hidden_size, cfg.hidden_size, depth=1
                ),
                "gru": gru_init(keys[1], cfg.hidden_size, cfg.deterministic_size),
                "rnn_to_prior_projector": mlp_init(
                    keys[2], cfg.deterministic_size, stoch, cfg.hidden_size, depth=1
                ),
            },
            # Two posterior heads (Representation), reference networks.py:18-84.
            "audio_representation": mlp_init(
                keys[3], cfg.deterministic_size + cfg.obs_embed_size, stoch, cfg.hidden_size, depth=1
            ),
            "vision_representation": mlp_init(
                keys[4], cfg.deterministic_size + cfg.obs_embed_size, stoch, cfg.hidden_size, depth=1
            ),
            "audio_encoder": encoder_init(keys[5], cfg.audio_encoder),
            "vision_encoder": encoder_init(keys[6], cfg.vision_encoder),
            "audio_decoder": decoder_init(keys[7], self.decoder_cfg("audio")),
            "vision_decoder": decoder_init(keys[8], self.decoder_cfg("vision")),
            # init_proj: obs_embed → deter, reference configs :93-99 (200 cells).
            "init_proj": mlp_init(
                keys[9], cfg.obs_embed_size, cfg.deterministic_size, cfg.init_proj_cells, depth=1
            ),
        }
        return params

    def decoder_cfg(self, which: str) -> DecoderConfig:
        return self.cfg.decoder_cfg(which)

    # ---- building blocks ---------------------------------------------------
    def _dist(self, logits: jax.Array) -> MultiOneHot:
        return MultiOneHot(
            logits=logits, class_size=self.cfg.class_size, category_size=self.cfg.category_size
        )

    def _conv_in(self, x: jax.Array) -> jax.Array:
        """Cast a conv-stack input per the shared mixed-precision policy."""
        from multimodal_mtrssm_tpu.nn.conv import cast_conv_in

        return cast_conv_in(self.cfg, x)

    def _conv_out(self, x: jax.Array) -> jax.Array:
        """Cast a conv-stack output back to the model compute dtype."""
        from multimodal_mtrssm_tpu.nn.conv import cast_conv_out

        return cast_conv_out(self.cfg, x)

    def _encode_embeds(self, params: Params, audio_obs: jax.Array, vision_obs: jax.Array):
        """Raw (conv-dtype) encoder outputs for both modalities — the single
        home of the encoder call pair, shared by ``encode_observation``,
        the rollouts, and ``shared_step`` (which reuses one pass for both
        the initial state and the recurrence instead of re-encoding
        frame 0)."""
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
        """Mean-fused embedding (reference ``mopoe_mrssm/core.py:165-182``)."""
        a, v = self._encode_embeds(params, audio_obs, vision_obs)
        return self._conv_out((a + v) / 2.0)

    def transition(self, params: Params, action: jax.Array, prev_state: State, key: jax.Array) -> State:
        """Prior step (reference ``networks.py:151-173``)."""
        deter, logits = self._transition_core(params, action, prev_state.stoch, prev_state.deter)
        dist = self._dist(logits)
        return State(deter=deter, stoch=dist.rsample(key), distribution=dist)

    def _transition_core(
        self, params: Params, action: jax.Array, prev_stoch: jax.Array, prev_deter: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        return rssm_transition_core(
            params["transition"], action, prev_stoch, prev_deter, self.cfg.activation_name
        )

    def _posterior_logits(
        self, params: Params, which: str, deter: jax.Array, obs_embed: jax.Array
    ) -> jax.Array:
        """Posterior head logits (reference ``mopoe_mrssm/core.py:62-84``:
        input = cat(deter, obs_embed))."""
        x = jnp.concatenate([deter, obs_embed], axis=-1)
        return mlp_apply(params[f"{which}_representation"], x, self.cfg.activation_name)

    # ---- public API (reference BaseRSSM surface) ---------------------------
    def initial_state(
        self, params: Params, audio_obs0: jax.Array, vision_obs0: jax.Array, key: jax.Array
    ) -> State:
        """Initial latent from frame-0 observations (reference ``core.py:121-135``)."""
        embed = self.encode_observation(params, audio_obs0, vision_obs0)
        return self.initial_state_from_embed(params, embed, key)

    def initial_state_from_embed(self, params: Params, embed: jax.Array, key: jax.Array) -> State:
        """``initial_state`` from a pre-computed mean-fused embedding —
        lets ``shared_step`` reuse the rollout's encoder pass for frame 0
        instead of running both conv stacks a second time."""
        deter = mlp_apply(params["init_proj"], embed, self.cfg.init_proj_activation)
        logits = mlp_apply(
            params["transition"]["rnn_to_prior_projector"], deter, self.cfg.activation_name
        )
        dist = self._dist(logits)
        return State(deter=deter, stoch=dist.rsample(key), distribution=dist)

    def rollout_representation(
        self,
        params: Params,
        actions: jax.Array,
        audio_obs: jax.Array,
        vision_obs: jax.Array,
        prev_state: State,
        key: jax.Array,
    ) -> tuple[State, State]:
        """Posterior/prior rollout over [B, T] (reference
        ``mopoe_mrssm/core.py:184-260``), as one ``lax.scan``.

        Returns ``(posterior, prior)`` with time on axis 1.
        """
        a_raw, v_raw = self._encode_embeds(params, audio_obs, vision_obs)
        return self._rollout_from_embeds(
            params, actions, self._conv_out(a_raw), self._conv_out(v_raw), prev_state, key
        )

    def _rollout_from_embeds(
        self, params, actions, audio_embed, vision_embed, prev_state, key
    ) -> tuple[State, State]:
        """Representation rollout from pre-computed per-modality embeddings
        (kernel dispatch + XLA-scan fallback)."""
        mode = self._train_kernel_mode(actions.shape[0], actions.shape[1])
        if mode is not None:
            return self._rollout_representation_fused(
                params, actions, audio_embed, vision_embed, prev_state, key, mode
            )
        posterior, prior, _ = self._scan_representation(
            params, actions, audio_embed, vision_embed, prev_state, key
        )
        return posterior, prior

    def _posterior_mix(
        self, params: Params, deter: jax.Array, a_logits: jax.Array, v_logits: jax.Array
    ) -> tuple[jax.Array, tuple]:
        """Posterior subset mixture for one step: (mixed logits, extras).
        Subclass hook — ``WeightedMoPoEMRSSM`` overrides this to apply its
        learned subset weights and thread them out of the scan."""
        return mopoe_mix_log_probs(a_logits, v_logits), ()

    def _scan_representation(
        self, params, actions, audio_embed, vision_embed, prev_state, key
    ) -> tuple[State, State, tuple]:
        """XLA-scan representation recurrence. Returns ``(posterior, prior,
        extras)`` where ``extras`` is whatever ``_posterior_mix`` threads
        per step (time moved to axis 1)."""
        cfg = self.cfg
        T = actions.shape[1]
        step_keys = jax.random.split(key, T)

        def step(carry, xs):
            prev_deter, prev_stoch = carry
            action_t, a_emb_t, v_emb_t, k = xs
            k_prior, k_post = jax.random.split(k)
            deter, prior_logits = self._transition_core(params, action_t, prev_stoch, prev_deter)
            prior_dist = self._dist(prior_logits)
            prior_stoch = prior_dist.rsample(k_prior)
            a_logits = self._posterior_logits(params, "audio", deter, a_emb_t)
            v_logits = self._posterior_logits(params, "vision", deter, v_emb_t)
            mixed_logits, extras = self._posterior_mix(params, deter, a_logits, v_logits)
            post_dist = self._dist(mixed_logits)
            post_stoch = post_dist.rsample(k_post)
            # Mixed posterior becomes the next prev_state (reference :256).
            # Samples are f32 (ops force f32 math); the carry runs in the
            # compute dtype so the recurrence stays on the bf16 path.
            carry = (deter, post_stoch.astype(deter.dtype))
            ys = ((deter, prior_logits, prior_stoch, mixed_logits, post_stoch), extras)
            return carry, ys

        # Scan is time-major; transpose once afterwards ([T, B, …] → [B, T, …]).
        xs = (
            jnp.swapaxes(actions, 0, 1),
            jnp.swapaxes(audio_embed, 0, 1),
            jnp.swapaxes(vision_embed, 0, 1),
            step_keys,
        )
        if cfg.remat:
            step = jax.checkpoint(step)
        _, ((deter, prior_logits, prior_stoch, mixed_logits, post_stoch), extras) = jax.lax.scan(
            step, (prev_state.deter, prev_state.stoch.astype(prev_state.deter.dtype)), xs,
            unroll=cfg.scan_unroll,
        )
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        prior = State(deter=tm(deter), stoch=tm(prior_stoch), distribution=self._dist(tm(prior_logits)))
        posterior = State(deter=tm(deter), stoch=tm(post_stoch), distribution=self._dist(tm(mixed_logits)))
        return posterior, prior, jax.tree.map(tm, extras)

    def _train_kernel_mode(self, batch: int, horizon: int) -> str | None:
        """Resolve ``use_pallas_train`` to a concrete mode (None = XLA scan).

        Eligibility: ELU activation (the kernel hard-codes it), f32 compute
        (the kernel is an f32 program; bf16 configs keep the XLA path), and
        the single-program VMEM budget (``fits_vmem``). The dispatch ladder
        itself is shared (``ops.pallas.resolve_train_kernel_mode``)."""
        from multimodal_mtrssm_tpu.ops.pallas import fits_vmem, resolve_train_kernel_mode
        from multimodal_mtrssm_tpu.ops.pallas.train_step import (
            AUTO_TRAIN_KERNEL,
            AUTO_TRAIN_KERNEL_CHUNKED,
        )

        # Single-block VMEM fit gates the stacked variant (single-block
        # only); "auto" and an explicit True run oversized [T, B] through
        # the TIME-CHUNKED grid kernels (train_step.py chunked variants) —
        # measured-win policy per regime: AUTO_TRAIN_KERNEL (single-block)
        # / AUTO_TRAIN_KERNEL_CHUNKED (chunked, 2026-08-19 B=128 A/B).
        single_fit = fits_vmem(
            horizon, batch,
            action_size=self.cfg.action_size,
            stoch_size=self.cfg.stoch_size,
            deter_size=self.cfg.deterministic_size,
            obs_embed_size=self.cfg.obs_embed_size,
        )
        mode = resolve_train_kernel_mode(
            self.cfg.use_pallas_train,
            eligible=(
                self.cfg.activation_name == "ELU"
                and self.cfg.compute_dtype == jnp.float32
            ),
            auto_flag=AUTO_TRAIN_KERNEL and (single_fit or AUTO_TRAIN_KERNEL_CHUNKED),
            warn_ineligible=(
                "use_pallas_train=True ignored: the fused training kernel "
                "requires ELU + float32; taking the XLA scan path"
            ),
            n_devices=getattr(self, "mesh_devices", None),
        )
        if mode in ("stacked", "stacked_interpret") and not single_fit:
            import warnings

            warnings.warn(
                "use_pallas_train='stacked' has no time-chunked variant; "
                "[T, B] exceeds the single-block VMEM budget — dispatching "
                "the chunked regular kernel instead",
                stacklevel=3,
            )
            mode = "interpret" if mode == "stacked_interpret" else "kernel"
        return mode

    def _rollout_representation_fused(
        self, params, actions, audio_embed, vision_embed, prev_state, key, mode: str
    ) -> tuple[State, State]:
        """Representation rollout through the fused Pallas training kernel
        (or its pure-JAX twin) — same outputs as the scan path, RNG drawn as
        bulk Gumbel noise (see ``use_pallas_train`` docstring)."""
        from multimodal_mtrssm_tpu.ops.pallas import (
            fused_train_recurrence,
            fused_train_recurrence_stacked,
            pack_train_params,
            reference_train_recurrence,
        )

        cfg = self.cfg
        B, T = actions.shape[:2]
        S = cfg.stoch_size
        k1, k2 = jax.random.split(key)
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
        args = (
            pack_train_params(params),
            f32(tm(actions)), f32(tm(audio_embed)), f32(tm(vision_embed)),
            f32(prev_state.deter), f32(prev_state.stoch),
            jax.random.gumbel(k1, (T, B, S), jnp.float32),
            jax.random.gumbel(k2, (T, B, S), jnp.float32),
        )
        if mode == "reference":
            outs = reference_train_recurrence(
                *args, class_size=cfg.class_size, category_size=cfg.category_size
            )
        elif mode in ("stacked", "stacked_interpret"):
            outs = fused_train_recurrence_stacked(
                *args, class_size=cfg.class_size, category_size=cfg.category_size,
                interpret=(mode == "stacked_interpret"),
            )
        else:
            outs = fused_train_recurrence(
                *args, class_size=cfg.class_size, category_size=cfg.category_size,
                interpret=(mode == "interpret"),
            )
        deter, prior_logits, prior_stoch, mixed, post_stoch = (tm(o) for o in outs)
        prior = State(deter=deter, stoch=prior_stoch, distribution=self._dist(prior_logits))
        posterior = State(deter=deter, stoch=post_stoch, distribution=self._dist(mixed))
        return posterior, prior

    def rollout_transition(
        self, params: Params, actions: jax.Array, prev_state: State, key: jax.Array
    ) -> State:
        """Prior-only imagination rollout (reference ``core.py:170-185``)."""
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
            unroll=self.cfg.scan_unroll,
        )
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # noqa: E731
        return State(deter=tm(deter), stoch=tm(stoch), distribution=self._dist(tm(logits)))

    def decode_state(self, params: Params, state: State) -> dict[str, jax.Array]:
        """Decode both modalities from features (reference
        ``mopoe_mrssm/core.py:262-277``)."""
        feature = self._conv_in(state.feature)
        return {
            "recon/audio": self._conv_out(
                decoder_apply(params["audio_decoder"], self.decoder_cfg("audio"), feature)
            ),
            "recon/vision": self._conv_out(
                decoder_apply(params["vision_decoder"], self.decoder_cfg("vision"), feature)
            ),
        }

    def _decode_for_loss(
        self,
        params: Params,
        posterior: State,
        audio_target: jax.Array,
        vision_target: jax.Array,
    ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
        """(reconstructions, targets) for the training NLL. Canonical
        layout: ``decode_state`` frames vs raw targets. s2d layout: the
        last deconv emits depth-to-space phases and the targets are
        s2d'd to match — the Gaussian NLL sums over the event dims, so
        the loss is identical (a spatial permutation of the summands)
        without ever materializing the full-res frames."""
        if not self._use_s2d:
            recons = self.decode_state(params, posterior)
            return recons, {"recon/audio": audio_target, "recon/vision": vision_target}
        from multimodal_mtrssm_tpu.nn.conv import decoder_apply_s2d, space_to_depth

        feature = self._conv_in(posterior.feature)
        recons = {
            "recon/audio": self._conv_out(
                decoder_apply_s2d(params["audio_decoder"], self.decoder_cfg("audio"), feature)
            ),
            "recon/vision": self._conv_out(
                decoder_apply_s2d(params["vision_decoder"], self.decoder_cfg("vision"), feature)
            ),
        }
        return recons, {
            "recon/audio": space_to_depth(audio_target),
            "recon/vision": space_to_depth(vision_target),
        }

    def compute_reconstruction_loss(
        self, reconstructions: dict[str, jax.Array], targets: dict[str, jax.Array]
    ) -> dict[str, jax.Array]:
        """Per-modality Gaussian NLL, summed (reference
        ``mopoe_mrssm/core.py:279-308``; event_ndims=3)."""
        audio = gaussian_nll(reconstructions["recon/audio"], targets["recon/audio"], event_ndims=3)
        vision = gaussian_nll(reconstructions["recon/vision"], targets["recon/vision"], event_ndims=3)
        return {"recon": audio + vision, "recon/audio": audio, "recon/vision": vision}

    def shared_step(
        self, params: Params, batch: tuple[jax.Array, ...], key: jax.Array
    ) -> dict[str, jax.Array]:
        """Full ELBO step (reference ``core.py:187-221``).

        ``batch`` order matches the reference's 6-way StackDataset
        (reference ``mrssm/dataset.py:168-183``):
        (action_input, audio_in, vision_in, action_target, audio_target,
        vision_target); observations are NHWC ``[B, T, H, W, C]``.
        """
        action_input, audio_in, vision_in = batch[0], batch[1], batch[2]
        k_init, k_roll, k_noise = jax.random.split(key, 3)
        stds = _stream_stds(self.cfg.input_noise_std)
        if any(s > 0 for s in stds):
            action_input, audio_in, vision_in = _add_input_noise(
                k_noise, stds, action_input, audio_in, vision_in
            )
        dt = self.cfg.compute_dtype
        # One encoder pass serves BOTH the initial state (frame 0) and the
        # recurrence — the reference re-encodes frame 0 inside initial_state
        # (reference core.py:121-135 + 215-216), an extra [B]-frame pass
        # through both conv stacks every training step (~1/T of conv FLOPs).
        # Numerics are identical: convs are per-sample, and the frame-0 mean
        # fusion below is exactly encode_observation's (raw conv-dtype mean,
        # then one cast).
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
        # KL over time: .independent(1) sums KL across T, then batch-mean
        # (reference core.py:212-218 via distribution_extension.kl_divergence).
        kl_bt = kl_balanced(
            posterior.distribution, prior.distribution, use_balancing=self.cfg.use_kl_balancing
        )  # [B, T]
        kl = jnp.mean(jnp.sum(kl_bt, axis=-1)) * self.cfg.kl_coeff
        loss_dict["kl"] = kl
        loss_dict["loss"] = loss_dict["recon"] + kl
        return loss_dict


def _stream_stds(std: float | tuple) -> tuple[float, ...]:
    """Normalize a noise-std config value to per-stream (action, audio,
    vision) floats."""
    if isinstance(std, (tuple, list)):
        return tuple(float(s) for s in std)
    return (float(std),) * 3


def _add_input_noise(key: jax.Array, stds, *streams: jax.Array) -> tuple[jax.Array, ...]:
    """GaussianNoise on input streams, fused on device (reference
    ``transform.py:55-72`` applied it per-episode on host). ``stds`` is one
    float per stream; 0 leaves that stream clean."""
    keys = jax.random.split(key, len(streams))
    return tuple(
        x if s == 0 else x + s * jax.random.normal(k, x.shape, jnp.float32).astype(x.dtype)
        for k, s, x in zip(keys, stds, streams)
    )
