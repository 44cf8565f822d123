"""Serving API: jitted world-model inference for deployment loops.

The reference exposes inference only through ad-hoc script code
(``evaluation/evaluate_word_transitions_mrssm.py:286-372`` re-plumbs
initial_state → rollout_transition → decode by hand). This module packages
the same capabilities behind a small, jit-cached surface intended for
production imagination/serving loops:

- ``WorldModel.observe``: filter a [B, T] observation sequence into
  posterior latents (returns the final latent for continuation).
- ``WorldModel.imagine``: prior-only rollout from a latent under an action
  plan, optionally through the fused Pallas kernel.
- ``WorldModel.decode``: reconstruct both modalities from latents.
- ``WorldModel.from_checkpoint``: config + Orbax checkpoint → ready model.

All methods are jit-compiled once per shape and keep everything on device;
hosts only touch numpy at the edges.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.models.state import MTState, State


class WorldModel:
    """A trained model + params behind jitted inference entry points.

    ``mesh``: optional ``jax.sharding.Mesh`` for batch-parallel serving —
    params are replicated, request batches sharded on axis 0, and GSPMD
    partitions the rollout across chips (the serving-side mirror of the
    trainer's data mesh). The Pallas fast path is single-chip; on a
    multi-device mesh rollouts take the XLA path, which partitions
    automatically.
    """

    def __init__(self, model, params, use_pallas: bool | str = "auto", mesh=None):
        self.model = model
        # True / False / "auto" — auto picks kernel vs XLA per rollout shape
        # from the measured crossovers (ops.pallas.default_use_pallas).
        self.use_pallas = use_pallas
        self.mesh = mesh
        self._bsh = None
        if mesh is not None and mesh.size > 1:
            from multimodal_mtrssm_tpu.parallel.mesh import batch_sharding, replicate

            params = replicate(params, mesh)
            self._bsh = batch_sharding(mesh)
            self.use_pallas = False
        self.params = params
        self._observe = jax.jit(self._observe_impl)
        self._imagine = jax.jit(self._imagine_impl)
        self._decode = jax.jit(lambda p, s: model.decode_state(p, s))

    def _place(self, x):
        """Shard a request array over the mesh batch axis (no-op off-mesh).

        Host arrays go straight to ``device_put`` with the sharding (ONE
        host→shards transfer — staging through ``jnp.asarray`` first would
        add a device0 hop on the serving hot path)."""
        if self._bsh is None:
            return jnp.asarray(x)
        shape = getattr(x, "shape", None)
        if shape is None:
            import numpy as np

            x = np.asarray(x)
            shape = x.shape
        if len(shape) and shape[0] % self.mesh.size == 0:
            return jax.device_put(x, self._bsh)
        return jnp.asarray(x)

    # ---- construction ------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, config_path: str | Path, checkpoint_dir: str | Path,
                        use_pallas: bool | str = "auto", mesh=None) -> "WorldModel":
        from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
        from multimodal_mtrssm_tpu.train.config import load_experiment

        exp = load_experiment(config_path)
        template = exp.model.init(jax.random.PRNGKey(0))
        ckpt = CheckpointManager(checkpoint_dir)
        name = "best" if ckpt.exists("best") else "last"
        if not ckpt.exists(name):
            raise FileNotFoundError(
                f"no 'best' or 'last' checkpoint under {checkpoint_dir} — "
                "point --checkpoint at a run's checkpoints directory"
            )
        state, _ = ckpt.restore(name, {"params": template})
        return cls(exp.model, state["params"], use_pallas=use_pallas, mesh=mesh)

    # ---- inference ---------------------------------------------------------
    def _observe_impl(self, params, actions, audio_obs, vision_obs, key):
        k1, k2 = jax.random.split(key)
        init = self.model.initial_state(params, audio_obs[:, 0], vision_obs[:, 0], k1)
        posterior, prior = self.model.rollout_representation(
            params, actions, audio_obs, vision_obs, init, k2
        )
        return posterior, prior

    def observe(self, actions, audio_obs, vision_obs, key):
        """Filter observations → (posterior, prior) latent sequences [B, T]."""
        return self._observe(self.params, self._place(actions), self._place(audio_obs),
                             self._place(vision_obs), key)

    def _imagine_impl(self, params, actions, prev_state, key):
        from multimodal_mtrssm_tpu.ops.pallas import resolve_use_pallas

        kind = "mt" if isinstance(prev_state, MTState) else "mrssm"
        use_pallas = resolve_use_pallas(
            self.use_pallas, kind, actions.shape[0], actions.shape[1],
            activation=getattr(self.model.cfg, "activation_name", "ELU"),
        )
        if use_pallas and isinstance(prev_state, State):
            from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition, pack_params

            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            deters, logits, stochs = fused_rollout_transition(
                pack_params(params), actions, prev_state.deter, prev_state.stoch, seed,
                class_size=self.model.cfg.class_size,
                category_size=self.model.cfg.category_size,
            )
            return State(
                deter=deters, stoch=stochs,
                distribution=self.model._dist(logits),
            )
        if use_pallas and isinstance(prev_state, MTState):
            from multimodal_mtrssm_tpu.ops.pallas import (
                fused_mt_rollout_transition,
                pack_mt_params,
            )

            cfg = self.model.cfg
            seed = jax.random.randint(key, (), 0, 2**31 - 1)
            init = (prev_state.deter_h, prev_state.deter_l, prev_state.stoch_h,
                    prev_state.stoch_l, prev_state.hidden_h, prev_state.hidden_l)
            (h_deter, l_deter, h_logits, l_logits, h_stoch, l_stoch,
             h_hidden, l_hidden) = fused_mt_rollout_transition(
                pack_mt_params(params), actions, init, seed,
                l_tau=cfg.l_tau, h_tau=cfg.h_tau,
                ls_class=cfg.ls_class, ls_category=cfg.ls_category,
                hs_class=cfg.hs_class, hs_category=cfg.hs_category,
            )
            return MTState(
                deter_h=h_deter, deter_l=l_deter, stoch_h=h_stoch, stoch_l=l_stoch,
                distribution_h=self.model._h_dist(h_logits),
                distribution_l=self.model._l_dist(l_logits),
                # Exact integrator trajectories emitted by the kernel —
                # chained imagine() continuations stay exact even when the
                # tanh saturates.
                hidden_h=h_hidden,
                hidden_l=l_hidden,
            )
        return self.model.rollout_transition(params, actions, prev_state, key)

    def imagine(self, actions, prev_state, key):
        """Prior-only rollout from ``prev_state`` under an action plan."""
        return self._imagine(self.params, self._place(actions), prev_state, key)

    def decode(self, state):
        """Reconstruct both modalities from latents."""
        return self._decode(self.params, state)

    # ---- convenience ---------------------------------------------------------
    def imagine_frames(self, actions, prev_state, key):
        """Imagine and decode in one call → dict of [B, T, H, W, C] frames."""
        return self.decode(self.imagine(actions, prev_state, key))

