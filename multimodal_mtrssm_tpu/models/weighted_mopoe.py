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
from pathlib import Path

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

    def _train_kernel_mode(self, batch: int, horizon: int) -> str | None:
        """The fused training kernel hard-codes equal 1/3 subset weights, so
        this model ALWAYS trains on the XLA scan; an explicit
        ``use_pallas_train`` request is refused loudly instead of silently
        (the base class would have either dispatched the kernel — wrong
        posteriors — or warned)."""
        v = self.cfg.use_pallas_train
        if v not in (False, None, "auto"):
            import warnings

            warnings.warn(
                f"use_pallas_train={v!r} ignored: the fused training kernel "
                "hard-codes equal 1/3 subset weights, which would compute "
                "wrong posteriors for WeightedMoPoEMRSSM; always taking the "
                "XLA scan path",
                stacklevel=3,
            )
        return None

    def _posterior_mix(self, params: Params, deter: jax.Array,
                       a_logits: jax.Array, v_logits: jax.Array) -> tuple[jax.Array, tuple]:
        """Learned-weight MoE mixture (the base class's scan hook): the
        shared ``mopoe_mix_log_probs`` (single home of the unnormalized-PoE
        quirk) with per-step log-weights from the deter head; threads the
        weights [.., 3] out of the scan."""
        from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs

        w_logits = mlp_apply(params["moe_weight_head"], deter, self.cfg.activation_name)
        log_w = jax.nn.log_softmax(w_logits.astype(jnp.float32), axis=-1)
        return mopoe_mix_log_probs(a_logits, v_logits, log_weights=log_w), (jnp.exp(log_w),)

    def rollout_representation_with_weights(
        self, params: Params, actions: jax.Array, audio_obs: jax.Array,
        vision_obs: jax.Array, prev_state: State, key: jax.Array
    ) -> tuple[State, State, jax.Array]:
        """Like the base rollout, additionally returning the learned subset
        weights over time (``weights_timeseries`` [B, T, 3] — the quantity
        the reference's dead callback wanted to plot)."""
        a_raw, v_raw = self._encode_embeds(params, audio_obs, vision_obs)
        posterior, prior, (weights,) = self._scan_representation(
            params, actions, self._conv_out(a_raw), self._conv_out(v_raw), prev_state, key
        )
        return posterior, prior, weights


def plot_weights_timeseries(weights: jax.Array, out_path: str | Path,
                            episode: int = 0) -> object:
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
