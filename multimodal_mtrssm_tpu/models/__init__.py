"""Model families: state pytrees, MoPoE-MRSSM, MoPoE-MMTRSSM."""

from multimodal_mtrssm_tpu.models.mmtrssm import MMTRSSMConfig, MoPoEMMTRSSM
from multimodal_mtrssm_tpu.models.mrssm import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.models.rssm import RSSM, RSSMConfig
from multimodal_mtrssm_tpu.models.weighted_mopoe import (
    WeightedMoPoEMRSSM,
    WeightedMRSSMConfig,
)
from multimodal_mtrssm_tpu.models.state import (
    MTState,
    State,
    cat_states,
    stack_states,
    state_from_logits,
)

__all__ = [
    "MMTRSSMConfig",
    "MRSSMConfig",
    "MoPoEMMTRSSM",
    "RSSM",
    "RSSMConfig",
    "WeightedMRSSMConfig",
    "WeightedMoPoEMRSSM",
    "MTState",
    "MoPoEMRSSM",
    "State",
    "cat_states",
    "stack_states",
    "state_from_logits",
]
