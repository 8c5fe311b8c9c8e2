from segmentation_tpu.training import bayesian, losses
from segmentation_tpu.training.adversarial import (
    LucAdversary,
    SmallAdversary,
    prep_adversary_inputs,
)

__all__ = [
    "bayesian",
    "losses",
    "LucAdversary",
    "SmallAdversary",
    "prep_adversary_inputs",
]
