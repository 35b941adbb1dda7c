"""Model zoo: PHiSeg, Probabilistic U-Net and deterministic U-Net families.

TPU-native re-design of the reference model zoo
(`phiseg/model_zoo/{posteriors,priors,likelihoods}.py`). The TF1 pattern of
five shared-variable graph instantiations (phiseg/phiseg_model.py:37-102)
dissolves into a single Flax module (`SegVAE`) with multiple methods over the
same parameter tree, plus an encode-once / sample-many split for fast
multi-sample inference.
"""

from phiseg_tpu.models.components import (
    EncoderTower,
    GaussianHead,
    LatentHierarchy,
    UNetCore,
    default_channels,
)
from phiseg_tpu.models.segvae import ModelOutputs, SegVAE, aggregate_levels

__all__ = [
    "EncoderTower",
    "GaussianHead",
    "LatentHierarchy",
    "UNetCore",
    "default_channels",
    "SegVAE",
    "ModelOutputs",
    "aggregate_levels",
]
