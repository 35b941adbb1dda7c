"""PHiSeg-TPU: a TPU-native (JAX/Flax/pjit/Pallas) probabilistic segmentation framework.

A from-scratch rebuild of the capabilities of the public PHiSeg reference
implementation (baumgach/PHiSeg-code, MICCAI 2019, arXiv:1906.04045): a
hierarchical conditional-VAE segmentation model that produces samples from
the distribution of plausible segmentations, plus the Probabilistic U-Net
and deterministic U-Net baselines, the LIDC-IDRI data pipeline, training /
evaluation loops and uncertainty metrics (GED^2, S_NCC, Dice).

Design: everything on the compute path is pure-functional JAX compiled by
XLA for TPU; sampling uses explicit PRNG keys and vmap (encode once, draw
many); scaling is via jax.sharding over a device mesh. Nothing here is a
port of the TF1 graph code -- see SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"
