"""On-device uncertainty / accuracy metrics."""

from phiseg_tpu.metrics.metrics import (
    dice_per_label,
    ged_terms,
    generalised_energy_distance,
    ncc,
    pairwise_iou_distance,
    variance_ncc_dist,
)

__all__ = [
    "dice_per_label",
    "ged_terms",
    "generalised_energy_distance",
    "ncc",
    "pairwise_iou_distance",
    "variance_ncc_dist",
]
