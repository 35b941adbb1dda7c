"""Experiment registry: parity with the reference config set."""

import pytest

from phiseg_tpu.experiments import get_experiment, list_experiments


def test_all_reference_experiments_present():
    names = list_experiments()
    for ref in ["phiseg_7_5", "phiseg_7_1", "probunet", "detunet",
                "phiseg_7_5_1annot", "phiseg_7_1_1annot", "probunet_1annot"]:
        assert ref in names, f"missing reference experiment {ref}"
        assert ref + "_synth" in names


def test_phiseg_7_5_hyperparams_match_reference():
    """ref phiseg/experiments/phiseg_7_5.py:15-56."""
    cfg = get_experiment("phiseg_7_5")
    assert cfg.model_family == "phiseg"
    assert cfg.latent_levels == 5
    assert cfg.resolution_levels == 7
    assert cfg.n0 == 32
    assert cfg.zdim0 == 2
    assert cfg.image_size == (128, 128, 1)
    assert cfg.nlabels == 2
    assert cfg.num_labels_per_subject == 4
    assert cfg.batch_size == 12
    assert cfg.lr_schedule == {0: 1e-3}
    assert cfg.optimizer == "adam"
    assert cfg.kl_divergence_loss_weight == 1.0
    assert cfg.exponential_weighting is True
    assert cfg.residual_multinoulli_loss_weight == 1.0
    assert cfg.validation_frequency == 500
    assert cfg.validation_samples == 16
    assert cfg.num_validation_images == 100
    assert cfg.norm == "batch"


def test_variant_diffs():
    assert get_experiment("phiseg_7_1").latent_levels == 1
    pu = get_experiment("probunet")
    assert pu.model_family == "prob_unet" and pu.zdim0 == 6
    du = get_experiment("detunet")
    assert du.model_family == "det_unet"
    assert du.kl_divergence_loss_weight is None
    assert du.annotator_range == (0,)
    assert du.log_dir_name == "lidc2"
    assert get_experiment("phiseg_7_5_1annot").annotator_range == (0,)


def test_synth_variants():
    cfg = get_experiment("phiseg_7_5_synth")
    assert cfg.data_identifier == "synthetic"


def test_bfxl_pair():
    # large-data bfield pair: identical to the *_bf configs except 8x train
    # data; the decisive-pair comparison stays matched-budget (24k steps).
    xl = get_experiment("phiseg_7_5_bfxl")
    bf = get_experiment("phiseg_7_5_bf")
    assert xl.synth_task == bf.synth_task == "bfield"
    assert xl.synth_n_train == 4096 and bf.synth_n_train == 512
    assert (xl.synth_n_val, xl.synth_n_test) == (bf.synth_n_val, bf.synth_n_test)
    assert xl.log_dir_name == "lidc_bfxl"
    pu = get_experiment("probunet_bfxl")
    assert pu.model_family == "prob_unet" and pu.synth_n_train == 4096


def test_unknown_experiment():
    with pytest.raises(KeyError):
        get_experiment("nope")
