"""CLI end-to-end tests: train -> quantitative eval -> dice eval -> viz -> plots."""

import glob
import json
import os

import numpy as np
import pytest

from phiseg_tpu.engine.config import ExperimentConfig


@pytest.fixture(scope="module")
def trained_logdir(tmp_path_factory):
    """Train a micro phiseg via the CLI once; reuse for all eval CLIs."""
    tmp = tmp_path_factory.mktemp("cli")
    os.environ["PHISEG_LOG_ROOT"] = str(tmp / "logs")
    cfg = ExperimentConfig(
        experiment_name="cli_test",
        model_family="phiseg",
        latent_levels=2,
        resolution_levels=4,
        n0=2,
        zdim0=2,
        image_size=(16, 16, 1),
        compute_dtype="float32",
        norm="none",
        data_identifier="synthetic",
        batch_size=4,
        validation_frequency=8,
        tensorboard_update_frequency=4,
        num_validation_images=4,
        validation_samples=3,
        validation_elbo_samples=2,
        augment_on_device=False,
    )
    cfg_path = str(tmp / "cfg.json")
    cfg.save(cfg_path)

    from phiseg_tpu.cli.train import main as train_main

    train_main([cfg_path, "--num-iter", "17"])
    log_dir = os.path.join(str(tmp / "logs"), cfg.log_dir_name, cfg.experiment_name)
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    return log_dir


def test_train_cli_artifacts(trained_logdir):
    assert glob.glob(os.path.join(trained_logdir, "model.ckpt-*.msgpack"))
    assert glob.glob(os.path.join(trained_logdir, "model_best_dice.ckpt-*.msgpack"))
    assert os.path.exists(os.path.join(trained_logdir, "metrics.jsonl"))


def test_quantitative_cli(trained_logdir):
    from phiseg_tpu.cli.test_quantitative import evaluate

    ged, ncc = evaluate(trained_logdir, num_samples=4, tag="best_ged",
                        batch=4, max_images=4)
    assert ged.shape == (4,) and np.isfinite(ged).all()
    assert ncc.shape == (4,)
    assert os.path.exists(os.path.join(trained_logdir, "ncc4_best_ged.npz"))
    # ged npz: positional arr_0 (reference contract) + term decomposition
    with np.load(os.path.join(trained_logdir, "ged4_best_ged.npz")) as z:
        np.testing.assert_allclose(z["arr_0"], ged)
        np.testing.assert_allclose(2 * z["d_sy"] - z["d_ss"] - z["d_yy"],
                                   ged, rtol=1e-4, atol=1e-5)
        # estimator-floor metadata for downstream aggregation
        assert int(z["n_samples"]) == 4
        assert int(z["n_annotators"]) >= 1


def test_quantitative_cli_mesh_matches_single_device(trained_logdir):
    """--mesh (sample axis sharded over the 8-device CPU mesh) produces the
    same GED/NCC as single-device eval (same keys, same draws)."""
    from phiseg_tpu.cli.test_quantitative import evaluate

    ged1, ncc1 = evaluate(trained_logdir, num_samples=8, tag="best_ged",
                          batch=4, max_images=4)
    gedm, nccm = evaluate(trained_logdir, num_samples=8, tag="best_ged",
                          batch=4, max_images=4, mesh=True)
    np.testing.assert_allclose(gedm, ged1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(nccm, ncc1, rtol=1e-4, atol=1e-5)


def test_predictions_cli_mesh_matches_single_device(trained_logdir):
    from phiseg_tpu.cli.test_predictions import evaluate

    d1 = evaluate(trained_logdir, num_samples=8, tag="best_dice",
                  batch=4, max_images=4)
    dm = evaluate(trained_logdir, num_samples=8, tag="best_dice",
                  batch=4, max_images=4, mesh=True)
    np.testing.assert_allclose(dm, d1, rtol=1e-4, atol=1e-5)


def test_predictions_cli(trained_logdir):
    from phiseg_tpu.cli.test_predictions import evaluate

    dice = evaluate(trained_logdir, num_samples=4, tag="best_dice",
                    batch=4, max_images=4)
    assert dice.shape == (4, 2)
    assert ((dice >= 0) & (dice <= 1)).all()
    assert os.path.exists(os.path.join(trained_logdir, "dice_best_dice.npz"))


def test_generate_samples_cli(trained_logdir):
    from phiseg_tpu.cli.generate_samples import generate

    out = generate(trained_logdir, num_samples=4, tag="best_ged", indices=[0])
    assert glob.glob(os.path.join(out, "samples_img0_*.png"))


def test_sample_construction_cli(trained_logdir):
    from phiseg_tpu.cli.sample_construction import generate

    out = generate(trained_logdir, tag="best_ged", indices=[0])
    assert glob.glob(os.path.join(out, "construction_img0_*.png"))


def test_makegif_cli(trained_logdir):
    from phiseg_tpu.cli.makegif_samples import generate

    out = generate(trained_logdir, num_samples=3, tag="best_ged", indices=[0])
    gifs = glob.glob(os.path.join(out, "samples_img0_*.gif"))
    assert gifs
    with open(gifs[0], "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


def test_eval_plots_cli(trained_logdir, tmp_path):
    from phiseg_tpu.cli.eval_plots import aggregate

    f = os.path.join(trained_logdir, "ged4_best_ged.npz")
    res = aggregate("ged", [f, f], names=["a", "b"], plot=str(tmp_path / "box.png"))
    assert "a vs b" in res["ttests"] or res["means"]["a"] == res["means"]["b"]
    assert os.path.exists(tmp_path / "box.png")


def test_train_cli_named_experiment_resolution():
    from phiseg_tpu.cli.train import resolve_config

    cfg = resolve_config("phiseg_7_5")
    assert cfg.experiment_name == "phiseg_7_5"
    with pytest.raises(KeyError):
        resolve_config("not_an_experiment")


def test_eval_plots_unbiased_ged(tmp_path):
    """With the term decomposition in the npz, aggregate() reports the
    self-pair-corrected (unbiased) GED^2 alongside the reference's biased
    estimator. For a perfectly calibrated sampler (d_sy == d-bar,
    d_ss == (1-1/N)d-bar, d_yy == (1-1/M)d-bar) the biased GED^2 equals the
    (1/N+1/M)d-bar floor while the unbiased one is exactly zero."""
    import numpy as np

    from phiseg_tpu.cli.eval_plots import aggregate

    n_img, n_s, n_a, dbar = 16, 50, 4, 0.4
    rng = np.random.RandomState(0)
    d_sy = np.full(n_img, dbar) + rng.normal(0, 1e-9, n_img)
    d_ss = np.full(n_img, (1 - 1 / n_s) * dbar)
    d_yy = np.full(n_img, (1 - 1 / n_a) * dbar)
    ged = 2 * d_sy - d_ss - d_yy  # biased estimator == floor
    f = str(tmp_path / "ged50_best_ged.npz")
    np.savez(f, ged, d_sy=d_sy, d_ss=d_ss, d_yy=d_yy,
             n_samples=np.asarray(n_s), n_annotators=np.asarray(n_a))

    res = aggregate("ged", [f, f], names=["a", "b"])
    assert abs(res["means"]["a"] - (1 / n_s + 1 / n_a) * dbar) < 1e-6
    assert abs(res["unbiased_means"]["a"]) < 1e-6
    assert "a vs b" in res["ttests_unbiased"]
