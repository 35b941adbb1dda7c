"""Per-level / per-layer diagnostics (TB monitoring parity, ref
phiseg_model.py:704-776 + tfwrapper/layers.py:671-677)."""

import jax
import jax.numpy as jnp
import numpy as np

from phiseg_tpu.engine import build_model
from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.nn.losses import one_hot
from phiseg_tpu.utils.diagnostics import (
    first_conv_kernel,
    make_diag_fn,
    make_param_hist_fn,
    tensor_histogram,
)
from phiseg_tpu.utils.image_grid import kernels_to_grid


def tiny_cfg(**kw):
    base = dict(model_family="phiseg", latent_levels=3, resolution_levels=5,
                n0=4, image_size=(32, 32, 1), compute_dtype="float32")
    base.update(kw)
    return ExperimentConfig(**base)


def init_model(cfg):
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    h, w, c = cfg.image_size
    x = jnp.zeros((2, h, w, c), jnp.float32)
    s = jnp.zeros((2, h, w), jnp.int32)
    variables = model.init({"params": rng}, x, one_hot(s, cfg.nlabels), rng,
                           train=True)
    return model, variables, x, s


def test_tensor_histogram_matches_numpy():
    v = jnp.asarray(np.random.RandomState(0).randn(257).astype(np.float32))
    h = jax.device_get(tensor_histogram(v, bins=20))
    np_counts, np_edges = np.histogram(np.asarray(v), bins=20)
    np.testing.assert_allclose(h["bucket_counts"], np_counts)
    np.testing.assert_allclose(h["bucket_limits"], np_edges[1:], rtol=1e-5)
    np.testing.assert_allclose(h["num"], 257)
    np.testing.assert_allclose(h["sum"], np.asarray(v).sum(), rtol=1e-4)
    assert h["bucket_counts"].sum() == 257


def test_diag_fn_phiseg_levels():
    cfg = tiny_cfg()
    model, variables, x, s = init_model(cfg)
    diag = make_diag_fn(model, cfg, histograms=True)
    scalars, grids, hists = jax.device_get(
        diag(variables, x, s, jax.random.PRNGKey(1)))
    # per-level mu/sigma means for posterior AND prior (ref :719-726)
    for i in range(cfg.latent_levels):
        for tag in (f"average_mu_lvl{i}", f"average_sigma_lvl{i}",
                    f"average_prior_mu_lvl{i}", f"average_prior_sigma_lvl{i}"):
            assert tag in scalars and np.isfinite(scalars[tag])
    # sigma means are positive (softplus heads)
    assert scalars["average_sigma_lvl0"] > 0
    # per-level grids (ref :728-736): s_out + L x (s_out_list, s_accum_list)
    assert grids["s_out"].shape == (2, 32, 32)
    for i in range(cfg.latent_levels):
        assert grids[f"s_out_list_{i}"].shape == (2, 32, 32)
        assert grids[f"s_accum_list_{i}"].shape == (2, 32, 32)
    # accumulation identity: s_accum_list_0 == s_out (full aggregate)
    np.testing.assert_array_equal(grids["s_accum_list_0"], grids["s_out"])
    # activation histograms captured, each parseable summary
    assert len(hists) > 10
    for name, h in hists.items():
        assert name.startswith("activations/")
        assert h["bucket_counts"].shape == (30,)
        assert np.isfinite(h["sum"])


def test_diag_fn_det_unet_no_latents():
    cfg = tiny_cfg(model_family="det_unet")
    model, variables, x, s = init_model(cfg)
    diag = make_diag_fn(model, cfg, histograms=False)
    scalars, grids, hists = jax.device_get(
        diag(variables, x, s, jax.random.PRNGKey(1)))
    assert scalars == {}  # no latent levels
    assert hists == {}
    assert grids["s_out"].shape == (2, 32, 32)


def test_param_hist_fn():
    cfg = tiny_cfg()
    _, variables, _, _ = init_model(cfg)
    hists = jax.device_get(make_param_hist_fn()(variables["params"]))
    assert len(hists) > 10
    names = list(hists)
    assert all(n.startswith("weights/") for n in names)
    assert any("kernel" in n for n in names)
    for h in hists.values():
        assert h["bucket_counts"].sum() == h["num"]


def test_first_conv_kernel_and_grid():
    cfg = tiny_cfg()
    _, variables, _, _ = init_model(cfg)
    name, kernel = first_conv_kernel(variables["params"])
    assert kernel is not None and kernel.ndim == 4
    grid = kernels_to_grid(np.asarray(kernel))
    assert grid.dtype == np.uint8 and grid.ndim == 2
    assert grid.shape[0] > 8 and grid.shape[1] > 8
