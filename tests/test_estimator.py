"""Parity tests for the unified GED^2 estimator corrections.

phiseg_tpu/metrics/estimator.py is the single implementation of the
calibrated-model floor / unbiased-GED^2 / diversity-ratio math used by
both results-aggregation tools (cli.eval_plots and scripts/pair_stats.py)
-- VERDICT r4 weak #5. These tests pin it to the independently-written
closed forms so neither caller can drift.
"""

import numpy as np
import pytest

from phiseg_tpu.metrics import estimator


def _rand_terms(rng, n=64):
    d_sy = rng.uniform(0.2, 0.6, n)
    d_ss = rng.uniform(0.1, 0.5, n)
    d_yy = rng.uniform(0.1, 0.5, n)
    return d_sy, d_ss, d_yy


def test_unbiased_ged_matches_closed_form():
    rng = np.random.default_rng(0)
    d_sy, d_ss, d_yy = _rand_terms(rng)
    N, M = 50, 4
    got = estimator.unbiased_ged(d_sy, d_ss, d_yy, N, M)
    want = 2 * d_sy - d_ss * N / (N - 1.0) - d_yy * M / (M - 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_floor_matches_both_historic_forms():
    # eval_plots used d_yy/(1-1/M); pair_stats used d_yy*M/(M-1). They are
    # algebraically identical; the unified function must match both.
    rng = np.random.default_rng(1)
    _, _, d_yy = _rand_terms(rng)
    N, M = 50, 4
    got = estimator.calibrated_floor(d_yy.mean(), N, M)
    want_a = (1.0 / N + 1.0 / M) * (d_yy.mean() / (1.0 - 1.0 / M))
    want_b = (1.0 / N + 1.0 / M) * (d_yy.mean() * M / (M - 1.0))
    assert got == pytest.approx(want_a, rel=1e-12)
    assert got == pytest.approx(want_b, rel=1e-12)


def test_diversity_ratio_matches_results_convention():
    # RESULTS.md convention: d_ss / (d_yy * M/(M-1)) -- only the annotator
    # term is population-corrected.
    got = estimator.diversity_ratio(0.3, 0.25, 4)
    assert got == pytest.approx(0.3 / (0.25 * 4 / 3), rel=1e-12)


def test_calibrated_sampler_sits_on_the_floor():
    # A sampler drawing exactly from the annotator distribution has
    # E[d_sy]=dbar, E[d_ss]=(1-1/N)dbar, E[d_yy]=(1-1/M)dbar; its biased
    # GED^2 equals the floor and its unbiased GED^2 is ~0.
    dbar, N, M = 0.4, 50, 4
    d_sy = np.full(8, dbar)
    d_ss = np.full(8, (1 - 1.0 / N) * dbar)
    d_yy = np.full(8, (1 - 1.0 / M) * dbar)
    biased = 2 * d_sy - d_ss - d_yy
    floor = estimator.calibrated_floor(d_yy.mean(), N, M)
    np.testing.assert_allclose(biased, floor, rtol=1e-12)
    np.testing.assert_allclose(
        estimator.unbiased_ged(d_sy, d_ss, d_yy, N, M), 0.0, atol=1e-12)


@pytest.mark.parametrize("N,M", [(1, 4), (50, 1), (1, 1)])
def test_degenerate_protocols_are_nan_not_crash(N, M):
    rng = np.random.default_rng(2)
    d_sy, d_ss, d_yy = _rand_terms(rng, n=4)
    assert np.isnan(estimator.unbiased_ged(d_sy, d_ss, d_yy, N, M)).all()
    if M == 1:
        assert np.isnan(estimator.calibrated_floor(d_yy.mean(), N, M))
        assert np.isnan(estimator.diversity_ratio(0.3, d_yy.mean(), M))


def test_m1_floor_defined_when_only_n_degenerate():
    # N=1 leaves the floor well-defined (it depends on d_yy and M only).
    val = estimator.calibrated_floor(0.3, 1, 4)
    assert val == pytest.approx((1.0 + 0.25) * 0.4, rel=1e-12)
