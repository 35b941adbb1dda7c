"""Shape-contract, determinism and semantics tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.models import SegVAE, aggregate_levels, default_channels


def tiny(fam="phiseg", L=3, R=5, hw=32, **kw):
    return SegVAE(model_family=fam, latent_levels=L, resolution_levels=R,
                  n0=2, zdim0=2, nlabels=2, image_size=(hw, hw),
                  norm=kw.pop("norm", "none"), **kw)


def init_and_forward(model, hw=32, batch=2, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (batch, hw, hw, 1))
    s_oh = jax.nn.one_hot(jnp.zeros((batch, hw, hw), jnp.int32), 2)
    v = model.init({"params": key}, x, s_oh, key, train=True)
    out = model.apply(v, x, s_oh, key, train=False)
    return v, x, s_oh, out


def test_default_channels():
    assert default_channels(32, 7) == (32, 64, 128, 192, 192, 192, 192)
    assert default_channels(4, 2) == (4, 8)


@pytest.mark.parametrize("R,L", [(5, 3), (5, 1), (4, 4), (7, 5), (7, 1)])
def test_phiseg_shape_contract(R, L):
    hw = 2 ** (R - 1)
    model = tiny("phiseg", L=L, R=R, hw=hw)
    v, x, s_oh, out = init_and_forward(model, hw=hw)
    assert len(out.s_out_list) == L
    for s in out.s_out_list:
        assert s.shape == (2, hw, hw, 2)
    for i in range(L):
        exp_hw = hw // 2 ** (i + R - L)  # ref posteriors.py:100
        assert out.q_mu[i].shape == (2, exp_hw, exp_hw, 2), (i, out.q_mu[i].shape)
        assert out.p_mu[i].shape == out.q_mu[i].shape
        assert out.z[i].shape == out.q_mu[i].shape


def test_sigma_positive():
    model = tiny()
    _, _, _, out = init_and_forward(model)
    for sg in list(out.q_sigma) + list(out.p_sigma):
        assert float(sg.min()) >= 0.0  # softplus head


def test_prob_unet_global_latent():
    model = tiny("prob_unet")
    v, x, s_oh, out = init_and_forward(model)
    assert out.q_mu[0].shape == (2, 2)  # (B, zdim): global average pooled
    assert out.s_out_list[0].shape == (2, 32, 32, 2)


def test_det_unet_no_latents():
    model = tiny("det_unet")
    v, x, s_oh, out = init_and_forward(model)
    assert out.q_mu == () and out.p_mu == ()
    assert out.s_out_list[0].shape == (2, 32, 32, 2)


def test_forward_deterministic_given_key():
    model = tiny()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 1))
    s_oh = jax.nn.one_hot(jnp.zeros((2, 32, 32), jnp.int32), 2)
    v = model.init({"params": key}, x, s_oh, key, train=True)
    o1 = model.apply(v, x, s_oh, key, train=False)
    o2 = model.apply(v, x, s_oh, key, train=False)
    for a, b in zip(o1.s_out_list, o2.s_out_list):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_different_keys_different_samples():
    model = tiny()
    v, x, s_oh, _ = init_and_forward(model)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    o1 = model.apply(v, x, s_oh, k1, train=False)
    o2 = model.apply(v, x, s_oh, k2, train=False)
    assert not np.allclose(np.asarray(o1.z[0]), np.asarray(o2.z[0]))
    # but the posterior MEAN must be identical (x, s deterministic path)
    np.testing.assert_allclose(np.asarray(o1.q_mu[-1]), np.asarray(o2.q_mu[-1]), rtol=1e-6)


def test_prior_teacher_forcing_changes_params():
    """Prior mu at level i<L-1 must depend on the teacher z (ref priors.py:122-126)."""
    model = tiny(L=3)
    v, x, s_oh, out = init_and_forward(model)
    key = jax.random.PRNGKey(3)
    z_a = out.z
    z_b = tuple(z + 10.0 for z in out.z)
    _, mu_a, _ = model.apply(v, x, key, method="prior_draw")  # no teacher: gen mode
    _, mu_t, _ = model.apply(
        v, x.astype(jnp.float32), key,
        method=lambda m, xx, kk: m.prior(xx, kk, z_teacher=z_a, train=False),
    )
    _, mu_t2, _ = model.apply(
        v, x.astype(jnp.float32), key,
        method=lambda m, xx, kk: m.prior(xx, kk, z_teacher=z_b, train=False),
    )
    # coarsest level depends only on x -> identical
    np.testing.assert_allclose(np.asarray(mu_t[-1]), np.asarray(mu_t2[-1]), rtol=1e-5)
    # finer levels consume the teacher z -> must differ
    assert not np.allclose(np.asarray(mu_t[0]), np.asarray(mu_t2[0]))


def test_sample_cache_equals_direct_sampling():
    """decode_sample(sample_cache(x)) must equal the direct gen-mode forward."""
    for fam in ["phiseg", "prob_unet", "det_unet"]:
        model = tiny(fam)
        v, x, _, _ = init_and_forward(model)
        key = jax.random.PRNGKey(7)
        cache = model.apply(v, x, method="sample_cache")
        s_fast = model.apply(v, cache, key, method="decode_sample")
        s_slow = model.apply(v, x, key, method="sample_logits")
        np.testing.assert_allclose(
            np.asarray(aggregate_levels(s_fast)), np.asarray(s_slow), rtol=2e-5, atol=1e-5
        )


def test_vmapped_sampling_distinct():
    model = tiny()
    v, x, _, _ = init_and_forward(model)
    cache = model.apply(v, x, method="sample_cache")
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    draws = jax.vmap(lambda k: aggregate_levels(model.apply(v, cache, k, method="decode_sample")))(keys)
    assert draws.shape == (4, 2, 32, 32, 2)
    assert not np.allclose(np.asarray(draws[0]), np.asarray(draws[1]))


def test_batchnorm_updates_stats():
    model = tiny(norm="batch")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 1)) + 5.0
    s_oh = jax.nn.one_hot(jnp.zeros((2, 32, 32), jnp.int32), 2)
    v = model.init({"params": key}, x, s_oh, key, train=True)
    _, mut = model.apply(v, x, s_oh, key, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(mut["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after))
    assert changed
