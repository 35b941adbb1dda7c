"""Unit tests for the core NN op library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.nn.layers import (
    ConvBlock,
    avg_pool_2x2,
    crop_and_concat,
    global_avg_pool,
    max_pool_2x2,
    reparameterize,
    resize_nearest,
    upsample_bilinear,
)


def test_avg_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = avg_pool_2x2(x)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(y[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)


def test_max_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = max_pool_2x2(x)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], [[5, 7], [13, 15]])


def test_global_avg_pool():
    x = jnp.ones((2, 4, 4, 3)) * jnp.arange(3)
    y = global_avg_pool(x)
    assert y.shape == (2, 3)
    np.testing.assert_allclose(np.asarray(y), np.tile(np.arange(3), (2, 1)))


def test_upsample_bilinear_shape_and_constant():
    x = jnp.full((1, 4, 4, 2), 3.0)
    y = upsample_bilinear(x, 2)
    assert y.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(y), 3.0, rtol=1e-6)


def test_resize_nearest_exact():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = resize_nearest(x, (4, 4))
    expected = np.repeat(np.repeat(np.arange(4.0).reshape(2, 2), 2, 0), 2, 1)
    np.testing.assert_allclose(np.asarray(y)[0, :, :, 0], expected)


def test_crop_and_concat():
    a = jnp.ones((1, 8, 8, 2))
    b = jnp.ones((1, 6, 6, 3))
    out = crop_and_concat([a, b])
    assert out.shape == (1, 6, 6, 5)


def test_conv_block_bias_off_under_batchnorm(rng):
    block = ConvBlock(8, norm="batch")
    v = block.init({"params": rng}, jnp.zeros((1, 8, 8, 4)), train=True)
    assert "bias" not in v["params"]["conv"]
    assert "batch_stats" in v

    block2 = ConvBlock(8, norm="none")
    v2 = block2.init({"params": rng}, jnp.zeros((1, 8, 8, 4)), train=True)
    assert "bias" in v2["params"]["conv"]


@pytest.mark.parametrize("norm", ["none", "batch", "group", "layer", "instance"])
def test_conv_block_norms_run(rng, norm):
    block = ConvBlock(8, norm=norm)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    v = block.init({"params": rng}, x, train=True)
    y = block.apply(v, x, train=False, mutable=False)
    assert y.shape == (2, 8, 8, 8)
    assert jnp.all(jnp.isfinite(y))


def test_conv_block_unknown_norm_raises(rng):
    with pytest.raises(ValueError):
        ConvBlock(8, norm="bogus").init({"params": rng}, jnp.zeros((1, 8, 8, 1)), train=True)


def test_reparameterize_stats(rng):
    mu = jnp.full((2000,), 1.5)
    sigma = jnp.full((2000,), 0.5)
    z = reparameterize(rng, mu, sigma)
    assert abs(float(z.mean()) - 1.5) < 0.05
    assert abs(float(z.std()) - 0.5) < 0.05


def test_reparameterize_deterministic(rng):
    mu = jnp.zeros((4, 4))
    sigma = jnp.ones((4, 4))
    z1 = reparameterize(rng, mu, sigma)
    z2 = reparameterize(rng, mu, sigma)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_weight_init_registry(rng):
    import jax.numpy as jnp
    from phiseg_tpu.nn.layers import WEIGHT_INITS, get_weight_init, ConvBlock

    for name in WEIGHT_INITS:
        if name == "bilinear":
            w = get_weight_init(name)(rng, (4, 4, 3, 3))
            # bilinear kernel sums to ~1 per in/out channel pair diagonal
            assert float(w[:, :, 0, 0].sum()) > 0
            assert float(w[:, :, 0, 1].sum()) == 0.0
        else:
            w = get_weight_init(name)(rng, (3, 3, 4, 8))
            assert w.shape == (3, 3, 4, 8)
            assert bool(jnp.isfinite(w).all())
    import pytest
    with pytest.raises(ValueError):
        get_weight_init("bogus")
    block = ConvBlock(4, weight_init="xavier_uniform")
    v = block.init({"params": rng}, jnp.zeros((1, 8, 8, 2)), train=True)
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 2, 4)


def test_activations():
    from phiseg_tpu.nn.activations import leaky_relu

    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x)), [-0.02, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, alpha=0.2)), [-0.4, 0.0, 3.0])


def test_conv_block_dropout(rng):
    block = ConvBlock(4, dropout_keep_prob=0.5)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    v = block.init({"params": rng}, x, train=False)
    # eval mode: deterministic, no rng stream needed
    y1 = block.apply(v, x, train=False)
    y2 = block.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # train mode: stochastic, requires 'dropout' rng; some activations zeroed
    yt = block.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert (np.asarray(yt) == 0).mean() > 0.2


def test_3d_blocks_and_resizes(rng):
    """3D op coverage: conv3D / transposed conv3D / pools / tri-resizes
    (ref tfwrapper/layers.py:148-194, :260-323, :348-376)."""
    from phiseg_tpu.nn.layers import (
        Conv3DBlock,
        TransposedConv3DBlock,
        avg_pool_2x2x2,
        max_pool_2x2x2,
        resize_nearest_3d,
        upsample_bilinear_3d,
        upsample_nearest_3d,
    )

    x = jnp.ones((2, 4, 8, 8, 3))
    y = Conv3DBlock(features=5).init_with_output(rng, x)[0]
    assert y.shape == (2, 4, 8, 8, 5)
    y = TransposedConv3DBlock(features=5).init_with_output(rng, x)[0]
    assert y.shape == (2, 8, 16, 16, 5)
    assert avg_pool_2x2x2(x).shape == (2, 2, 4, 4, 3)
    assert max_pool_2x2x2(x).shape == (2, 2, 4, 4, 3)
    up = upsample_bilinear_3d(x)
    assert up.shape == (2, 8, 16, 16, 3)
    np.testing.assert_allclose(up, 1.0, rtol=1e-6)  # constant-preserving
    assert upsample_nearest_3d(x).shape == (2, 8, 16, 16, 3)
    assert resize_nearest_3d(x, (2, 4, 4)).shape == (2, 2, 4, 4, 3)
