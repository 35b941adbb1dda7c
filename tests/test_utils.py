"""Misc utils + image grid + extra layer variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.utils import misc
from phiseg_tpu.utils.image_grid import batch_to_grid


def test_onehot_converters():
    lbl = np.asarray([[0, 1], [2, 0]])
    oh = misc.convert_to_onehot(lbl, 3)
    assert oh.shape == (2, 2, 3)
    assert oh[0, 1, 1] == 1 and oh[1, 0, 2] == 1
    batch = misc.convert_batch_to_onehot(lbl[None], 3)
    assert batch.shape == (1, 2, 2, 3)


def test_find_floor_in_list():
    assert misc.find_floor_in_list([0, 100, 500], 250) == (100, 1)
    assert misc.find_floor_in_list([0, 100, 500], 0) == (0, 0)
    with pytest.raises(ValueError):
        misc.find_floor_in_list([100], 50)


def test_intensity_mapping():
    img = np.linspace(0, 10, 100).reshape(10, 10)
    out = misc.map_image_to_intensity_range(img, -1, 1)
    assert out.min() == pytest.approx(-1) and out.max() == pytest.approx(1)
    outs = misc.map_images_to_intensity_range(img[None], 0, 255)
    assert outs.max() == pytest.approx(255)


def test_normalise_images():
    x = np.random.RandomState(0).rand(3, 8, 8) * 100 + 50
    out = misc.normalise_images(x)
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1, rtol=1e-4)


def test_ncc_and_norm():
    a = np.random.RandomState(1).rand(8, 8)
    assert misc.ncc(a, a) == pytest.approx(1.0, rel=1e-5)
    assert misc.norm_l2(a, a) > 0


def test_jaccard():
    p = np.asarray([1, 1, 0, 0])
    g = np.asarray([1, 0, 0, 0])
    assert misc.jaccard_onehot(p, g) == pytest.approx(0.5)


def test_bunch_and_misc():
    b = misc.Bunch(a=1, b=2)
    assert b.a == 1
    assert misc.list_mean([1, 2, 3]) == 2
    sm = misc.softmax(np.asarray([[0.0, 0.0]]))
    np.testing.assert_allclose(sm, [[0.5, 0.5]])
    u8 = misc.convert_to_uint8(np.asarray([[0.0, 1.0]]))
    assert u8.dtype == np.uint8 and u8.max() == 255


def test_nii_roundtrip(tmp_path):
    pytest.importorskip("nibabel")
    data = np.random.RandomState(0).rand(4, 4, 2).astype(np.float32)
    path = str(tmp_path / "x.nii.gz")
    misc.create_and_save_nii(data, path)
    back, affine, header = misc.load_nii(path)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_batch_to_grid():
    batch = np.random.RandomState(0).rand(5, 8, 8)
    grid = batch_to_grid(batch, "standardize")
    assert grid.dtype == np.uint8
    assert grid.shape == (2 * 8 + 1, 3 * 8 + 2)  # 2x3 grid with 1px padding
    lbl = np.random.RandomState(1).randint(0, 2, (4, 8, 8))
    g2 = batch_to_grid(lbl, "labelmap", nlabels=2)
    assert set(np.unique(g2)) <= {0, 255}
    with pytest.raises(ValueError):
        batch_to_grid(batch, "bogus")


def test_extra_layer_variants():
    from phiseg_tpu.nn.layers import (
        Conv3DBlock,
        DilatedConvBlock,
        ResidualUnit,
        TransposedConvBlock,
        reshape_pool_2x2,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 4))

    t = TransposedConvBlock(6)
    v = t.init({"params": key}, x, train=True)
    assert t.apply(v, x, train=False).shape == (1, 16, 16, 6)

    d = DilatedConvBlock(6, rate=2)
    v = d.init({"params": key}, x, train=True)
    assert d.apply(v, x, train=False).shape == (1, 8, 8, 6)

    r = ResidualUnit(8, down_sample=True, norm="none")
    v = r.init({"params": key}, x, train=True)
    assert r.apply(v, x, train=False).shape == (1, 4, 4, 8)

    c3 = Conv3DBlock(5)
    x3 = jax.random.normal(key, (1, 4, 8, 8, 2))
    v = c3.init({"params": key}, x3, train=True)
    assert c3.apply(v, x3, train=False).shape == (1, 4, 8, 8, 5)

    assert reshape_pool_2x2(x).shape == (1, 4, 4, 16)
