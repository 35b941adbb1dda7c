"""Aux subsystems: profiling hooks, NaN guard, batch renorm, pad_to_size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.nn.layers import pad_to_size
from phiseg_tpu.nn.normalization import BatchRenorm
from phiseg_tpu.utils.profiling import StepProfiler, profile_config, timed_section


def test_profile_config_disabled(monkeypatch):
    monkeypatch.delenv("PHISEG_PROFILE_DIR", raising=False)
    assert profile_config() == (None, -1, -1)
    prof = StepProfiler()
    prof.maybe_start(0)  # no-op, must not crash
    prof.maybe_stop(0)


def test_profile_config_parsing(monkeypatch):
    monkeypatch.setenv("PHISEG_PROFILE_DIR", "/tmp/x")
    monkeypatch.setenv("PHISEG_PROFILE_STEPS", "3:9")
    assert profile_config() == ("/tmp/x", 3, 9)


def test_timed_section_runs():
    with timed_section("noop"):
        pass


def test_nan_guard(tmp_path, monkeypatch):
    from phiseg_tpu.data import get_dataset
    from phiseg_tpu.engine.config import ExperimentConfig
    from phiseg_tpu.engine.trainer import Trainer

    monkeypatch.setenv("PHISEG_LOG_ROOT", str(tmp_path))
    cfg = ExperimentConfig(
        experiment_name="nan_test", model_family="det_unet", latent_levels=1,
        resolution_levels=4, n0=2, image_size=(16, 16, 1),
        compute_dtype="float32", norm="none", data_identifier="synthetic",
        batch_size=2, kl_divergence_loss_weight=None,
        lr_schedule={0: float("nan")},  # guaranteed NaN after one update
        tensorboard_update_frequency=1, validation_frequency=10 ** 9,
        augment_on_device=False,
    )
    data = get_dataset(cfg, n_train=4, n_val=2, n_test=2)
    trainer = Trainer(cfg)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        trainer.train(data, num_iter=50)


def test_pad_to_size():
    x = jnp.ones((1, 4, 6, 2))
    y = pad_to_size(x, (8, 8))
    assert y.shape == (1, 8, 8, 2)
    assert float(y.sum()) == float(x.sum())  # pure zero padding
    np.testing.assert_array_equal(np.asarray(y[0, 2:6, 1:7, :]), np.ones((4, 6, 2)))
    with pytest.raises(ValueError):
        pad_to_size(x, (2, 2))


def test_batch_renorm_train_and_eval():
    rn = BatchRenorm()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 4, 4, 3)) * 2.0 + 5.0
    v = rn.init({"params": key}, x, train=True)
    # early steps: r~1, d~0 -> behaves like batch norm
    y, mut = rn.apply(v, x, train=True, step=0, mutable=["batch_stats"])
    np.testing.assert_allclose(float(jnp.mean(y)), 0.0, atol=1e-3)
    np.testing.assert_allclose(float(jnp.std(y)), 1.0, atol=1e-2)
    # running stats moved toward the batch stats
    assert float(mut["batch_stats"]["mean"].mean()) > 0
    # eval mode uses running stats, no mutation needed
    y_eval = rn.apply(v, x, train=False)
    assert y_eval.shape == x.shape and np.isfinite(np.asarray(y_eval)).all()


def test_batch_renorm_clip_schedule():
    from phiseg_tpu.nn.normalization import _scheduled_clip

    step = jnp.asarray(0)
    assert float(_scheduled_clip(step, 1.0, 3.0, 500.0, 4000.0)) == 1.0
    assert float(_scheduled_clip(jnp.asarray(10_000), 1.0, 3.0, 500.0, 4000.0)) == 3.0
    mid = float(_scheduled_clip(jnp.asarray(2250), 1.0, 3.0, 500.0, 4000.0))
    assert 1.0 < mid < 3.0


def test_conv_block_renorm_reachable():
    import jax.numpy as jnp
    from phiseg_tpu.nn.layers import ConvBlock

    block = ConvBlock(4, norm="renorm")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 3))
    v = block.init({"params": key}, x, train=True)
    assert "brn" in v["params"]
    y, mut = block.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 8, 8, 4)
    # self-counting step advanced
    assert int(mut["batch_stats"]["brn"]["steps"]) == 1
    y_eval = block.apply(v, x, train=False, mutable=False)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_pad_to_batch():
    from phiseg_tpu.engine.validation import pad_to_batch

    a = np.arange(12).reshape(3, 4)
    p = pad_to_batch(a, 5)
    assert p.shape == (5, 4)
    np.testing.assert_array_equal(p[3], a[2])
    np.testing.assert_array_equal(pad_to_batch(a, 3), a)


def test_augment_scalecrop_identity_when_gated_off():
    import jax.numpy as jnp
    from phiseg_tpu.data.augment_device import make_augment_fn

    # non-square image; gating off (every-nth huge) must be exact identity
    fn = make_augment_fn({"do_scaleaug": True, "augment_every_nth": 10**9}, 2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 24, 1).astype(np.float32))
    s = jnp.zeros((2, 16, 24), jnp.int32)
    x2, s2 = fn(x, s, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)


def test_augment_scalecrop_nonsquare_in_bounds():
    import jax.numpy as jnp
    from phiseg_tpu.data.augment_device import make_augment_fn

    fn = make_augment_fn({"do_scaleaug": True, "augment_every_nth": 1, "offset": 8}, 2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 16, 1).astype(np.float32))
    s = jnp.zeros((2, 32, 16), jnp.int32)
    x2, s2 = fn(x, s, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(x2)).all()
    assert x2.shape == x.shape
