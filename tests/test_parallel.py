"""Data-parallel correctness on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.engine import ExperimentConfig, build_model, create_train_state, make_train_step
from phiseg_tpu.engine.train import make_optimizer, make_sample_fn
from phiseg_tpu.parallel import (
    make_mesh,
    make_sharded_sample_fn,
    shard_array,
    shard_train_step,
)


def tiny_cfg(**kw):
    base = dict(model_family="phiseg", latent_levels=2, resolution_levels=4,
                n0=2, zdim0=2, image_size=(16, 16, 1), compute_dtype="float32",
                norm="batch", batch_size=8)
    base.update(kw)
    return ExperimentConfig(**base)


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}
    mesh4 = make_mesh(4)
    assert mesh4.shape == {"data": 4}
    with pytest.raises(ValueError):
        make_mesh(99)


def test_data_parallel_step_matches_single_device():
    """Same global batch, same rng: sharded step must equal unsharded step.

    Sync-BN makes this exact: batch stats are global-array reductions either
    way, so the only difference is where the compute runs.
    """
    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 16, 16, 1))
    s = (jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32)

    # single device
    state1 = create_train_state(model, cfg, key, tx)
    step1 = make_train_step(model, cfg, tx, donate=False)
    state1, loss1 = step1(state1, x, s, key)

    # 8-device mesh
    mesh = make_mesh(8)
    state8 = create_train_state(model, cfg, key, tx)
    step8 = make_train_step(model, cfg, tx, donate=False)
    step8, state8 = shard_train_step(step8, state8, mesh)
    state8, loss8 = step8(state8, shard_array(x, mesh), shard_array(s, mesh), key)

    np.testing.assert_allclose(float(loss1["total_loss"]), float(loss8["total_loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.batch_stats), jax.tree.leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_multi_step_training_on_mesh():
    cfg = tiny_cfg()
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(8)
    state = create_train_state(model, cfg, key, tx)
    step = make_train_step(model, cfg, tx)
    step, state = shard_train_step(step, state, mesh)
    x = shard_array(jax.random.normal(key, (8, 16, 16, 1)), mesh)
    s = shard_array((jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32), mesh)
    losses = []
    for i in range(6):
        state, ld = step(state, x, s, jax.random.fold_in(key, i))
        losses.append(float(ld["total_loss"]))
    assert losses[-1] < losses[0]
    assert int(jax.device_get(state.step)) == 6


def test_sample_parallel_inference_matches_unsharded():
    """Sample-axis sharding must not change the drawn samples (same keys)."""
    cfg = tiny_cfg(norm="none")
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, key, tx)
    x = jax.random.normal(key, (2, 16, 16, 1))

    plain = make_sample_fn(model, 8)(state.variables, x, key)
    mesh = make_mesh(8)
    sharded = make_sharded_sample_fn(model, 8, mesh)(state.variables, x, key)
    assert sharded.shape == (8, 2, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(sharded), rtol=1e-4, atol=1e-6)


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_fused_ce_under_mesh_matches_xla():
    """shard_map-wrapped Pallas CE on an 8-device mesh == single-device XLA CE."""
    from phiseg_tpu.engine.objective import residual_multinoulli_loss

    mesh = make_mesh(8)
    key = jax.random.PRNGKey(0)
    logits = [jax.random.normal(jax.random.fold_in(key, i), (8, 16, 16, 2)) * 2
              for i in range(3)]
    s_oh = jax.nn.one_hot((jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32), 2)

    tot_xla, _ = residual_multinoulli_loss(tuple(logits), s_oh, use_fused=False)
    tot_dp, d_dp = residual_multinoulli_loss(tuple(logits), s_oh, use_fused=True,
                                             mesh=mesh)
    np.testing.assert_allclose(float(tot_xla), float(tot_dp), rtol=1e-4)

    # gradients too
    g_xla = jax.grad(lambda lg: residual_multinoulli_loss(tuple(lg), s_oh,
                                                          use_fused=False)[0])(logits)
    g_dp = jax.grad(lambda lg: residual_multinoulli_loss(tuple(lg), s_oh,
                                                         use_fused=True,
                                                         mesh=mesh)[0])(logits)
    for a, b in zip(g_xla, g_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6)


def test_mesh_train_step_with_fused_ce():
    """Full data-parallel train step with the shard_mapped kernel enabled."""
    cfg = tiny_cfg(norm="none")
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(8)
    state = create_train_state(model, cfg, key, tx)
    step = make_train_step(model, cfg, tx, use_fused_ce=True, mesh=mesh)
    step, state = shard_train_step(step, state, mesh)
    x = shard_array(jax.random.normal(key, (8, 16, 16, 1)), mesh)
    s = shard_array((jax.random.uniform(key, (8, 16, 16)) > 0.5).astype(jnp.int32), mesh)
    losses = []
    for i in range(8):
        state, ld = step(state, x, s, jax.random.fold_in(key, i))
        losses.append(float(ld["total_loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0]
