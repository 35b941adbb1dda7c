"""Checkpoint manager tests: tags, retention, resume, atomicity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phiseg_tpu.engine import ExperimentConfig, build_model, create_train_state
from phiseg_tpu.engine.checkpoint import CheckpointManager, write_metrics_jsonl
from phiseg_tpu.engine.train import make_optimizer


@pytest.fixture
def state_and_cfg():
    cfg = ExperimentConfig(model_family="det_unet", kl_divergence_loss_weight=None,
                           n0=2, resolution_levels=4, image_size=(16, 16, 1),
                           compute_dtype="float32", norm="none")
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), tx)
    return state, cfg, model, tx


def test_save_restore_roundtrip(tmp_path, state_and_cfg):
    state, cfg, model, tx = state_and_cfg
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, "latest", step=5)

    template = create_train_state(model, cfg, jax.random.PRNGKey(42), tx)
    restored, step = mgr.restore(template, "latest")
    assert step == 5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_all_tags(tmp_path, state_and_cfg):
    state, *_ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path))
    for tag in ("latest", "best_loss", "best_dice", "best_ged", "best_ncc"):
        mgr.save(state, tag, step=1)
        assert mgr.has_checkpoint(tag)


def test_retention_policy(tmp_path, state_and_cfg):
    state, *_ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for step in (1, 2, 3, 4):
        mgr.save(state, "best_dice", step=step)
    assert mgr._list_steps("best_dice") == [3, 4]
    # latest keeps only 1 by default
    for step in (1, 2, 3):
        mgr.save(state, "latest", step=step)
    assert mgr._list_steps("latest") == [3]


def test_archive_checkpoints_time_based(tmp_path, state_and_cfg):
    """Every-N-hours archive saves, never pruned (ref
    keep_checkpoint_every_n_hours=3, phiseg_model.py:144)."""
    state, *_ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path), keep=1, archive_every_hours=1.0)
    # interval not elapsed -> no archive
    assert mgr.maybe_archive(state) is None
    # force the clock back past the interval
    mgr._last_archive_time -= 3601.0
    p = mgr.maybe_archive(state)
    assert p is not None and os.path.exists(p)
    # immediately after: interval restarts
    assert mgr.maybe_archive(state) is None
    # archives are exempt from pruning even with keep=1
    mgr._last_archive_time -= 3601.0
    state2 = state.replace(step=state.step + 7)
    mgr.maybe_archive(state2)
    assert len(mgr._list_steps("archive")) == 2
    # disabled manager never archives
    off = CheckpointManager(str(tmp_path / "off"), archive_every_hours=None)
    off._last_archive_time = 0.0
    assert off.maybe_archive(state) is None
    # a resumed manager starts its clock at the newest archive file
    mgr2 = CheckpointManager(str(tmp_path), archive_every_hours=1.0)
    assert mgr2.maybe_archive(state) is None


def test_latest_step_and_missing(tmp_path, state_and_cfg):
    state, cfg, model, tx = state_and_cfg
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.latest_step("latest") is None
    with pytest.raises(FileNotFoundError):
        mgr.restore(state, "latest")
    mgr.save(state, "latest", step=7)
    mgr.save(state, "latest", step=9)
    assert mgr.latest_step("latest") == 9


def test_bad_tag(tmp_path, state_and_cfg):
    state, *_ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(ValueError):
        mgr.save(state, "best_bogus")
    with pytest.raises(ValueError):
        mgr.restore(state, "best_bogus")


def test_no_tmp_leftovers(tmp_path, state_and_cfg):
    state, *_ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, "latest", step=1)
    assert not any(f.endswith(".tmp") for f in os.listdir(tmp_path))


def test_metrics_jsonl(tmp_path):
    import json

    path = str(tmp_path / "m.jsonl")
    write_metrics_jsonl(path, 1, {"loss": jnp.float32(2.5)})
    write_metrics_jsonl(path, 2, {"loss": 1.5})
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"step": 1, "loss": 2.5}
    assert lines[1]["step"] == 2


def test_multi_tag_save_reuses_serialisation(tmp_path):
    """Saving the SAME state under several tags at one step must not
    re-serialise: the validation flow writes latest + up to 4 best_* tags of
    a ~200MB state (1-vCPU hosts measured ~1 min per re-pack)."""
    import os

    import jax.numpy as jnp
    from flax import struct

    from phiseg_tpu.engine.checkpoint import CheckpointManager

    @struct.dataclass
    class St:
        step: jnp.ndarray
        params: dict

    st = St(step=jnp.asarray(7), params={"w": jnp.ones((64, 64))})
    m = CheckpointManager(str(tmp_path), keep=3)
    p1 = m.save(st, "latest")
    p2 = m.save(st, "best_dice")
    assert os.stat(p1).st_ino == os.stat(p2).st_ino  # hardlinked, not repacked

    st2 = St(step=jnp.asarray(7), params={"w": jnp.zeros((64, 64))})
    p3 = m.save(st2, "best_ncc")
    assert os.stat(p3).st_ino != os.stat(p1).st_ino  # new state -> real write
    r, step = m.restore(st, "best_ncc")
    assert step == 7 and float(r.params["w"].sum()) == 0.0


def test_async_writes_drain_and_roundtrip(tmp_path, state_and_cfg):
    state, cfg, model, tx = state_and_cfg
    mgr = CheckpointManager(str(tmp_path), async_writes=True)
    host = jax.device_get(state)
    mgr.save(host, "latest", step=3)
    mgr.save(host, "best_dice", step=3)  # same state: hardlink path
    mgr.wait()
    assert mgr.latest_step("latest") == 3
    assert mgr.latest_step("best_dice") == 3
    # the two files share an inode (multi-tag hardlink survived async)
    p1 = os.path.join(tmp_path, "model.ckpt-3.msgpack")
    p2 = os.path.join(tmp_path, "model_best_dice.ckpt-3.msgpack")
    assert os.stat(p1).st_ino == os.stat(p2).st_ino
    restored, step = mgr.restore(state, "latest")
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_async_restore_waits_for_pending(tmp_path, state_and_cfg):
    state, _, _, _ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path), async_writes=True)
    mgr.save(jax.device_get(state), "latest", step=7)
    # no explicit wait(): restore must drain the queue itself
    _, step = mgr.restore(state, "latest")
    assert step == 7


def test_async_worker_error_surfaces(tmp_path, state_and_cfg):
    state, _, _, _ = state_and_cfg
    mgr = CheckpointManager(str(tmp_path), async_writes=True)
    mgr.save(jax.device_get(state), "latest", step=1)
    mgr.wait()

    def boom(*a, **k):
        raise OSError("disk full")

    mgr._save_sync = boom  # worker failures must not be swallowed
    mgr.save(jax.device_get(state), "latest", step=2)
    with pytest.raises(OSError):
        mgr.wait()
