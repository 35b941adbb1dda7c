"""Advisory TPU lockfile + async checkpoint-writer ordering/shutdown."""

import json
import os
import threading

import numpy as np

from phiseg_tpu.utils import tpu_lock
from phiseg_tpu.utils.tpu_lock import TpuLock, read_holder, wait_for_free


def test_acquire_release_cycle(tmp_path):
    path = str(tmp_path / "l.lock")
    lk = TpuLock("t1", path=path)
    assert lk.acquire(wait=False)
    holder = read_holder(path)
    assert holder["tag"] == "t1" and holder["pid"] == os.getpid()
    lk.release()
    assert read_holder(path) is None
    assert not os.path.exists(path)


def test_second_holder_blocked_until_release(tmp_path):
    path = str(tmp_path / "l.lock")
    a = TpuLock("a", path=path)
    b = TpuLock("b", path=path)
    assert a.acquire(wait=False)
    assert not b.acquire(wait=False)
    # bounded wait times out while held
    assert not b.acquire(wait=True, poll_s=0.05, max_wait_s=0.2)
    a.release()
    assert b.acquire(wait=False)
    b.release()


def test_stale_lock_broken(tmp_path):
    path = str(tmp_path / "l.lock")
    # a pid that cannot be alive (max_pid is far below 2**22 + this range)
    with open(path, "w") as f:
        json.dump({"pid": 2**22 - 7, "tag": "dead", "time": 0.0}, f)
    assert read_holder(path) is None  # stale -> broken
    assert not os.path.exists(path)
    lk = TpuLock("fresh", path=path)
    assert lk.acquire(wait=False)
    lk.release()


def test_corrupt_lock_treated_as_stale(tmp_path):
    path = str(tmp_path / "l.lock")
    with open(path, "w") as f:
        f.write("not json{")
    assert read_holder(path) is None
    assert not os.path.exists(path)


def test_wait_for_free_reports_holder(tmp_path):
    path = str(tmp_path / "l.lock")
    info = wait_for_free(max_wait_s=0.1, poll_s=0.02, path=path)
    assert info["held_by"] is None
    lk = TpuLock("busy", path=path)
    lk.acquire()
    info = wait_for_free(max_wait_s=0.15, poll_s=0.02, path=path)
    assert info["held_by"]["tag"] == "busy"
    assert info["waited_s"] >= 0.1
    lk.release()


def test_env_var_path(tmp_path, monkeypatch):
    path = str(tmp_path / "env.lock")
    monkeypatch.setenv("PHISEG_TPU_LOCK", path)
    lk = TpuLock("env")
    assert lk.path == path
    lk.acquire()
    assert os.path.exists(path)
    lk.release()


def _tiny_state():
    # plain pytree; save() is called with an explicit step so no .step attr
    return {"step": np.asarray(7), "w": np.arange(4, dtype=np.float32)}


def test_ckpt_submit_orders_after_writes(tmp_path):
    """submit()-ed tasks run after every previously-enqueued save (the
    best_metrics.json durability barrier, ADVICE r3 medium)."""
    from phiseg_tpu.engine.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), async_writes=True)
    state = _tiny_state()
    order = []
    seen_at_submit = {}

    mgr.save(state, "best_dice", step=7)
    mgr.save(state, "best_ged", step=7)

    def task():
        order.append("task")
        seen_at_submit["dice"] = os.path.exists(
            os.path.join(str(tmp_path), "model_best_dice.ckpt-7.msgpack"))
        seen_at_submit["ged"] = os.path.exists(
            os.path.join(str(tmp_path), "model_best_ged.ckpt-7.msgpack"))

    mgr.submit(task)
    mgr.wait()
    assert order == ["task"]
    assert seen_at_submit == {"dice": True, "ged": True}
    mgr.close()


def test_ckpt_submit_sync_mode_runs_inline(tmp_path):
    from phiseg_tpu.engine.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), async_writes=False)
    ran = []
    mgr.submit(lambda: ran.append(1))
    assert ran == [1]
    mgr.close()  # no-op in sync mode


def test_ckpt_close_joins_worker_and_is_idempotent(tmp_path):
    from phiseg_tpu.engine.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), async_writes=True)
    mgr.save(_tiny_state(), "latest", step=3)
    mgr.close()
    assert mgr._worker is None
    # the write landed before close returned
    assert os.path.exists(os.path.join(str(tmp_path), "model.ckpt-3.msgpack"))
    mgr.close()  # idempotent
    # worker errors surface on close
    mgr2 = CheckpointManager(str(tmp_path), async_writes=True)
    mgr2.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    try:
        mgr2.close()
    except RuntimeError as e:
        assert "boom" in str(e)
    else:
        raise AssertionError("worker error not re-raised by close()")


def test_lock_concurrent_acquire_single_winner(tmp_path):
    """O_CREAT|O_EXCL means exactly one of N racing threads wins."""
    path = str(tmp_path / "race.lock")
    wins = []
    locks = [TpuLock(f"r{i}", path=path) for i in range(8)]
    barrier = threading.Barrier(8)

    def go(lk):
        barrier.wait()
        if lk.acquire(wait=False):
            wins.append(lk)

    ts = [threading.Thread(target=go, args=(lk,)) for lk in locks]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    wins[0].release()
