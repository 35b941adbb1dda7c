"""Advisory TPU lock (flock-based) + async checkpoint-writer ordering."""

import json
import os
import threading

import numpy as np

from phiseg_tpu.utils.tpu_lock import TpuLock, read_holder, wait_for_free


def test_acquire_release_cycle(tmp_path):
    path = str(tmp_path / "l.lock")
    lk = TpuLock("t1", path=path)
    assert lk.acquire(wait=False)
    holder = read_holder(path)
    assert holder["tag"] == "t1" and holder["pid"] == os.getpid()
    lk.release()
    # the rendezvous file persists; the kernel lock is what matters
    assert read_holder(path) is None
    # idempotent release
    lk.release()


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


def test_dead_holder_remnant_reads_free(tmp_path):
    """A crashed holder's flock is released by the kernel; its JSON remnant
    in the file must read as FREE (no stale-breaking logic, no TOCTOU)."""
    path = str(tmp_path / "l.lock")
    with open(path, "w") as f:
        json.dump({"pid": 2**22 - 7, "tag": "dead", "time": 0.0}, f)
    assert read_holder(path) is None  # nobody holds the flock
    lk = TpuLock("fresh", path=path)
    assert lk.acquire(wait=False)
    assert read_holder(path)["tag"] == "fresh"
    lk.release()


def test_corrupt_content_while_held_still_reports(tmp_path):
    """Unparseable holder info degrades to a placeholder record, never an
    exception, and a free lock with garbage content reads as free."""
    path = str(tmp_path / "l.lock")
    with open(path, "w") as f:
        f.write("not json{")
    assert read_holder(path) is None  # free despite garbage remnant
    lk = TpuLock("x", path=path)
    lk.acquire()
    # clobber the content behind the holder's back
    with open(path, "w") as f:
        f.write("not json{")
    h = read_holder(path)
    assert h is not None and h["pid"] == -1 and h["tag"] == "?"
    lk.release()


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


def test_acquire_default_bound_is_instance_max_wait(tmp_path):
    """A bare acquire() must honour the instance bound (a wedged-but-alive
    holder must not block the queue forever)."""
    path = str(tmp_path / "l.lock")
    a = TpuLock("a", path=path)
    a.acquire()
    b = TpuLock("b", path=path, max_wait_s=0.2)
    import time

    t0 = time.time()
    assert not b.acquire(poll_s=0.05)  # no explicit max_wait -> instance's
    assert time.time() - t0 < 5.0
    a.release()


def test_not_reentrant_same_instance_is_noop_second_acquire(tmp_path):
    path = str(tmp_path / "l.lock")
    lk = TpuLock("t", path=path)
    assert lk.acquire(wait=False)
    assert lk.acquire(wait=False)  # same instance: already held, True
    lk.release()
    assert read_holder(path) is None


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
    """flock(LOCK_EX|LOCK_NB) on independent fds: exactly one of N racing
    threads wins."""
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


def test_lock_released_when_holder_process_dies(tmp_path):
    """The kernel releases a dead holder's flock: the core anti-wedge
    property the old lockfile scheme needed fragile pid-liveness checks
    for."""
    import subprocess
    import sys
    import time

    path = str(tmp_path / "l.lock")
    code = (
        "import sys, time; sys.path.insert(0, %r); "
        "from phiseg_tpu.utils.tpu_lock import TpuLock; "
        "TpuLock('child', path=%r).acquire(); "
        "print('held', flush=True); time.sleep(60)"
        % (os.getcwd(), path)
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, env=env)
    assert p.stdout.readline().strip() == b"held"
    assert read_holder(path)["tag"] == "child"
    p.kill()
    p.wait()
    deadline = time.time() + 10
    while read_holder(path) is not None and time.time() < deadline:
        time.sleep(0.1)
    assert read_holder(path) is None
    lk = TpuLock("after", path=path)
    assert lk.acquire(wait=False)
    lk.release()
