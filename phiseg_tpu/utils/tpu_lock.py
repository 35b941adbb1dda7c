"""Advisory TPU-use lock: bench and training/eval jobs never contend.

The host has one vCPU and one tunnelled TPU chip; two TPU programs running
concurrently serialise on the chip and both record garbage numbers
(CLAUDE.md "NEVER run ... concurrently with a TPU job"). Round 3 relied on
a comment in the chain script to prevent the driver's end-of-round bench.py
from overlapping a still-running trainer; this module makes the exclusion
structural (VERDICT r3, next-round item 7):

  * long-running TPU jobs (Trainer.train, the quantitative/prediction eval
    CLIs, perf_lab) hold the lock for their duration;
  * bench.py calls `wait_for_free()` then takes the lock -- it waits
    (bounded) and reports both the wait and any still-held lock in its
    JSON `extra`, so an overlapped measurement is impossible to mistake
    for a clean one.

Implementation: BSD `flock(LOCK_EX)` on a persistent rendezvous file, with
the holder's {pid, tag, time} JSON written into it for diagnostics. flock
is owned by the kernel and released automatically when the holder dies,
so there is no stale-lock detection and therefore no check-then-remove
race (an earlier lockfile-create/delete scheme could delete a concurrent
acquirer's fresh lock while "breaking" a stale one). The lock is NOT
re-entrant: a second acquire from the same process (or another thread)
waits like any other contender.

This is advisory coordination between cooperating processes on one VM,
not security. No reference equivalent (the reference assumes a dedicated
GPU per job); TPU-native operational concern only.
"""

from __future__ import annotations

import fcntl
import json
import logging
import os
import time
from typing import Optional

log = logging.getLogger(__name__)

DEFAULT_PATH = "/tmp/phiseg_tpu.lock"


def _lock_path(path: Optional[str] = None) -> str:
    return path or os.environ.get("PHISEG_TPU_LOCK", DEFAULT_PATH)


def read_holder(path: Optional[str] = None) -> Optional[dict]:
    """Return the live holder's {pid, tag, time} record, or None if free.

    Liveness comes from the kernel: if a non-blocking shared flock
    succeeds, no process holds the exclusive lock (a dead holder's flock
    was released automatically) and the file's content is just a remnant.
    """
    path = _lock_path(path)
    try:
        fd = os.open(path, os.O_RDONLY)
    except FileNotFoundError:
        return None
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
            return None  # nobody holds LOCK_EX -> free
        except OSError:
            pass  # exclusively held -> read holder info
        try:
            rec = json.loads(os.read(fd, 4096).decode() or "{}")
        except (ValueError, OSError):
            rec = {}
        rec.setdefault("pid", -1)
        rec.setdefault("tag", "?")
        return rec
    finally:
        os.close(fd)


class TpuLock:
    """Context manager holding the advisory TPU lock (flock-based).

    acquire() polls until the exclusive flock is granted; wait=False tries
    once. NOT re-entrant: a second TpuLock in the same process contends
    like any other process.
    """

    def __init__(self, tag: str, path: Optional[str] = None,
                 max_wait_s: Optional[float] = 10800.0):
        """max_wait_s bounds acquire() by default: after it expires the
        context manager proceeds WITHOUT the lock (warned). Rationale:
        this is an advisory liveness mechanism on a single-user VM -- a
        holder that is alive but wedged (e.g. hung on a dead tunnel
        dispatch) must not block the work queue forever."""
        self.tag = tag
        self.path = _lock_path(path)
        self.max_wait_s = max_wait_s
        self._fd: Optional[int] = None

    @property
    def _held(self) -> bool:
        return self._fd is not None

    def acquire(self, wait: bool = True, poll_s: float = 10.0,
                max_wait_s: Optional[float] = -1.0) -> bool:
        """max_wait_s: -1 (default) uses the instance's bound; None waits
        forever; a number overrides."""
        if max_wait_s == -1.0:
            max_wait_s = self.max_wait_s
        if self._held:
            return True
        t0 = time.time()
        warned = 0.0
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                except OSError:
                    pass  # held by someone; maybe poll
                else:
                    # Holder info is written while holding LOCK_EX; one
                    # small write after truncate, effectively atomic for
                    # readers that only read after failing LOCK_SH.
                    os.ftruncate(fd, 0)
                    os.lseek(fd, 0, os.SEEK_SET)
                    os.write(fd, json.dumps(
                        {"pid": os.getpid(), "tag": self.tag,
                         "time": time.time()}).encode())
                    self._fd = fd
                    return True
                if not wait:
                    os.close(fd)
                    return False
                waited = time.time() - t0
                if max_wait_s is not None and waited >= max_wait_s:
                    os.close(fd)
                    return False
                if waited - warned >= 60.0:
                    log.info("waiting for TPU lock held by %s (%.0fs)",
                             read_holder(self.path), waited)
                    warned = waited
                time.sleep(poll_s)
        except BaseException:
            os.close(fd)
            raise

    def release(self) -> None:
        if self._fd is not None:
            try:
                os.ftruncate(self._fd, 0)  # clear remnant holder info
            except OSError:
                pass
            try:
                fcntl.flock(self._fd, fcntl.LOCK_UN)
            finally:
                os.close(self._fd)
                self._fd = None

    def __enter__(self):
        if not self.acquire():
            log.warning(
                "proceeding WITHOUT the TPU lock after %.0fs wait (holder %s "
                "appears wedged); measurements may be contended",
                self.max_wait_s or 0.0, read_holder(self.path),
            )
        return self

    def __exit__(self, *exc):
        self.release()
        return False


def wait_for_free(max_wait_s: float = 900.0, poll_s: float = 10.0,
                  path: Optional[str] = None) -> dict:
    """Wait (bounded) for the TPU lock to clear WITHOUT taking it.

    For bench.py: returns {"waited_s": float, "held_by": holder-or-None};
    held_by is non-None only if the wait timed out with the lock still
    held, in which case the measurement about to happen is contended and
    the caller must say so in its output.
    """
    t0 = time.time()
    while True:
        holder = read_holder(path)
        if holder is None:
            return {"waited_s": round(time.time() - t0, 1), "held_by": None}
        if time.time() - t0 >= max_wait_s:
            return {"waited_s": round(time.time() - t0, 1), "held_by": holder}
        time.sleep(poll_s)
