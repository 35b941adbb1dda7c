"""Advisory TPU-use lockfile: bench and training/eval jobs never contend.

The host has one vCPU and one tunnelled TPU chip; two TPU programs running
concurrently serialise on the chip and both record garbage numbers
(CLAUDE.md "NEVER run ... concurrently with a TPU job"). Round 3 relied on
a comment in the chain script to prevent the driver's end-of-round bench.py
from overlapping a still-running trainer; this module makes the exclusion
structural (VERDICT r3, next-round item 7):

  * long-running TPU jobs (Trainer.train, the quantitative/prediction eval
    CLIs) hold the lock for their duration;
  * bench.py calls `wait_for_free()` -- it waits (bounded) for the lock to
    clear and reports both the wait and any still-held lock in its JSON
    `extra`, so an overlapped measurement is impossible to mistake for a
    clean one.

The lock is a JSON file ({pid, tag, time}) created with O_CREAT|O_EXCL.
Liveness is checked via os.kill(pid, 0): a lock whose holder is dead is
stale and broken automatically, so crashes never wedge the queue. This is
advisory coordination between cooperating processes on one VM, not
security.

No reference equivalent (the reference assumes a dedicated GPU per job);
TPU-native operational concern only.
"""

from __future__ import annotations

import errno
import json
import logging
import os
import threading
import time
from typing import Optional

log = logging.getLogger(__name__)

DEFAULT_PATH = "/tmp/phiseg_tpu.lock"


def _lock_path(path: Optional[str] = None) -> str:
    return path or os.environ.get("PHISEG_TPU_LOCK", DEFAULT_PATH)


def read_holder(path: Optional[str] = None) -> Optional[dict]:
    """Return the live holder's {pid, tag, time} record, or None if the lock
    is free. A record whose pid is dead is stale: it is removed and None is
    returned."""
    path = _lock_path(path)
    try:
        with open(path) as f:
            rec = json.load(f)
        pid = int(rec["pid"])
    except FileNotFoundError:
        return None  # free. (Do NOT re-check exists(): by now another
        #              process may have legitimately taken the lock.)
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        # File present but unreadable = corrupt remnant; break it. Locks
        # are created content-complete (acquire links a fully-written temp
        # file), so a partially-written lock cannot be observed.
        _break(path, "corrupt lock file")
        return None
    if pid == os.getpid():
        return rec  # our own (re-entrant callers see themselves)
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        _break(path, f"holder pid {pid} is dead")
        return None
    except PermissionError:
        pass  # alive, owned by another uid
    return rec


def _break(path: str, why: str) -> None:
    try:
        os.remove(path)
        log.warning("broke stale TPU lock %s (%s)", path, why)
    except OSError:
        pass


class TpuLock:
    """Context manager holding the advisory TPU lock.

    acquire() polls until the lock is free (stale locks are broken), then
    atomically creates it. wait=False returns False instead of polling.
    """

    def __init__(self, tag: str, path: Optional[str] = None,
                 max_wait_s: Optional[float] = 10800.0):
        """max_wait_s bounds the context-manager acquire: after it expires
        the caller proceeds WITHOUT the lock (warned). Rationale: this is
        an advisory liveness mechanism on a single-user VM -- a holder
        that is alive but wedged (e.g. hung on a dead tunnel dispatch)
        must not block the work queue forever."""
        self.tag = tag
        self.path = _lock_path(path)
        self.max_wait_s = max_wait_s
        self._held = False

    def acquire(self, wait: bool = True, poll_s: float = 10.0,
                max_wait_s: Optional[float] = None) -> bool:
        t0 = time.time()
        warned = 0.0
        while True:
            holder = read_holder(self.path)
            if holder is None or int(holder.get("pid", -1)) == os.getpid():
                # Atomic create-WITH-content: hard-link a fully-written temp
                # file into place (link fails with EEXIST if someone else
                # won). Writing after an O_CREAT|O_EXCL open is racy: a
                # concurrent read_holder would see the empty file, deem it
                # corrupt and break the fresh lock.
                tmp = f"{self.path}.{os.getpid()}.{threading.get_ident()}.tmp"
                with open(tmp, "w") as f:
                    json.dump({"pid": os.getpid(), "tag": self.tag,
                               "time": time.time()}, f)
                try:
                    os.link(tmp, self.path)
                except OSError as e:
                    if e.errno != errno.EEXIST:
                        os.remove(tmp)
                        raise
                    # lost the race; fall through to wait/poll
                else:
                    self._held = True
                finally:
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
                if self._held:
                    return True
            if not wait:
                return False
            waited = time.time() - t0
            if max_wait_s is not None and waited >= max_wait_s:
                return False
            if waited - warned >= 60.0:
                log.info("waiting for TPU lock held by %s (%.0fs)", holder, waited)
                warned = waited
            time.sleep(poll_s)

    def release(self) -> None:
        if self._held:
            _break(self.path, "released")
            self._held = False

    def __enter__(self):
        if not self.acquire(max_wait_s=self.max_wait_s):
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
