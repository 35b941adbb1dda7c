"""Multi-criterion checkpoint manager.

Equivalent of the reference's five tf.train.Savers
(phiseg/phiseg_model.py:143-148: rolling latest + best val-loss / Dice / GED
/ NCC, saved on metric improvement :638-660, selected by tag string at load
:505-525) and the auto-resume scan (_setup_log_dir_and_continue_mode
:821-848, tfwrapper/utils.py:189-210).

Checkpoints are flax msgpack serialisations of the full TrainState (params,
batch stats, optimiser state, step), written atomically (tmp + rename) so a
preempted TPU job never leaves a torn file. Tags mirror the reference file
names: latest -> model.ckpt, best_dice -> model_best_dice.ckpt, etc.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Optional

import jax
from flax import serialization

TAGS = ("latest", "best_loss", "best_dice", "best_ged", "best_ncc", "archive")

_TAG_PREFIX = {
    "latest": "model.ckpt",
    "best_loss": "model_best_loss.ckpt",
    "best_dice": "model_best_dice.ckpt",
    "best_ged": "model_best_ged.ckpt",
    "best_ncc": "model_best_ncc.ckpt",
    "archive": "model_archive.ckpt",
}


class CheckpointManager:
    def __init__(self, log_dir: str, keep: int = 2, keep_latest: int = 1,
                 archive_every_hours: float | None = 3.0,
                 async_writes: bool = False):
        """archive_every_hours: time-based archival saves that are NEVER
        pruned, so a long run keeps periodic forensic history (the
        reference's keep_checkpoint_every_n_hours=3, phiseg_model.py:144).
        None disables.

        async_writes: serialise + write on a background worker thread so the
        training loop is not blocked by seconds of msgpack/disk per save (the
        reference's saver.save blocks the session loop, phiseg_model.py:534;
        on this 1-vCPU host a ~200MB state costs ~1s serialise + write while
        the main thread is mostly idle on tunnel I/O). Saves are processed
        in submission order by ONE worker, so tag semantics and the
        hardlink multi-tag optimisation are unchanged. wait() drains the
        queue (restore() calls it); close() drains AND joins the worker
        thread for shutdown."""
        import time

        self.log_dir = log_dir
        self.keep = keep
        self.keep_latest = keep_latest
        self.archive_every_hours = archive_every_hours
        self._async = async_writes
        self._queue = None
        self._worker = None
        self._worker_error = None
        # (step, weakref-to-state, path) of the most recent real write, so
        # same-state multi-tag saves (latest + best_* at one validation)
        # serialise the ~200MB state ONCE and hardlink the other tags. A
        # weakref (not a strong ref) so the manager never extends the host
        # pytree's lifetime past the caller's own reference -- holding it
        # strongly doubled host-state RAM between validations on the
        # 1-vCPU VM. Identity checks still work while the caller's
        # reference is live, which is exactly the multi-tag save window.
        self._last_write = None
        os.makedirs(log_dir, exist_ok=True)
        # Resume-aware: the clock starts at the newest existing archive.
        mtimes = [
            os.path.getmtime(p)
            for p in glob.glob(os.path.join(self.log_dir, "model_archive.ckpt-*.msgpack"))
        ]
        self._last_archive_time = max(mtimes) if mtimes else time.time()

    # -- paths ---------------------------------------------------------------

    def _path(self, tag: str, step: int) -> str:
        return os.path.join(self.log_dir, f"{_TAG_PREFIX[tag]}-{step}.msgpack")

    def _list_steps(self, tag: str):
        prefix = _TAG_PREFIX[tag]
        pat = re.compile(re.escape(prefix) + r"-(\d+)\.msgpack$")
        steps = []
        for p in glob.glob(os.path.join(self.log_dir, f"{prefix}-*.msgpack")):
            m = pat.search(os.path.basename(p))
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self, tag: str = "latest") -> Optional[int]:
        """Highest saved step for a tag (ref get_latest_model_checkpoint_path)."""
        if self._queue is not None:
            self._queue.join()  # pending async writes count
        steps = self._list_steps(tag)
        return steps[-1] if steps else None

    # -- save / restore --------------------------------------------------------

    def save(self, state, tag: str = "latest", step: Optional[int] = None) -> str:
        if tag not in TAGS:
            raise ValueError(f"unknown checkpoint tag: {tag!r} (known: {TAGS})")
        if step is None:
            step = int(jax.device_get(state.step))
        if self._async:
            self._ensure_worker()
            if self._worker_error is not None:
                err, self._worker_error = self._worker_error, None
                raise err
            # Snapshot device buffers to host BEFORE enqueueing so the worker
            # never touches buffers a later donated step might invalidate --
            # but keep already-host states as the SAME object (device_get
            # rebuilds the pytree container even for numpy leaves, which
            # would break the identity check behind the multi-tag hardlink
            # optimisation).
            if any(isinstance(leaf, jax.Array)
                   for leaf in jax.tree_util.tree_leaves(state)):
                state = jax.device_get(state)
            self._queue.put((state, tag, step))
            return self._path(tag, step)
        return self._save_sync(state, tag, step)

    def _ensure_worker(self):
        import queue
        import threading

        if self._worker is not None:
            return
        self._queue = queue.Queue()

        def run():
            while True:
                item = self._queue.get()
                try:
                    if item is None:
                        return
                    if callable(item):
                        item()  # submit()-ed follow-up task
                    else:
                        self._save_sync(*item)
                except Exception as e:  # surfaced on the next save()/wait()
                    self._worker_error = e
                finally:
                    self._queue.task_done()

        self._worker = threading.Thread(target=run, daemon=True, name="ckpt-writer")
        self._worker.start()

    def submit(self, fn) -> None:
        """Run fn AFTER every previously-enqueued write has published
        (immediately in sync mode). The single ordered worker queue is the
        durability barrier: a metadata record submitted here (e.g. the
        trainer's best_metrics.json) can never claim checkpoints whose
        writes were still pending when the process died."""
        if self._async:
            self._ensure_worker()
            self._queue.put(fn)
        else:
            fn()

    def wait(self):
        """Drain pending async writes; re-raise any worker error."""
        if self._queue is not None:
            self._queue.join()
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def close(self):
        """Shut down the async writer: drain the queue, join the thread,
        re-raise any worker error. Idempotent; no-op in sync mode."""
        if self._worker is not None:
            self._queue.put(None)
            self._queue.join()
            self._worker.join()
            self._worker = None
            self._queue = None
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def _save_sync(self, state, tag: str, step: int) -> str:
        path = self._path(tag, step)
        tmp = path + ".tmp"
        # Multi-tag saves of the SAME state at the same step (the validation
        # flow saves latest + up to 4 best_* tags) reuse the first write via
        # hardlink instead of re-serialising ~200MB per tag (measured ~1 min
        # each on a 1-vCPU host). Files are never mutated in place (tmp +
        # rename), so shared inodes are safe.
        if (
            self._last_write is not None
            and self._last_write[0] == step
            and self._last_write[1]() is state
            and os.path.exists(self._last_write[2])
            and self._last_write[2] != path
        ):
            try:
                if os.path.exists(tmp):
                    os.remove(tmp)
                os.link(self._last_write[2], tmp)
            except OSError:
                import shutil

                shutil.copyfile(self._last_write[2], tmp)
            os.replace(tmp, path)  # atomic publish
        else:
            # One bulk transfer: leaf-by-leaf D2H is pathologically slow
            # through tunnelled backends (~30ms per array). No-op for host
            # arrays.
            host_state = jax.device_get(state)
            data = serialization.to_bytes(host_state)
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic publish
            import weakref

            try:
                ref = weakref.ref(state)
            except TypeError:  # non-weakref-able state (e.g. plain dict)
                ref = lambda: None  # noqa: E731 -- disables hardlink reuse
            self._last_write = (step, ref, path)

        if tag != "archive":  # archives are permanent
            keep = self.keep_latest if tag == "latest" else self.keep
            for old in self._list_steps(tag)[:-keep]:
                try:
                    os.remove(self._path(tag, old))
                except OSError:
                    pass
        return path

    def maybe_archive(self, state) -> Optional[str]:
        """Save an unpruned archive checkpoint if archive_every_hours has
        elapsed since the last one. Returns the path or None."""
        import time

        if self.archive_every_hours is None:
            return None
        now = time.time()
        if now - self._last_archive_time < self.archive_every_hours * 3600.0:
            return None
        self._last_archive_time = now
        return self.save(state, "archive")

    def restore(self, template_state, tag: str = "latest",
                step: Optional[int] = None):
        """Restore into the structure of template_state. Returns (state, step)."""
        self.wait()  # a pending async write may be the checkpoint we want
        if tag not in TAGS:
            raise ValueError(f"unknown checkpoint tag: {tag!r} (known: {TAGS})")
        if step is None:
            step = self.latest_step(tag)
            if step is None:
                raise FileNotFoundError(
                    f"no '{tag}' checkpoint in {self.log_dir}"
                )
        path = self._path(tag, step)
        with open(path, "rb") as f:
            state = serialization.from_bytes(template_state, f.read())
        return state, step

    def has_checkpoint(self, tag: str = "latest") -> bool:
        return self.latest_step(tag) is not None


def write_metrics_jsonl(path: str, step: int, metrics: dict) -> None:
    """Append one structured metrics record (observability sidecar)."""
    rec = {"step": int(step)}
    for k, v in metrics.items():
        try:
            rec[k] = float(v)
        except (TypeError, ValueError):
            rec[k] = v
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
