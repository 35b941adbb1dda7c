"""The training loop: steps, monitoring, validation, checkpoints, resume.

Equivalent of the reference engine's session loop (phiseg/phiseg_model.py:
166-207 train, :530-701 validation with multi-criterion best checkpoints,
:821-848 auto-resume). TPU-native differences:

  * the train step is one jitted XLA program (augmentation via MXU-matmul
    warps + fwd + bwd + optimiser + BN stats + per-step rng fold) -- a
    single device dispatch per iteration;
  * data loading is overlapped with device compute via a background
    prefetch thread;
  * validation sampling and GED/NCC/Dice run on device (vmapped), not in
    host Python loops;
  * checkpoints are atomic msgpack files with the same five tags;
  * monitoring goes to a dependency-free TensorBoard event file + JSONL.
"""

from __future__ import annotations

import logging
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from phiseg_tpu.engine.checkpoint import CheckpointManager, write_metrics_jsonl
from phiseg_tpu.engine.config import ExperimentConfig, log_root
from phiseg_tpu.engine.train import (
    build_model,
    create_train_state,
    make_eval_loss_fn,
    make_optimizer,
    make_train_step,
)
from phiseg_tpu.engine.validation import make_validation_fn
from phiseg_tpu.utils.tb_writer import SummaryWriter

log = logging.getLogger(__name__)


class _Prefetcher:
    """Background thread pulling host batches ahead of the device."""

    def __init__(self, provider, batch_size: int, depth: int = 2):
        self.provider = provider
        self.batch_size = batch_size
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self.t = threading.Thread(target=self._run, daemon=True)
        self.t.start()

    def _run(self):
        while not self._stop.is_set():
            batch = self.provider.next_batch(self.batch_size)
            while not self._stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self):
        return self.q.get()

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass


def _make_host_lr_fn(schedule):
    """Host-side learning-rate lookup for logging, built from the SAME
    `lr_schedule_from_dict` the optimiser uses (single source of truth; the
    two used to be parallel implementations that could drift). The schedule
    closure is built and evaluated under the host CPU backend so each log
    line costs microseconds, not a ~30ms tunnelled-TPU dispatch."""
    cpu = jax.local_devices(backend="cpu")[0]
    from phiseg_tpu.engine.train import lr_schedule_from_dict

    with jax.default_device(cpu):
        fn = lr_schedule_from_dict(dict(schedule))

    def host_lr(step: int) -> float:
        with jax.default_device(cpu):
            return float(fn(step))

    return host_lr


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        log_dir: Optional[str] = None,
        mesh=None,
        resume: bool = True,
    ):
        from phiseg_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
        self.cfg = cfg
        self.log_dir = log_dir or os.path.join(
            log_root(), cfg.log_dir_name, cfg.experiment_name
        )
        os.makedirs(self.log_dir, exist_ok=True)
        # Config snapshot for provenance; eval CLIs reload this
        # (ref phiseg_train.py:44-47, phiseg_test_quantitative.py:94-97).
        cfg.save(os.path.join(self.log_dir, "config.json"))

        self.model = build_model(cfg)
        self.tx = make_optimizer(cfg)
        self.mesh = mesh

        rng = jax.random.PRNGKey(cfg.seed)
        self.state = create_train_state(self.model, cfg, rng, self.tx)
        self.ckpt = CheckpointManager(
            self.log_dir, keep=cfg.checkpoint_keep,
            archive_every_hours=cfg.archive_every_hours,
            async_writes=getattr(cfg, "async_checkpointing", False),
        )
        self.init_step = 0
        self.best = {"dice": -1.0, "loss": np.inf, "ged": np.inf, "ncc": -1.0}
        self._best_path = os.path.join(self.log_dir, "best_metrics.json")
        if resume and self.ckpt.has_checkpoint("latest"):
            self.state, _ = self.ckpt.restore(self.state, "latest")
            # Resume from the state's own counter (the filename is a label).
            self.init_step = int(jax.device_get(self.state.step))
            log.info("resuming from step %d", self.init_step)
            # Documented deviation (cfg.persist_best_metrics): reload the
            # best-metric values so the first post-resume validation cannot
            # clobber a better historical best_* checkpoint (the reference
            # resets its bests on every train() start, phiseg_model.py:
            # 180-184, and has the same flaw).
            if getattr(cfg, "persist_best_metrics", True) and os.path.exists(self._best_path):
                import json as _json

                with open(self._best_path) as f:
                    saved = _json.load(f)
                self.best.update({k: float(v) for k, v in saved.items()})
                log.info("restored best metrics: %s", self.best)

        augment_fn = None
        if cfg.augment_on_device and cfg.augmentation_options:
            from phiseg_tpu.data.augment_device import make_augment_fn

            augment_fn = make_augment_fn(cfg.augmentation_options, cfg.nlabels)

        # fold_by_step: the per-step key is derived from state.step inside
        # the program, so the hot loop passes one constant base key and the
        # whole step (aug + fwd + bwd + opt) is a single device dispatch.
        self.train_step = make_train_step(
            self.model, cfg, self.tx, augment_fn=augment_fn,
            use_fused_ce=cfg.use_fused_loss_kernel, mesh=mesh,
            fold_by_step=True,
        )
        self.eval_loss = make_eval_loss_fn(self.model, cfg)
        self.validate_fn = make_validation_fn(self.model, cfg)
        if mesh is not None:
            from phiseg_tpu.parallel import shard_train_step

            self.train_step, self.state = shard_train_step(
                self.train_step, self.state, mesh
            )

        self.writer = SummaryWriter(self.log_dir)
        self.metrics_path = os.path.join(self.log_dir, "metrics.jsonl")
        self._host_lr = _make_host_lr_fn(cfg.lr_schedule)

    # ------------------------------------------------------------------

    def _shard_batch(self, x, s):
        # Narrow wire formats: host->device batch transfer is a per-step cost
        # through the tunnelled TPU (shared-bandwidth link), so ship labels as
        # uint8 and, on a bf16 compute path, images as bfloat16 (the first
        # conv casts to bf16 anyway; LIDC images are uint8-derived so 8
        # mantissa bits are enough). ~2.6x less per-step wire traffic.
        s = np.asarray(s)
        if self.cfg.nlabels <= 255 and s.dtype != np.uint8:
            s = s.astype(np.uint8)
        x = np.asarray(x)
        if self.cfg.dtype == jnp.bfloat16:
            import ml_dtypes  # host-side bf16 so 2-byte values cross the wire

            x = x.astype(ml_dtypes.bfloat16)
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(s)
        # Multi-host aware: each process contributes its local slice of the
        # global batch (delegates to a plain device_put when single-host).
        from phiseg_tpu.parallel import shard_host_batch

        return shard_host_batch(x, self.mesh), shard_host_batch(s, self.mesh)

    def train(self, data, num_iter: Optional[int] = None):
        cfg = self.cfg
        num_iter = num_iter if num_iter is not None else cfg.num_iter
        rng = jax.random.PRNGKey(cfg.seed + 1)
        prefetch = _Prefetcher(data.train, cfg.batch_size)
        from phiseg_tpu.utils.profiling import StepProfiler
        from phiseg_tpu.utils.tpu_lock import TpuLock

        profiler = StepProfiler()
        # Advisory exclusion vs bench.py / other TPU jobs on this one-chip
        # VM (see utils/tpu_lock.py). Held for the whole loop; released in
        # the finally below even on exceptions.
        tpu_lock = TpuLock(f"train:{cfg.experiment_name}")
        if not tpu_lock.acquire():  # bounded by the instance default (3h)
            log.warning("proceeding WITHOUT the TPU lock (holder %s appears "
                        "wedged)", tpu_lock.path)
        try:
            t_last = time.perf_counter()
            for step in range(self.init_step, num_iter):
                profiler.maybe_start(step)
                x, s = prefetch.next()
                x, s = self._shard_batch(x, s)
                # constant base key; the step folds in state.step on device
                self.state, loss_dict = self.train_step(self.state, x, s, rng)
                profiler.maybe_stop(step)

                if step % cfg.tensorboard_update_frequency == 0:
                    loss_dict = jax.device_get(loss_dict)
                    # numerical-failure detection (the reference had none;
                    # this is the TPU analogue of a sanitizer, SURVEY.md §5)
                    if not np.isfinite(loss_dict["total_loss"]):
                        bad = [k for k, v in loss_dict.items() if not np.isfinite(v)]
                        raise FloatingPointError(
                            f"non-finite loss at step {step}: {bad}. Set "
                            "JAX_DEBUG_NANS=1 to localise the op; last good "
                            f"checkpoint is in {self.log_dir}."
                        )
                    now = time.perf_counter()
                    dt = now - t_last
                    t_last = now
                    ips = (
                        cfg.batch_size * cfg.tensorboard_update_frequency / dt
                        if step > self.init_step
                        else 0.0
                    )
                    scalars = {f"batch_{k}": float(v) for k, v in loss_dict.items()}
                    scalars["images_per_sec"] = ips
                    # lr schedule lookup (ref logs learning_rate, :720)
                    scalars["learning_rate"] = self._host_lr(step)
                    self.writer.scalars(scalars, step)
                    self.writer.flush()
                    write_metrics_jsonl(self.metrics_path, step, scalars)
                    log.info(
                        "step %d: loss %.4f (%.1f img/s)",
                        step, float(loss_dict["total_loss"]), ips,
                    )

                if step % cfg.validation_frequency == 0 and step > self.init_step:
                    self.do_validation(data, step)
                    t_last = time.perf_counter()  # exclude validation from img/s
            # Always persist the final state (normal completion only --
            # after a FloatingPointError the live state may be non-finite
            # and must NOT overwrite 'latest'): without this, up to
            # validation_frequency-1 trailing steps (or a whole short
            # resumed run) would be silently discarded.
            self.ckpt.save(jax.device_get(self.state), "latest")
        finally:
            prefetch.stop()
            # Drain the daemon writer thread even on exceptions: checkpoint
            # writes queued at the last validation would otherwise be
            # silently dropped on a mid-run crash (incl. the
            # FloatingPointError above, whose message promises a usable
            # checkpoint). If an exception is already in flight, a writer
            # error is logged instead of raised so it can't mask the
            # original failure.
            import sys

            unwinding = sys.exc_info()[0] is not None
            try:
                self.ckpt.wait()
            except Exception:
                if not unwinding:
                    raise
                log.exception("checkpoint writer failed during error unwind")
            finally:
                tpu_lock.release()
        return self.state

    # ------------------------------------------------------------------

    def do_validation(self, data, step: int, val_batch: int = 32):
        """Full validation pass (ref _do_validation :530-701).

        val_batch 32 (not 8): per-program-call dispatch overhead through the
        tunnelled TPU dominates the on-device metric compute, so fewer,
        larger validation calls are strictly cheaper; results are per-image
        and numerically independent of the batching."""
        cfg = self.cfg
        t0 = time.time()
        # Snapshot the state to host ONCE; the (up to five) tag saves below
        # then serialise from host memory instead of re-transferring.
        host_state = jax.device_get(self.state)
        self.ckpt.save(host_state, "latest")  # filename label = state.step
        self.ckpt.maybe_archive(host_state)  # every-N-hours forensic history

        rng = jax.random.PRNGKey(cfg.seed + 2 + step)
        variables = self.state.variables

        # batch losses on one val + one train batch, eval mode (ref :537-549)
        vx, vs = data.validation.next_batch(cfg.batch_size)
        val_losses = jax.device_get(self.eval_loss(variables, jnp.asarray(vx), jnp.asarray(vs), rng))
        tx_, ts_ = data.train.next_batch(cfg.batch_size)
        train_losses = jax.device_get(self.eval_loss(variables, jnp.asarray(tx_), jnp.asarray(ts_), rng))

        # full metric pass over num_validation_images (ref :567-628)
        n_images = data.validation.images.shape[0]
        if cfg.num_validation_images != "all":
            n_images = min(n_images, int(cfg.num_validation_images))
        val_batch = min(val_batch, n_images)  # don't pad past the val set

        from phiseg_tpu.engine.validation import pad_to_batch

        host_rng = np.random.RandomState(cfg.seed + step)
        dices, geds, nccs = [], [], []
        elbos, elbo_weights = [], []
        for b0 in range(0, n_images, val_batch):
            b1 = min(b0 + val_batch, n_images)
            n_real = b1 - b0
            x = np.asarray(data.validation.images[b0:b1]).astype(np.float32)[..., None]
            ann = np.asarray(data.validation.labels[b0:b1]).astype(np.int32)  # (B,H,W,M)
            ann = np.transpose(ann, (0, 3, 1, 2))  # (B,M,H,W)
            # random annotator per image (ref :575)
            picks = host_rng.choice(list(cfg.annotator_range), size=n_real)
            s_sel = np.stack([ann[i, a] for i, a in enumerate(picks)], axis=0)
            # fixed batch shape -> one compile; slice padded results away
            x, ann, s_sel = (pad_to_batch(a, val_batch) for a in (x, ann, s_sel))
            d, g, nc, e = self.validate_fn(
                variables, jnp.asarray(x), jnp.asarray(ann), jnp.asarray(s_sel),
                jax.random.fold_in(rng, b0),
            )
            dices.append(np.asarray(d)[:n_real])
            geds.append(np.asarray(g)[:n_real])
            nccs.append(np.asarray(nc)[:n_real])
            elbos.append(float(e))
            elbo_weights.append(n_real)

        dice_arr = np.concatenate(dices, 0)  # (N, nlabels)
        per_structure_dice = dice_arr.mean(0)
        mean_dice = float(per_structure_dice.mean())
        avg_ged = float(np.concatenate(geds).mean())
        avg_ncc = float(np.concatenate(nccs).mean())
        avg_elbo = float(np.average(elbos, weights=elbo_weights))

        log.info(
            "VALIDATION step %d (%d images): dice %.4f | -ELBO %.4f | GED %.4f | NCC %.4f (%.1fs)",
            step, n_images, mean_dice, avg_elbo, avg_ged, avg_ncc, time.time() - t0,
        )

        # multi-criterion best checkpoints (ref :638-660)
        improved = False
        if mean_dice >= self.best["dice"]:
            self.best["dice"] = mean_dice
            self.ckpt.save(host_state, "best_dice")
            improved = True
        if avg_elbo <= self.best["loss"]:
            self.best["loss"] = avg_elbo
            self.ckpt.save(host_state, "best_loss")
            improved = True
        if avg_ged <= self.best["ged"]:
            self.best["ged"] = avg_ged
            self.ckpt.save(host_state, "best_ged")
            improved = True
        if avg_ncc >= self.best["ncc"]:
            self.best["ncc"] = avg_ncc
            self.ckpt.save(host_state, "best_ncc")
            improved = True
        if improved and getattr(self.cfg, "persist_best_metrics", True):
            # Publish best_metrics.json ONLY after the best_* checkpoint
            # writes above are durable: it rides the same ordered writer
            # queue (ckpt.submit), so a crash can never leave a json that
            # claims best values whose checkpoints never landed -- which
            # would permanently block those best_* tags from being
            # re-saved after resume.
            best_snapshot = dict(self.best)
            path = self._best_path

            def _publish_best(best=best_snapshot, path=path):
                import json as _json

                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    _json.dump(best, f)
                os.replace(tmp, path)

            self.ckpt.submit(_publish_best)

        scalars = {
            "validation_dice_mean_score": mean_dice,
            "validation_dice_tot_score": float(dice_arr.mean()),
            "validation_neg_elbo": avg_elbo,
            "validation_GED": avg_ged,
            "validation_NCC": avg_ncc,
        }
        for i in range(cfg.nlabels):
            scalars[f"validation_dice_lbl_{i}"] = float(per_structure_dice[i])
        for k, v in val_losses.items():
            scalars[f"val_batch_{k}"] = float(v)
        for k, v in train_losses.items():
            scalars[f"train_batch_{k}"] = float(v)
        self.writer.scalars(scalars, step)

        # per-level diagnostics + image summaries + histograms
        # (ref _make_tensorboard_summaries :704-776, layers.py:671-677)
        if cfg.do_image_summaries or cfg.do_histogram_summaries:
            if not hasattr(self, "_diag_fn"):
                from phiseg_tpu.utils.diagnostics import make_diag_fn, make_param_hist_fn

                self._diag_fn = make_diag_fn(
                    self.model, cfg, histograms=cfg.do_histogram_summaries
                )
                self._param_hist_fn = make_param_hist_fn()

            # train-batch diagnostics: mu/sigma means, train_* grids and the
            # weight/activation histograms all come from the train feed, like
            # the reference's merged train summary (:719-736).
            t_scalars, t_grids, t_hists = jax.device_get(
                self._diag_fn(variables, jnp.asarray(tx_), jnp.asarray(ts_), rng)
            )
            self.writer.scalars({k: float(v) for k, v in t_scalars.items()}, step)
            scalars.update({k: float(v) for k, v in t_scalars.items()})

        if cfg.do_image_summaries:
            from phiseg_tpu.engine.train import make_sample_fn
            from phiseg_tpu.utils.image_grid import batch_to_grid, kernels_to_grid

            if not hasattr(self, "_img_sampler"):
                self._img_sampler = make_sample_fn(self.model, 1)
            probs = self._img_sampler(variables, jnp.asarray(vx), rng)
            gen_seg = np.asarray(jnp.argmax(probs[0], axis=-1))
            v_scalars_, v_grids, _ = jax.device_get(
                self._diag_fn(variables, jnp.asarray(vx), jnp.asarray(vs), rng)
            )
            del v_scalars_
            lm = lambda a: batch_to_grid(a, "labelmap", cfg.nlabels)  # noqa: E731
            self.writer.image("train_x_inp", batch_to_grid(np.asarray(tx_), "standardize"), step)
            self.writer.image("train_s_inp", lm(np.asarray(ts_)), step)
            self.writer.image("val_x_inp", batch_to_grid(np.asarray(vx), "standardize"), step)
            self.writer.image("val_s_inp", lm(np.asarray(vs)), step)
            self.writer.image("generated_seg", lm(gen_seg), step)
            self.writer.image("generated_x_in", batch_to_grid(np.asarray(vx), "standardize"), step)
            for prefix, grids in (("train", t_grids), ("val", v_grids)):
                for name, g in grids.items():
                    self.writer.image(f"{prefix}_{name}", lm(g), step)
            # first-layer kernel grid (ref put_kernels_on_grid viz)
            from phiseg_tpu.utils.diagnostics import first_conv_kernel

            kname, kernel = first_conv_kernel(host_state.params)
            if kernel is not None:
                self.writer.image(f"kernels/{kname}", kernels_to_grid(kernel), step)

        if cfg.do_histogram_summaries:
            for name, h in t_hists.items():
                self.writer.histogram_summary(name, h, step)
            w_hists = jax.device_get(self._param_hist_fn(self.state.params))
            for name, h in w_hists.items():
                self.writer.histogram_summary(name, h, step)

        self.writer.flush()
        write_metrics_jsonl(self.metrics_path, step, scalars)
        return scalars
