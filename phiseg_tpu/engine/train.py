"""Jitted training / evaluation step factories and train state.

Replaces the reference's TF1 session machinery (phiseg/phiseg_model.py:132-157
optimizer + UPDATE_OPS control-dependency, :166-207 feed_dict train loop) with
pure functions: one jitted `train_step(state, x, s, rng)` that fuses forward,
backward, optimiser update and batch-norm statistics update into a single XLA
program. The learning-rate dict schedule (utils.py:70-84 `find_floor_in_list`)
becomes a piecewise-constant optax schedule evaluated inside the step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.objective import phiseg_objective
from phiseg_tpu.models.segvae import SegVAE, aggregate_levels
from phiseg_tpu.nn.losses import one_hot


def build_model(cfg: ExperimentConfig) -> SegVAE:
    return SegVAE(
        model_family=cfg.model_family,
        zdim0=cfg.zdim0,
        n0=cfg.n0,
        latent_levels=cfg.latent_levels,
        resolution_levels=cfg.resolution_levels,
        nlabels=cfg.nlabels,
        image_size=cfg.image_hw,
        norm=cfg.norm,
        dtype=cfg.dtype,
    )


def lr_schedule_from_dict(schedule: Dict[int, float]) -> Callable[[jax.Array], jax.Array]:
    """Step-threshold dict -> piecewise-constant schedule.

    Equivalent of looking up the largest key <= step in `lr_schedule_dict`
    (ref phiseg_model.py:186-190, utils.py:70-84).
    """
    steps = sorted(schedule.keys())
    boundaries = jnp.asarray(steps, dtype=jnp.int32)
    values = jnp.asarray([schedule[s] for s in steps], dtype=jnp.float32)

    def fn(step):
        idx = jnp.clip(jnp.searchsorted(boundaries, step, side="right") - 1, 0, len(steps) - 1)
        return values[idx]

    return fn


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    sched = lr_schedule_from_dict(dict(cfg.lr_schedule))
    if cfg.optimizer == "adam":
        return optax.adam(learning_rate=sched)  # TF defaults: b1=.9 b2=.999 eps=1e-8
    if cfg.optimizer == "momentum":
        # Nesterov momentum 0.9 (ref phiseg_model.py:137-140).
        return optax.sgd(learning_rate=sched, momentum=0.9, nesterov=True)
    if cfg.optimizer == "sgd":
        return optax.sgd(learning_rate=sched)
    raise ValueError(f"unknown optimizer: {cfg.optimizer!r}")


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def create_train_state(
    model: SegVAE, cfg: ExperimentConfig, rng: jax.Array, tx: optax.GradientTransformation
) -> TrainState:
    h, w, c = cfg.image_size
    x = jnp.zeros((2, h, w, c), jnp.float32)
    s_oh = jnp.zeros((2, h, w, cfg.nlabels), jnp.float32)
    variables = model.init({"params": rng}, x, s_oh, rng, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


AugmentFn = Callable[[jax.Array, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]


def make_train_step(
    model: SegVAE,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    augment_fn: Optional[AugmentFn] = None,
    use_fused_ce: Optional[bool] = None,
    donate: bool = True,
    mesh=None,
    fuse_aug: bool = True,
    fold_by_step: bool = False,
):
    """Build the jitted train step: aug + fwd + bwd + optimiser + BN stats in
    ONE XLA program.

    use_fused_ce=None (auto) enables the Pallas fused multi-scale CE kernel
    on TPU and keeps the plain-XLA path elsewhere (the kernel's CPU fallback
    is interpreter-mode, fine for tests but slow). Under a mesh, pass the
    mesh so the kernel runs shard_map-wrapped on each device's batch shard.

    fuse_aug: compile augmentation into the train step. With the original
    gather-based warp this degraded the step ~15 ms (the gather lowered
    pathologically inside the big program); with the MXU matmul warp
    (data/augment_device.py:_bilinear_warp) fusing is strictly better -- it
    removes one program dispatch, the host-side rng split dispatch and the
    cross-program int32 label relayout copies per step. fuse_aug=False keeps
    the two-program structure for A/B measurement.

    fold_by_step: derive the per-step key inside the program as
    fold_in(rng, state.step). The caller then passes the SAME base key every
    step, eliminating the per-step host-side fold_in dispatch; resumes stay
    deterministic because state.step is part of the checkpointed state.
    """
    if use_fused_ce is None:
        use_fused_ce = jax.default_backend() == "tpu"
    if fold_by_step and augment_fn is not None and not fuse_aug:
        # The two-program path splits aug_rng from the UNfolded base key on
        # the host while fold_in(rng, state.step) happens inside the jitted
        # step -- the aug key would silently be constant across steps.
        raise ValueError(
            "fold_by_step=True requires fuse_aug=True when an augment_fn is "
            "given (host-side aug would receive a constant key every step)"
        )

    def loss_fn(params, batch_stats, x, s_oh, rng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, s_oh, rng, train=True, mutable=["batch_stats"],
        )
        loss, loss_dict = phiseg_objective(
            outputs, s_oh, cfg, params=params, use_fused_ce=use_fused_ce,
            mesh=mesh,
        )
        return loss, (mutated.get("batch_stats", {}), loss_dict)

    def step_fn(state: TrainState, x: jax.Array, s: jax.Array, rng: jax.Array):
        if fold_by_step:
            rng = jax.random.fold_in(rng, state.step)
        if augment_fn is not None and fuse_aug:
            rng, aug_rng = jax.random.split(rng)
            x, s = augment_fn(x, s, aug_rng)
        s_oh = one_hot(s, cfg.nlabels)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, loss_dict)), grads = grad_fn(
            state.params, state.batch_stats, x, s_oh, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        return new_state, loss_dict

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    if augment_fn is None or fuse_aug:
        return jitted

    # two-program legacy path: augmentation as its own jitted program
    aug_jit = jax.jit(augment_fn)

    def step_with_aug(state, x, s, rng):
        rng, aug_rng = jax.random.split(rng)
        x, s = aug_jit(x, s, aug_rng)
        return jitted(state, x, s, rng)

    # expose the underlying jitted step for AOT lowering / cost analysis
    step_with_aug.jitted = jitted
    return step_with_aug


def make_eval_loss_fn(model: SegVAE, cfg: ExperimentConfig):
    """Batch losses in inference mode (ref _do_validation :537-549)."""

    @jax.jit
    def eval_loss(variables, x, s, rng):
        s_oh = one_hot(s, cfg.nlabels)
        outputs = model.apply(variables, x, s_oh, rng, train=False)
        _, loss_dict = phiseg_objective(outputs, s_oh, cfg, params=variables["params"])
        return loss_dict

    return eval_loss


def make_sample_fn(model: SegVAE, num_samples: int, return_probs: bool = True,
                   mesh=None):
    """N-sample prior inference: encode x ONCE, vmap the z-draw + decode tail.

    Replaces the reference's batch-tiling / sess.run loops
    (phiseg_model.py:337-353, :577-585, phiseg_test_quantitative.py:47-54).
    Returns (S, B, H, W, C) softmax probabilities (or logits). With a mesh,
    the sample axis is sharded across devices (encoder cache replicated).
    """
    key_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        key_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    @jax.jit
    def sample(variables, x, rng):
        cache = model.apply(variables, x, method="sample_cache")
        keys = jax.random.split(rng, num_samples)
        if key_sharding is not None:
            keys = jax.lax.with_sharding_constraint(keys, key_sharding)

        def draw(k):
            logits = aggregate_levels(
                model.apply(variables, cache, k, method="decode_sample")
            )
            return jax.nn.softmax(logits, axis=-1) if return_probs else logits

        return jax.vmap(draw)(keys)

    return sample


def make_sample_levels_fn(model: SegVAE, num_samples: int):
    """Like make_sample_fn but returns the per-level logits tuple
    (ref predict_segmentation_sample_levels :367-375)."""

    @jax.jit
    def sample(variables, x, rng):
        cache = model.apply(variables, x, method="sample_cache")
        keys = jax.random.split(rng, num_samples)

        def draw(k):
            return model.apply(variables, cache, k, method="decode_sample")

        return jax.vmap(draw)(keys)

    return sample
