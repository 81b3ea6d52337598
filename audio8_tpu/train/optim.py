"""Optimizer + LR schedule stack.

Replaces the eight_mile ``OptimizerManager`` / ``create_lr_scheduler`` /
``CompositeLRScheduler`` surface (/root/reference/audio8/utils.py:5-15,
train.py:254-256) with optax:

- composite schedule: linear warmup -> optional plateau -> decay (cosine
  with floor ``alpha``, or the other eight_mile decay types);
- AdamW with torch hyperparameter defaults;
- gradient scaling by global example count + global-norm clipping happen in
  the train step (mirroring ``scale_grads(num_gpus/batch_size)`` + clip at
  train.py:323-325), not inside the optax chain, because the scale factor
  is data-dependent.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def create_lrs(
    lr: float,
    train_steps: int,
    sched_type: str = "cosine",
    alpha: float = 0.0,
    warmup_steps: int = 10_000,
    plateau_steps: int = 0,
    **kwargs,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Composite LR schedule matching ``create_lrs``
    (/root/reference/audio8/utils.py:11-15)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / max(warmup_steps, 1)
        t = jnp.maximum(step - warmup_steps - plateau_steps, 0.0)
        frac = jnp.minimum(t / max(train_steps, 1), 1.0)
        if sched_type == "cosine":
            decay = lr * ((1.0 - alpha) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac)) + alpha)
        elif sched_type == "linear":
            decay = lr * (1.0 - frac) * (1.0 - alpha) + lr * alpha
        elif sched_type in ("invtime", "inverse-time"):
            decay = lr / (1.0 + frac)
        elif sched_type == "exponential":
            # eight_mile exponential: lr * decay_rate^(t/decay_steps); use
            # alpha as the end-of-schedule fraction (default 0 -> 0.01 floor)
            rate = alpha if alpha > 0 else 0.01
            decay = lr * rate ** frac
        elif sched_type == "constant":
            decay = jnp.asarray(lr, jnp.float32)
        else:
            raise ValueError(f"Unknown lr scheduler {sched_type!r}")
        in_plateau = (step >= warmup_steps) & (step < warmup_steps + plateau_steps)
        out = jnp.where(step < warmup_steps, warm, jnp.where(in_plateau, lr, decay))
        return out

    return schedule


def create_optimizer(
    lr_schedule: Callable,
    optim: str = "adamw",
    weight_decay: float = 0.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW/Adam/SGD with an injected schedule (OptimizerManager equiv)."""
    if optim == "fused_adamw":
        from audio8_tpu.ops.pallas.adamw_kernel import FusedAdamW

        return FusedAdamW(lr_schedule, b1=beta1, b2=beta2, eps=eps,
                          weight_decay=weight_decay)
    if optim == "adamw":
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr_schedule, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay,
        )
    if optim == "adam":
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=lr_schedule, b1=beta1, b2=beta2, eps=eps)
    if optim == "sgd":
        return optax.inject_hyperparams(optax.sgd)(learning_rate=lr_schedule)
    raise ValueError(f"Unknown optimizer {optim!r}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Minimal train state pytree: params, optimizer state, step."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, step: int = 0):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.asarray(step, jnp.int32))

    def apply_gradients(self, grads, tx,
                        grad_scale=None, clip_norm: Optional[float] = None):
        """Scale grads (scale_grads equivalent), clip by global norm, step.

        ``tx`` may be an optax GradientTransformation or a ``FusedAdamW``
        (Pallas single-pass update; the scale/clip factor folds into the
        kernel instead of a separate pass over the gradients)."""
        from audio8_tpu.ops.pallas.adamw_kernel import FusedAdamW

        if isinstance(tx, FusedAdamW):
            scale = 1.0 if grad_scale is None else grad_scale
            gnorm = optax.global_norm(grads) * scale
            if clip_norm is not None:
                scale = scale * jnp.minimum(
                    1.0, clip_norm / jnp.maximum(gnorm, 1e-6))
            new_params, new_opt = tx.apply(grads, self.opt_state, self.params, scale)
            return (
                dataclasses.replace(self, params=new_params, opt_state=new_opt,
                                    step=self.step + 1),
                gnorm,
            )

        if grad_scale is not None:
            grads = jax.tree_util.tree_map(lambda g: g * grad_scale, grads)
        gnorm = optax.global_norm(grads)
        if clip_norm is not None:
            factor = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * factor, grads)
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return (
            dataclasses.replace(self, params=new_params, opt_state=new_opt,
                                step=self.step + 1),
            gnorm,
        )

    @property
    def current_lr(self):
        try:
            return self.opt_state.hyperparams["learning_rate"]
        except (AttributeError, KeyError, TypeError):
            return None
