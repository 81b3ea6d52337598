"""Pallas TPU kernel: fused AdamW update.

XLA compiles the optax AdamW update into several elementwise passes over
the 95M-param tree (~12 ms measured on v5e — ~27% of HBM peak for the
minimal 7-array traffic). This kernel performs the whole update (moment
updates, bias correction, weight decay, parameter step, with the global
grad-scale/clip factor folded in) in ONE pass per leaf, aliasing the
moment/param buffers in place.

Mirrors optax.adamw semantics exactly (verified against optax in tests);
``TrainState.apply_gradients`` dispatches on the ``FusedAdamW`` type.

Measured on v5e (95M params): optax-with-donation runs the standalone
update in 6.5 ms vs 10 ms for this kernel (~200 per-leaf launches eat the
single-pass savings), and inside the fused train step the kernels also
break XLA's update/backward overlap (70.1 vs 68.7 ms). XLA's elementwise
fusion is simply the right tool here; the kernel is kept as a tested
option (``create_optimizer(optim='fused_adamw')``) and as the pattern for
true in-place multi-buffer Pallas updates.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _adamw_kernel(s_ref, g_ref, m_ref, v_ref, p_ref, m_out, v_out, p_out):
    # scalars: [lr, b1, b2, eps, wd, gscale, 1/(1-b1^t), 1/(1-b2^t)]
    lr = s_ref[0]
    b1 = s_ref[1]
    b2 = s_ref[2]
    eps = s_ref[3]
    wd = s_ref[4]
    gscale = s_ref[5]
    inv_bc1 = s_ref[6]
    inv_bc2 = s_ref[7]
    g = g_ref[:, :].astype(jnp.float32) * gscale
    m = b1 * m_ref[:, :] + (1.0 - b1) * g
    v = b2 * v_ref[:, :] + (1.0 - b2) * g * g
    p = p_ref[:, :]
    update = (m * inv_bc1) / (jnp.sqrt(v * inv_bc2) + eps) + wd * p
    m_out[:, :] = m
    v_out[:, :] = v
    p_out[:, :] = p - lr * update


def _leaf_update(g, m, v, p, scalars):
    """Run the kernel on one leaf (any shape), tiling rows like the dropout
    kernel; moment/param buffers are donated (aliased) in place."""
    shape = p.shape
    n0 = 1
    for d in shape:
        n0 *= int(d)
    c = 512 if n0 % 512 == 0 else (128 if n0 % 128 == 0 else 1)
    flat = (n0 // c, c)

    def prep(x):
        return x.reshape(flat)

    g2, m2, v2, p2 = prep(g), prep(m), prep(v), prep(p)
    n = flat[0]
    # row blocks: multiple of 8 (or the whole array). 7 live buffers
    # (4 in + 3 out) x double buffering must fit VMEM: cap each at ~256KB.
    cap = max((256 * 1024) // (c * 4) // 8 * 8, 8)
    rows = min(n, cap)
    if n % rows:
        rows = n  # odd-sized leaf: single block (ok, small leaves only)
    grid = (n // rows,)
    interpret = jax.default_backend() != "tpu"
    m3, v3, p3 = pl.pallas_call(
        _adamw_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec((rows, c), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec((rows, c), lambda i, s: (i, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((rows, c), lambda i, s: (i, 0),
                                    memory_space=pltpu.VMEM)] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct(flat, jnp.float32)] * 3,
        # alias m, v, p inputs (positions 1..3 after scalar prefetch) onto
        # the three outputs: true in-place update
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, g2, m2, v2, p2)
    return m3.reshape(shape), v3.reshape(shape), p3.reshape(shape)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


class FusedAdamW:
    """AdamW with the fused Pallas update. Interface intentionally small:
    ``init(params)`` and ``apply(grads, state, params, grad_scale)``;
    ``lr_schedule`` is evaluated from ``state.count``."""

    def __init__(self, lr_schedule: Callable, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8, weight_decay: float = 0.0):
        self.lr_schedule = lr_schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay

    def init(self, params) -> FusedAdamWState:
        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        return FusedAdamWState(count=jnp.zeros((), jnp.int32), mu=zeros,
                               nu=jax.tree_util.tree_map(jnp.copy, zeros))

    def apply(self, grads, state: FusedAdamWState, params, grad_scale):
        """grad_scale: combined 1/examples * clip factor (traced scalar)."""
        count = state.count + 1
        t = count.astype(jnp.float32)
        # optax convention: schedule evaluated at the PRE-increment count,
        # bias correction at the post-increment count
        lr = jnp.asarray(self.lr_schedule(state.count), jnp.float32)
        inv_bc1 = 1.0 / (1.0 - self.b1 ** t)
        inv_bc2 = 1.0 / (1.0 - self.b2 ** t)
        scalars = jnp.stack([
            lr, jnp.float32(self.b1), jnp.float32(self.b2),
            jnp.float32(self.eps), jnp.float32(self.weight_decay),
            jnp.asarray(grad_scale, jnp.float32), inv_bc1, inv_bc2])

        leaves_g, treedef = jax.tree_util.tree_flatten(grads)
        leaves_m = treedef.flatten_up_to(state.mu)
        leaves_v = treedef.flatten_up_to(state.nu)
        leaves_p = treedef.flatten_up_to(params)
        new_m, new_v, new_p = [], [], []
        for g, m, v, p in zip(leaves_g, leaves_m, leaves_v, leaves_p):
            m2, v2, p2 = _leaf_update(g, m, v, p.astype(jnp.float32), scalars)
            new_m.append(m2)
            new_v.append(v2)
            new_p.append(p2.astype(p.dtype))
        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            FusedAdamWState(count=count,
                            mu=jax.tree_util.tree_unflatten(treedef, new_m),
                            nu=jax.tree_util.tree_unflatten(treedef, new_v)),
        )
