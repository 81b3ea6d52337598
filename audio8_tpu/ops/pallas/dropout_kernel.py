"""Pallas TPU kernel: fused dropout with the hardware PRNG.

Dropout over the transformer's big activations (notably the (B, H, T, T)
attention probabilities) is ~30% of the wav2vec2 pretrain step when masks
come from XLA's threefry (measured on v5e: 95ms -> 65ms/step without
dropout). This kernel generates the keep-mask with the on-core PRNG
(``pltpu.prng_random_bits``) and fuses mask+scale in one pass; the custom
VJP regenerates the identical mask from the seed in the backward pass, so
nothing is stored.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_kernel(seed_ref, x_ref, out_ref, *, rate: float):
    # distinct stream per grid tile
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527))
    bits = pltpu.prng_random_bits(x_ref.shape)
    # keep with probability (1 - rate): uint32 threshold compare
    threshold = jnp.uint32(int(rate * 4294967296.0))
    keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    out_ref[:, :] = jnp.where(keep, x_ref[:, :] * scale, 0)


def _run(x2d, seed, rate):
    n0, c = x2d.shape
    # sublane alignment: pad rows to a multiple of 8, slice after
    n = (n0 + 7) // 8 * 8
    if n != n0:
        x2d = jnp.pad(x2d, ((0, n - n0), (0, 0)))
    # row-block tiles capped at ~2MB, multiple of 8, dividing n
    bytes_per_row = max(c * x2d.dtype.itemsize, 1)
    cap = max((2 * 1024 * 1024) // bytes_per_row // 8 * 8, 8)
    rows = min(n, cap)
    while n % rows:
        rows -= 8
    grid = (n // rows,)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            # with scalar prefetch the index maps receive (i, seed_ref)
            in_specs=[pl.BlockSpec((rows, c), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, c), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=interpret,
    )(seed, x2d)
    return out[:n0] if n != n0 else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout_p(x2d, seed, rate):
    return _run(x2d, seed, rate)


def _dropout_fwd(x2d, seed, rate):
    return _run(x2d, seed, rate), seed


def _dropout_bwd(rate, seed, g):
    # identical mask regenerated from the seed
    return _run(g, seed, rate), None


_dropout_p.defvjp(_dropout_fwd, _dropout_bwd)


def fast_dropout(x: jnp.ndarray, rate: float, key: jax.Array) -> jnp.ndarray:
    """Dropout with TPU hardware PRNG; TPU-only (pltpu.prng_seed has no
    CPU interpret lowering — callers gate on the backend, see nn.Dropout);
    gradient regenerates the mask — zero residual memory."""
    if rate <= 0.0:
        return x
    seed = jax.random.randint(key, (1,), -(2 ** 31), 2 ** 31 - 1, jnp.int32)
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    return _dropout_p(x2d, seed, float(rate)).reshape(shape)
