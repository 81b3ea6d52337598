"""Pallas TPU kernels: strided 1-D convolution (k=3, stride=2, VALID).

The wav2vec2 feature extractor's FLOPs live in four (512 -> 512, k=3, s=2)
layers (/root/reference/audio8/wav2vec2.py:399-456; config.py CONV_FEATURES).

STATUS: tested, opt-in, and SLOWER than XLA. Measured with transfer-clean
timing (tools/exp_conv_kernel.py), XLA's conv lowering runs the 4-layer
chain at 3.4 ms fwd / 5.4 ms fwd+dgrad (~62% MXU) while this kernel takes
8.0 / 13.5 ms: the manual DMA + per-tile grid overhead loses to XLA's
fused pipeline. Kept like the fused-AdamW kernel — a documented ablation
(docs/PERF.md) and a template for shapes XLA handles worse; enable via
``Conv1D(use_pallas=True)``.

Design — stride-2 phase decomposition with a *paired* layout:

    y[t] = x[2t] @ W0 + x[2t+1] @ W1 + x[2t+2] @ W2

The wrapper reshapes x to x2 = (B, T/2, 2C) where row t = [x[2t] | x[2t+1]]
(one XLA copy, small vs the kernel's win). Inside the kernel the even/odd
phases are then *lane* slices x2[:, :C] / x2[:, C:] — vreg subsets, no
sublane interleave — and the three (TT, C) @ (C, C) MXU matmuls read them
directly. Tiles overlap by one paired row (the x[2t+2] term), which
BlockSpec partitioning can't express, so x2 tiles stream HBM->VMEM with
double-buffered manual DMA (prefetch the next tile while computing).

Backward follows the same scheme:

    dx[2t]   = dy[t] @ W0^T + dy[t-1] @ W2^T    (dgrad kernel; emits the
    dx[2t+1] = dy[t] @ W1^T                      paired (TT, 2C) layout,
                                                 un-paired by the wrapper)
    dW_j     = sum_t x[2t+j]^T dy[t]            (wgrad kernel, f32 accum
                                                 in the revisited output)

`conv1d_k3s2` wires the kernels into a jax.custom_vjp; Conv1D dispatches
here on TPU for matching shapes (nn/layers.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pick_tile(t_out: int) -> int:
    """Output rows per grid step. 512 amortizes DMA + grid overhead while
    keeping tiles + weights + accumulators well under VMEM."""
    for tt in (512, 256, 128):
        if t_out >= tt:
            return tt
    return _round_up(max(t_out, 8), 8)


def _pair(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(B, T, C) -> (B, rows, 2C) with row t = [x[2t] | x[2t+1]],
    zero-padding x up to 2*rows rows first."""
    b, t, c = x.shape
    if 2 * rows > t:
        x = jnp.pad(x, ((0, 0), (0, 2 * rows - t), (0, 0)))
    else:
        x = x[:, : 2 * rows]
    return x.reshape(b, rows, 2 * c)


def _double_buffered(hbm_ref, bufs, sems, n_t, body):
    """Run ``body(tile_ref)`` per grid step with next-tile DMA prefetch.

    ``hbm_ref`` is a (B, T2, C2) array in ANY/HBM space; the tile for grid
    step (bi, t) is rows [t*TT, t*TT + TT + 8). ``bufs``/``sems`` are
    double-buffer scratch (2, TT+8, C2) and DMA semaphores (2,).
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    tt_rows = bufs.shape[1]  # TT + 8
    tt = tt_rows - 8

    def dma(slot, b_idx, t_idx):
        return pltpu.make_async_copy(
            hbm_ref.at[b_idx, pl.ds(t_idx * tt, tt_rows), :],
            bufs.at[slot], sems.at[slot])

    g = bi * n_t + t
    slot = jax.lax.rem(g, 2)

    @pl.when(g == 0)
    def _():
        dma(slot, bi, t).start()

    nxt_b = jnp.where(t + 1 < n_t, bi, bi + 1)
    nxt_t = jnp.where(t + 1 < n_t, t + 1, 0)

    @pl.when(g + 1 < pl.num_programs(0) * n_t)
    def _():
        dma(1 - slot, nxt_b, nxt_t).start()

    dma(slot, bi, t).wait()
    body(bufs.at[slot])


# ------------------------------------------------------------------ forward


def _fwd_kernel(x2_hbm, w_ref, y_ref, bufs, sems):
    tt = y_ref.shape[1]
    c = w_ref.shape[1]

    def body(xref):
        x2 = xref[:]  # (TT+8, 2C)
        even = x2[:, :c]
        odd = x2[:, c:]
        acc = jnp.dot(even[:tt], w_ref[0], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(odd[:tt], w_ref[1],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(even[1:tt + 1], w_ref[2],
                            preferred_element_type=jnp.float32)
        y_ref[0] = acc.astype(y_ref.dtype)

    _double_buffered(x2_hbm, bufs, sems, pl.num_programs(1), body)


def _fwd_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, t_in, c_in = x.shape
    c_out = w.shape[-1]
    t_out = (t_in - 3) // 2 + 1
    tt = _pick_tile(t_out)
    n_t = -(-t_out // tt)
    x2 = _pair(x, n_t * tt + 8)  # (B, n_t*TT+8, 2C)

    y = pl.pallas_call(
        _fwd_kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, c_in, c_out), lambda bi, ti: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tt, c_out), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * tt, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 8, 2 * c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, w)
    return y[:, :t_out, :]


# -------------------------------------------------------- backward: dgrad


def _dgrad_kernel(dy_hbm, wt_ref, dx2_ref, bufs, sems):
    """dy_hbm is front-padded by one zero row; tile rows [t*TT, t*TT+TT]
    are dy[t*TT - 1 .. t*TT + TT - 1]. Emits dx in paired (TT, 2C) rows."""
    tt = dx2_ref.shape[1]

    def body(dyref):
        dyx = dyref[:]  # (TT+8, C_out); rows [0, TT] are used
        a = jnp.dot(dyx[1:tt + 1], wt_ref[0],
                    preferred_element_type=jnp.float32)
        bm = jnp.dot(dyx[1:tt + 1], wt_ref[1],
                     preferred_element_type=jnp.float32)
        cm = jnp.dot(dyx[:tt], wt_ref[2], preferred_element_type=jnp.float32)
        out = jnp.concatenate([a + cm, bm], axis=-1)  # (TT, 2*C_in) paired
        dx2_ref[0] = out.astype(dx2_ref.dtype)

    _double_buffered(dy_hbm, bufs, sems, pl.num_programs(1), body)


def _dgrad_pallas(dy: jnp.ndarray, w: jnp.ndarray, t_in: int) -> jnp.ndarray:
    b, t_out, c_out = dy.shape
    c_in = w.shape[1]
    tt = _pick_tile(t_out)
    n_t = -(-t_out // tt)
    # front-pad one zero row (the dy[t-1] term at t=0) + tail so every
    # (TT+8)-row DMA slice stays in bounds
    dy_p = jnp.pad(dy, ((0, 0), (1, n_t * tt - t_out + 7), (0, 0)))
    wt = jnp.transpose(w, (0, 2, 1))  # (3, C_out, C_in)

    dx2 = pl.pallas_call(
        _dgrad_kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, c_out, c_in), lambda bi, ti: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tt, 2 * c_in), lambda bi, ti: (bi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_t * tt, 2 * c_in), dy.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 8, c_out), dy.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(dy_p, wt)

    # un-pair to (B, 2*n_t*TT, C); rows [0, 2*t_out) are the kernel's
    dx = dx2.reshape(b, 2 * n_t * tt, c_in)[:, : 2 * t_out, :]
    # row 2*t_out (when it exists) is dy[-1] @ W2^T; rows past that see no
    # conv window -> zero grad
    tail = t_in - 2 * t_out
    if tail > 0:
        last = jnp.einsum(
            "bc,cd->bd", dy[:, -1, :], wt[2],
            preferred_element_type=jnp.float32).astype(dy.dtype)
        pads = [last[:, None, :]]
        if tail > 1:
            pads.append(jnp.zeros((b, tail - 1, c_in), dy.dtype))
        dx = jnp.concatenate([dx] + pads, axis=1)
    return dx


# -------------------------------------------------------- backward: wgrad


def _wgrad_kernel(x2_hbm, dy_ref, dw_ref, bufs, sems):
    tt = dy_ref.shape[1]
    c = dw_ref.shape[1]
    bi = pl.program_id(0)
    t = pl.program_id(1)

    def body(xref):
        x2 = xref[:]  # (TT+8, 2C)
        even = x2[:, :c]
        odd = x2[:, c:]
        dyt = dy_ref[0]  # (TT, C_out)
        contract = (((0,), (0,)), ((), ()))  # (TT, C).T @ (TT, C_out)
        dw0 = jax.lax.dot_general(even[:tt], dyt, contract,
                                  preferred_element_type=jnp.float32)
        dw1 = jax.lax.dot_general(odd[:tt], dyt, contract,
                                  preferred_element_type=jnp.float32)
        dw2 = jax.lax.dot_general(even[1:tt + 1], dyt, contract,
                                  preferred_element_type=jnp.float32)
        upd = jnp.stack([dw0, dw1, dw2])

        @pl.when((bi == 0) & (t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        dw_ref[...] += upd

    _double_buffered(x2_hbm, bufs, sems, pl.num_programs(1), body)


def _wgrad_pallas(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    b, t_in, c_in = x.shape
    _, t_out, c_out = dy.shape
    tt = _pick_tile(t_out)
    n_t = -(-t_out // tt)
    x2 = _pair(x, n_t * tt + 8)
    dy_p = jnp.pad(dy, ((0, 0), (0, n_t * tt - t_out), (0, 0)))

    dw = pl.pallas_call(
        _wgrad_kernel,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, tt, c_out), lambda bi, ti: (bi, ti, 0)),
        ],
        out_specs=pl.BlockSpec((3, c_in, c_out), lambda bi, ti: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, c_in, c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tt + 8, 2 * c_in), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(x2, dy_p)
    return dw


# ------------------------------------------------------------- public VJP


@jax.custom_vjp
def conv1d_k3s2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C_in) x (3, C_in, C_out) -> (B, (T-3)//2+1, C_out), VALID.

    Semantics of ``lax.conv_general_dilated(..., strides=(2,), 'VALID')``
    with NWC/WIO layout; bf16-in/f32-accumulate like the XLA lowering.
    """
    return _fwd_pallas(x, w)


def _conv_fwd(x, w):
    return _fwd_pallas(x, w), (x, w)


def _conv_bwd(res, dy):
    x, w = res
    dx = _dgrad_pallas(dy, w, x.shape[1])
    dw = _wgrad_pallas(x, dy).astype(w.dtype)
    return dx, dw


conv1d_k3s2.defvjp(_conv_fwd, _conv_bwd)


def supported(x_shape, kernel_size: int, stride: int, padding, groups: int,
              dtype) -> bool:
    """True when conv1d_k3s2 applies: the wav2vec2 extractor's k=3/s=2
    layers with lane-aligned channels on the TPU backend."""
    if jax.default_backend() != "tpu":
        return False
    if kernel_size != 3 or stride != 2 or groups != 1:
        return False
    b, t, c = x_shape
    if padding not in ("VALID", ((0, 0),)):
        return False
    return c % 128 == 0 and t >= 3
