"""Pallas TPU kernel: fused CTC forward-backward (log-semiring).

The BASELINE.json north star calls for the reference's native CTC kernel
(torch F.ctc_loss, /root/reference/audio8/ctc.py:196-205) to become a
Pallas log-semiring kernel. Design:

- the emission matrix ``E[t,b,s] = log_probs[b,t,label_s]`` and the final
  scatter of state-gradients back onto the vocabulary are *gathers* — XLA
  does those well, so they stay outside the kernel;
- the kernel runs the sequential alpha/beta band recursions for ALL batch
  rows per time step: the state is one (B, S) tile, t-steps stream E rows
  HBM->VMEM with double-buffered async DMA, and the forward pass parks
  alpha history in the (T, B, S) dE output buffer (HBM) so the backward
  pass can fuse occupancy + gradient in one sweep, overwriting alpha_t
  with dE_t as it walks back;
- outputs: per-sample log-likelihood (B,) and dE (T, B, S) = d(-logp)/dE.

The public ``ctc_loss`` in audio8_tpu.ops.ctc dispatches here on TPU when
shapes fit; the lax.scan path remains the reference implementation and the
fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return (x + m - 1) // m * m


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe = m > NEG_INF / 2
    m_safe = jnp.where(safe, m, 0.0)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    out = m_safe + jnp.log(jnp.where(s > 0, s, 1.0))
    return jnp.where(safe, out, NEG_INF)


def _shift_right(x):
    """(B, S) -> shifted one lane right along S, first lane = NEG_INF."""
    return jnp.concatenate(
        [jnp.full((x.shape[0], 1), NEG_INF, x.dtype), x[:, :-1]], axis=1)


def _shift_left(x):
    return jnp.concatenate(
        [x[:, 1:], jnp.full((x.shape[0], 1), NEG_INF, x.dtype)], axis=1)


def _ctc_kernel(
    emit_hbm,        # (T, B, S) f32 in HBM: E[t,b,s]
    skip_ok_ref,     # (B, S) f32: 0 where skip into s allowed else NEG_INF
    input_len_ref,   # (B, 1) i32
    final_idx_ref,   # (B, S) f32: mask of the two final states
    ll_ref,          # out (B, 1) f32: log-likelihood per row
    de_hbm,          # out (T, B, S) f32 in HBM: dE (doubles as alpha park)
    ebuf, abuf, sem_in, sem_out,
):
    t_max = emit_hbm.shape[0]
    b, s = skip_ok_ref.shape
    skip_ok = skip_ok_ref[:, :]
    skip_legal = skip_ok > NEG_INF / 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    ilen = input_len_ref[:, :]  # (B, 1)

    def dma_in(slot, t):
        return pltpu.make_async_copy(emit_hbm.at[t], ebuf.at[slot], sem_in.at[slot])

    def dma_out(slot, t):
        return pltpu.make_async_copy(abuf.at[slot], de_hbm.at[t], sem_out.at[slot])

    # ---------------- forward: alpha ----------------
    dma_in(0, 0).start()

    def fwd_body(t, alpha):
        slot = t % 2

        @pl.when(t + 1 < t_max)
        def _():
            dma_in((t + 1) % 2, t + 1).start()

        dma_in(slot, t).wait()
        emit = ebuf[slot]

        a1 = _shift_right(alpha)
        a2 = jnp.where(skip_legal, _shift_right(a1), NEG_INF)
        new = _logaddexp3(alpha, a1, a2) + emit
        init = jnp.where(lane <= 1, emit, NEG_INF)
        new = jnp.where(t == 0, init, new)
        alpha = jnp.where(t < ilen, new, alpha)

        # park alpha_t in the dE output buffer; the out-DMA two steps back
        # used this same slot, so wait for it before overwriting abuf[slot]
        @pl.when(t >= 2)
        def _():
            dma_out(slot, t - 2).wait()
        abuf[slot] = alpha
        dma_out(slot, t).start()
        return alpha

    alpha_last = jax.lax.fori_loop(
        0, t_max, fwd_body, jnp.full((b, s), NEG_INF), unroll=False)
    dma_out((t_max - 1) % 2, t_max - 1).wait()

    @pl.when(t_max >= 2)
    def _():
        dma_out((t_max - 2) % 2, t_max - 2).wait()

    # log-likelihood: logsumexp of alpha over the two final states
    fin = jnp.where(final_idx_ref[:, :] > 0, alpha_last, NEG_INF)
    m = jnp.max(fin, axis=1, keepdims=True)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    ll = m_safe + jnp.log(
        jnp.maximum(jnp.sum(jnp.where(fin > NEG_INF / 2,
                                      jnp.exp(fin - m_safe), 0.0),
                            axis=1, keepdims=True), 1e-37))
    ll = jnp.where(m > NEG_INF / 2, ll, NEG_INF)
    ll_ref[:, :] = ll

    # ---------------- backward: beta + gradient ----------------
    # Recursion on beta_hat(t) = beta(t) + emit(t):
    #   beta_hat(t,s) = emit(t,s) + logsum(beta_hat(t+1, s),
    #                                      beta_hat(t+1, s+1),
    #                                      beta_hat(t+1, s+2) if legal(s+2))
    # alpha_t is read back from de_hbm (parked in fwd) and overwritten with
    # dE_t = -exp(alpha_t + beta_hat_t - emit_t - ll).
    def read_alpha(slot, t):
        return pltpu.make_async_copy(de_hbm.at[t], abuf.at[slot], sem_out.at[slot])

    dma_in((t_max - 1) % 2, t_max - 1).start()
    read_alpha((t_max - 1) % 2, t_max - 1).start()

    def bwd_body(i, beta):
        t = t_max - 1 - i
        slot = t % 2

        @pl.when(t >= 1)
        def _():
            dma_in((t - 1) % 2, t - 1).start()
            read_alpha((t - 1) % 2, t - 1).start()

        dma_in(slot, t).wait()
        read_alpha(slot, t).wait()
        emit = ebuf[slot]
        alpha_t = abuf[slot]

        b1 = _shift_left(beta)
        b2 = _shift_left(_shift_left(jnp.where(skip_legal, beta, NEG_INF)))
        new = _logaddexp3(beta, b1, b2) + emit
        beta_init = jnp.where(final_idx_ref[:, :] > 0, 0.0, NEG_INF) + emit
        new = jnp.where(t == ilen - 1, beta_init, new)
        beta = jnp.where(t < ilen, new, beta)

        gamma = alpha_t + beta - emit - ll
        de = -jnp.exp(jnp.minimum(gamma, 0.0))
        de = jnp.where((t < ilen) & (ll > NEG_INF / 2), de, 0.0)

        abuf[slot] = de
        out = pltpu.make_async_copy(abuf.at[slot], de_hbm.at[t], sem_in.at[slot])
        out.start()
        out.wait()
        return beta

    jax.lax.fori_loop(0, t_max, bwd_body, jnp.full((b, s), NEG_INF), unroll=False)


def _pad_to(x, size, axis, fill):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _prep(log_probs, input_lengths, targets, target_lengths, blank):
    b, t, v = log_probs.shape
    u = targets.shape[1]
    s = 2 * u + 1
    s_pad = _round_up(s, 128)
    b_pad = _round_up(b, 8)

    ext = jnp.full((b, s), blank, targets.dtype)
    ext = ext.at[:, 1::2].set(targets)
    ext_prev2 = jnp.concatenate(
        [jnp.full((b, 2), -1, ext.dtype), ext[:, :-2]], axis=1)
    allow_skip = (ext != blank) & (ext != ext_prev2)

    # E[t, b, s] — time-major so the kernel streams (B, S) tiles
    emit = jnp.take_along_axis(
        log_probs.astype(jnp.float32), ext[:, None, :], axis=2)  # (B, T, S)
    emit = emit.transpose(1, 0, 2)  # (T, B, S)

    lane = jnp.arange(s)[None, :]
    # states beyond S_b = 2U_b+1 are unreachable: kill their emissions
    valid_state = lane < (2 * target_lengths[:, None] + 1)
    emit = jnp.where(valid_state[None], emit, NEG_INF)

    skip_ok = jnp.where(allow_skip, 0.0, NEG_INF).astype(jnp.float32)
    final1 = lane == 2 * target_lengths[:, None]
    final2 = (lane == 2 * target_lengths[:, None] - 1) & (target_lengths[:, None] > 0)
    final_idx = (final1 | final2).astype(jnp.float32)

    emit = _pad_to(_pad_to(emit, s_pad, 2, NEG_INF), b_pad, 1, NEG_INF)
    skip_ok = _pad_to(_pad_to(skip_ok, s_pad, 1, NEG_INF), b_pad, 0, NEG_INF)
    final_idx = _pad_to(_pad_to(final_idx, s_pad, 1, 0.0), b_pad, 0, 0.0)
    ilen = _pad_to(input_lengths.astype(jnp.int32)[:, None], b_pad, 0, 0)
    return emit, skip_ok, ilen, final_idx, ext


def _ctc_fwd_impl(log_probs, input_lengths, targets, target_lengths, blank):
    b, t, v = log_probs.shape
    emit, skip_ok, ilen, final_idx, ext = _prep(
        log_probs, input_lengths, targets, target_lengths, blank)
    _, b_pad, s_pad = emit.shape

    interpret = jax.default_backend() != "tpu"
    ll, de = pl.pallas_call(
        _ctc_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # emit stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # dE in HBM
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, b_pad, s_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, b_pad, s_pad), jnp.float32),
            pltpu.VMEM((2, b_pad, s_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(emit, skip_ok, ilen, final_idx)

    loss = -ll[:b, 0]
    # zero_infinity semantics (ctc.py:187,204)
    loss = jnp.where(loss >= -NEG_INF / 2, 0.0, loss)
    return loss, (de, ext, b, t, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def ctc_loss_pallas(log_probs, input_lengths, targets, target_lengths, blank=0):
    """Per-sample CTC negative log-likelihood via the Pallas kernel.

    log_probs (B, T, V) float; targets (B, U) padded; returns (B,) losses.
    """
    loss, _ = _ctc_fwd_impl(log_probs, input_lengths, targets, target_lengths, blank)
    return loss


def _ctc_fwd(log_probs, input_lengths, targets, target_lengths, blank):
    return _ctc_fwd_impl(log_probs, input_lengths, targets, target_lengths, blank)


def _ctc_bwd(blank, res, g):
    de, ext, b, t, v = res
    s = ext.shape[1]
    de = de[:, :b, :s].transpose(1, 0, 2)  # (B, T, S)
    # scatter state-gradients onto the vocabulary with a one-hot matmul
    onehot = jax.nn.one_hot(ext, v, dtype=jnp.float32)  # (B, S, V)
    # full f32 precision: the default TPU bf16 matmul costs ~1e-3 in the
    # gradient, which is large relative to CTC occupancy values
    dlp = jnp.einsum("bts,bsv->btv", de, onehot,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    dlp = dlp * g[:, None, None]
    return dlp, None, None, None


ctc_loss_pallas.defvjp(_ctc_fwd, _ctc_bwd)
