"""Pallas TPU kernel: fused attention BLOCK (projections + core) for
short sequences.

The whole-row attention core kernel (attention_kernel.py) WINS the
isolated core comparison against XLA (9.9 vs 11.8 ms for the 12-layer
f+b chain) but LOSES end-to-end: XLA fuses its attention core into the
surrounding Q/K/V/O projections and residual chain, and the
pallas_call boundary forfeits that fusion (docs/PERF.md). This kernel
tested the obvious fix — move the FOUR projections inside the kernel
so the only seams left are elementwise LayerNorm/residual ops.

One grid step per (batch, head), heads innermost:

  fwd (per b, h):   q = x @ wq_h + bq_h        (T, dh)    [k, v same]
                    p = softmax_f32(q k^T * scale [+ key mask]); dropout
                    o_h = p @ v                 (T, dh)
                    out[b] (+)= o_h @ wo_h      (T, D) f32, += over h,
                                + bo at h == 0

  bwd (recompute; residuals = x, weights, seed):
                    re-derive q/k/v/p exactly as fwd
                    dxo = do @ wo_h^T;  dwo_h = o_h^T @ do
                    dv = p_d^T @ dxo;   dp = keep * (dxo @ v^T)
                    ds = p * (dp - rowsum(dp * p))
                    dq = ds @ k * scale; dk = ds^T @ q * scale
                    dx[b] (+)= dq wq_h^T + dk wk_h^T + dv wv_h^T  (+= over h)
                    dw{q,k,v}[b,h] = x^T @ d{q,k,v};  db{q,k,v}[b,h] = colsum

Weight/bias grads are written as per-(batch, head) PARTIALS and summed
outside the kernel: heads-innermost lets out/dx blocks accumulate over
consecutive grid steps, while dw blocks (indexed by head alone) would
revisit non-consecutively — partials sidestep that deterministically.

MEASURED VERDICT (docs/PERF.md, v5e): the per-head layout runs the
projections as twelve narrow (D, dh=64) GEMMs where XLA batches all
heads into one full-width (D, H*dh) GEMM — full pretrain step 63.1 vs
53.3 ms (18% SLOWER), identical loss. A second variant that gridded
over batch only and kept full-width projections resident in VMEM fixed
the narrow-GEMM problem in the forward but its backward cannot fit:
recomputed Q/K/V + per-head f32 score buffers + double-buffered
dQ/dK/dV windows + the resident weights total ~33 MB against the 16 MB
scoped-VMEM limit (compile-time OOM). Conclusion, third data point in
the series: on this workload XLA's fusion + layout choices win unless
the kernel brings an algorithm XLA lacks (CTC). Kept as a parity-tested
opt-in (``fused_attention="block"``) and a design-space record.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio8_tpu.ops.pallas.attention_kernel import _probs, _round_up


def _fwd_kernel(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, km_ref, o_ref,
                *, n_heads: int, t_real: int, scale: float, rate: float):
    h = pl.program_id(1)
    b = pl.program_id(0)
    x = x_ref[0]
    q = jnp.dot(x, wq_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bq_ref[0]
    k = jnp.dot(x, wk_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bk_ref[0]
    v = jnp.dot(x, wv_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bv_ref[0]
    km = None if km_ref is None else km_ref[0]
    g = b * n_heads + h
    _, pd, _ = _probs(q, k, km, seed_ref, g, t_real, scale, rate)
    o_h = jnp.dot(pd.astype(x.dtype), v,
                  preferred_element_type=jnp.float32).astype(x.dtype)
    partial = jnp.dot(o_h, wo_ref[0], preferred_element_type=jnp.float32)

    @pl.when(h == 0)
    def _init():
        o_ref[0] = partial + bo_ref[0].astype(jnp.float32)

    @pl.when(h != 0)
    def _acc():
        o_ref[0] += partial


def _bwd_kernel(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, wo_ref, bo_ref, km_ref, do_ref,
                dx_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                dwv_ref, dbv_ref, dwo_ref,
                *, n_heads: int, t_real: int, scale: float, rate: float):
    h = pl.program_id(1)
    b = pl.program_id(0)
    x = x_ref[0]
    q = jnp.dot(x, wq_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bq_ref[0]
    k = jnp.dot(x, wk_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bk_ref[0]
    v = jnp.dot(x, wv_ref[0], preferred_element_type=jnp.float32
                ).astype(x.dtype) + bv_ref[0]
    km = None if km_ref is None else km_ref[0]
    g = b * n_heads + h
    p, pd, keep = _probs(q, k, km, seed_ref, g, t_real, scale, rate)
    pd_bf = pd.astype(x.dtype)
    o_h = jnp.dot(pd_bf, v, preferred_element_type=jnp.float32
                  ).astype(x.dtype)

    do = do_ref[0]
    # through the output projection
    dxo = jax.lax.dot_general(do, wo_ref[0], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(x.dtype)                  # (T, dh)
    dwo_ref[0, 0] = jax.lax.dot_general(
        o_h, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (dh, D)

    # through the core (identical math to attention_kernel._bwd_kernel)
    dv = jax.lax.dot_general(pd_bf, dxo, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpd = jax.lax.dot_general(dxo, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dpd * (1.0 / (1.0 - rate)), 0.0)
    else:
        dp = dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_bf = ds.astype(x.dtype)
    dq = (jnp.dot(ds_bf, k, preferred_element_type=jnp.float32)
          * scale)                                                 # (T, dh)
    dk = (jax.lax.dot_general(ds_bf, q, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          * scale)

    dq_bf, dk_bf, dv_bf = (dq.astype(x.dtype), dk.astype(x.dtype),
                           dv.astype(x.dtype))
    # weight/bias grad partials for this (b, h)
    dwq_ref[0, 0] = jax.lax.dot_general(
        x, dq_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwk_ref[0, 0] = jax.lax.dot_general(
        x, dk_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwv_ref[0, 0] = jax.lax.dot_general(
        x, dv_bf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq_ref[0, 0] = jnp.sum(dq, axis=0, keepdims=True)
    dbk_ref[0, 0] = jnp.sum(dk, axis=0, keepdims=True)
    dbv_ref[0, 0] = jnp.sum(dv, axis=0, keepdims=True)

    # input grad accumulates over heads (innermost grid dim)
    dxp = (jax.lax.dot_general(dq_bf, wq_ref[0], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(dk_bf, wk_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
           + jax.lax.dot_general(dv_bf, wv_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))

    @pl.when(h == 0)
    def _init():
        dx_ref[0] = dxp

    @pl.when(h != 0)
    def _acc():
        dx_ref[0] += dxp


def _prep(x, key_valid):
    b, t, d = x.shape
    t_pad = _round_up(t, 128)
    xp = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    km = None
    if key_valid is not None:
        km = jnp.pad(key_valid.astype(jnp.int32), ((0, 0), (0, t_pad - t)))
        km = km.reshape(b, 1, t_pad)
    return xp, km, t_pad


def _specs(b, h, t_pad, d, dh, has_km):
    """in_specs for (x, per-head weight/bias slices, the (1, D) bo row,
    optional key-mask rows)."""
    x_spec = pl.BlockSpec((1, t_pad, d), lambda b_, h_, *_: (b_, 0, 0))
    w_spec = pl.BlockSpec((1, d, dh), lambda b_, h_, *_: (h_, 0, 0))
    bvec_spec = pl.BlockSpec((1, 1, dh), lambda b_, h_, *_: (h_, 0, 0))
    wo_spec = pl.BlockSpec((1, dh, d), lambda b_, h_, *_: (h_, 0, 0))
    bo_spec = pl.BlockSpec((1, d), lambda b_, h_, *_: (0, 0))
    specs = [x_spec, w_spec, bvec_spec, w_spec, bvec_spec, w_spec,
             bvec_spec, wo_spec, bo_spec]
    if has_km:
        specs.append(
            pl.BlockSpec((1, 1, t_pad), lambda b_, h_, *_: (b_, 0, 0)))
    return specs


def _wrap(kernel, has_km, **kw):
    def wrapped(seed_ref, *refs):
        (x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
         bo_ref) = refs[:9]
        if has_km:
            km_ref = refs[9]
            outs = refs[10:]
        else:
            km_ref = None
            outs = refs[9:]
        kernel(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
               bv_ref, wo_ref, bo_ref, km_ref, *outs, **kw)
    return wrapped


def _weights(wq, bq, wk, bk, wv, bv, wo, bo, h, dh, d):
    """(D, H*dh)/(H*dh,) params -> head-major arrays the BlockSpecs index."""
    r3 = lambda w: w.reshape(d, h, dh).transpose(1, 0, 2)   # (H, D, dh)
    rb = lambda v: v.reshape(h, 1, dh)                       # (H, 1, dh)
    wo_h = wo.reshape(h, dh, d)                              # (H, dh, D)
    return (r3(wq), rb(bq), r3(wk), rb(bk), r3(wv), rb(bv), wo_h,
            bo.reshape(1, d))


def make_attention_block(n_heads: int):
    """Head-count-specialized fused block with a custom VJP."""
    @functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
    def block(x, wq, bq, wk, bk, wv, bv, wo, bo, key_valid,
              scale: float, rate: float, seed=None):
        out, _ = fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, key_valid,
                     scale, rate, seed)
        return out

    def fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, key_valid, scale, rate,
            seed):
        b, t, d = x.shape
        dh = wq.shape[-1] // n_heads
        xp, km, t_pad = _prep(x, key_valid)
        seed_a = (jnp.zeros((1,), jnp.uint32) if seed is None
                  else seed.reshape((1,)).astype(jnp.uint32))
        weights = _weights(wq, bq, wk, bk, wv, bv, wo, bo, n_heads, dh, d)
        args = [xp, *weights]
        if km is not None:
            args.append(km)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_heads),
            in_specs=_specs(b, n_heads, t_pad, d, dh, km is not None),
            out_specs=[pl.BlockSpec((1, t_pad, d),
                                    lambda b_, h_, *_: (b_, 0, 0))],
        )
        (o,) = pl.pallas_call(
            _wrap(_fwd_kernel, km is not None, n_heads=n_heads, t_real=t,
                  scale=scale, rate=rate),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32)],
            interpret=jax.default_backend() != "tpu",
        )(seed_a, *args)
        out = o[:, :t, :].astype(x.dtype)
        return out, (x, wq, bq, wk, bk, wv, bv, wo, bo, key_valid, seed_a)

    def bwd(scale, rate, res, dout):
        x, wq, bq, wk, bk, wv, bv, wo, bo, key_valid, seed_a = res
        b, t, d = x.shape
        dh = wq.shape[-1] // n_heads
        xp, km, t_pad = _prep(x, key_valid)
        dop = jnp.pad(dout.astype(x.dtype), ((0, 0), (0, t_pad - t), (0, 0)))
        weights = _weights(wq, bq, wk, bk, wv, bv, wo, bo, n_heads, dh, d)

        x_spec = pl.BlockSpec((1, t_pad, d), lambda b_, h_, *_: (b_, 0, 0))
        w_par = pl.BlockSpec((1, 1, d, dh), lambda b_, h_, *_: (b_, h_, 0, 0))
        b_par = pl.BlockSpec((1, 1, 1, dh), lambda b_, h_, *_: (b_, h_, 0, 0))
        wo_par = pl.BlockSpec((1, 1, dh, d), lambda b_, h_, *_: (b_, h_, 0, 0))
        out_specs = [x_spec, w_par, b_par, w_par, b_par, w_par, b_par,
                     wo_par]
        out_shapes = [
            jax.ShapeDtypeStruct((b, t_pad, d), jnp.float32),        # dx
            jax.ShapeDtypeStruct((b, n_heads, d, dh), jnp.float32),  # dwq
            jax.ShapeDtypeStruct((b, n_heads, 1, dh), jnp.float32),  # dbq
            jax.ShapeDtypeStruct((b, n_heads, d, dh), jnp.float32),  # dwk
            jax.ShapeDtypeStruct((b, n_heads, 1, dh), jnp.float32),  # dbk
            jax.ShapeDtypeStruct((b, n_heads, d, dh), jnp.float32),  # dwv
            jax.ShapeDtypeStruct((b, n_heads, 1, dh), jnp.float32),  # dbv
            jax.ShapeDtypeStruct((b, n_heads, dh, d), jnp.float32),  # dwo
        ]

        has_km = km is not None
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_heads),
            in_specs=_specs(b, n_heads, t_pad, d, dh, has_km) + [x_spec],
            out_specs=out_specs,
        )
        args = [xp, *weights]
        if has_km:
            args.append(km)
        args.append(dop)

        def wrapped(seed_ref, *refs):
            n_in = 11 if has_km else 10
            (x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
             wo_ref, bo_ref) = refs[:9]
            km_ref = refs[9] if has_km else None
            do_ref = refs[n_in - 1]
            outs = refs[n_in:]
            _bwd_kernel(seed_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                        wv_ref, bv_ref, wo_ref, bo_ref, km_ref, do_ref,
                        *outs, n_heads=n_heads, t_real=t, scale=scale,
                        rate=rate)

        outs = pl.pallas_call(
            wrapped,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=jax.default_backend() != "tpu",
        )(seed_a, *args)
        dxp, dwq_p, dbq_p, dwk_p, dbk_p, dwv_p, dbv_p, dwo_p = outs

        dx = dxp[:, :t, :].astype(x.dtype)

        def wsum(p):   # (B, H, D, dh) -> (D, H*dh)
            s = jnp.sum(p, axis=0)                     # (H, D, dh)
            return s.transpose(1, 0, 2).reshape(d, n_heads * dh)

        def bsum(p):   # (B, H, 1, dh) -> (H*dh,)
            return jnp.sum(p, axis=(0, 2)).reshape(n_heads * dh)

        dwq = wsum(dwq_p).astype(wq.dtype)
        dwk = wsum(dwk_p).astype(wk.dtype)
        dwv = wsum(dwv_p).astype(wv.dtype)
        dbq = bsum(dbq_p).astype(bq.dtype)
        dbk = bsum(dbk_p).astype(bk.dtype)
        dbv = bsum(dbv_p).astype(bv.dtype)
        dwo = jnp.sum(dwo_p, axis=0).reshape(n_heads * dh, d).astype(wo.dtype)
        dbo = jnp.sum(dout.astype(jnp.float32), axis=(0, 1)).astype(bo.dtype)
        return (dx, dwq, dbq, dwk, dbk, dwv, dbv, dwo, dbo, None, None)

    block.defvjp(fwd, bwd)
    return block


_BLOCK_CACHE = {}


def attention_block_nheads(n_heads: int):
    if n_heads not in _BLOCK_CACHE:
        _BLOCK_CACHE[n_heads] = make_attention_block(n_heads)
    return _BLOCK_CACHE[n_heads]
