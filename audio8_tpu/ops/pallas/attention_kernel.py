"""Pallas TPU kernel: fused attention for SHORT sequences (whole-row).

The wav2vec2 pretrain/fine-tune regime is T' <= ~1700 frames with
d_head=64. There XLA's attention runs at ~11% of MXU peak (the batched
(T, 64) matmuls are tiny and every softmax/dropout pass round-trips the
(B, H, T, T) tensor through HBM), and the stock streaming flash-attention
kernel is 4x WORSE still — its block-q/block-k grid is built for T in the
tens of thousands and drowns in per-block overhead at T=546
(tools/exp_attn_core.py: XLA 11.8 ms, flash 48.3 ms for 12 cores f+b).

This kernel takes the opposite layout: ONE grid step per (batch, head),
with the full (T, T) score matrix resident in VMEM:

  fwd:  s = (q @ k^T) * scale  [+ key-invalid mask]
        p = softmax_f32(s); p = hash_dropout(p)     (all in VMEM)
        o = p_bf16 @ v

  bwd (recompute, residuals = q, k, v, seed only):
        p  = recompute as in fwd
        dv = p_d^T @ do;  dp = mask/keep * (do @ v^T)
        ds = p * (dp - rowsum(dp * p))
        dq = ds @ k * scale;  dk = ds^T @ q * scale

Per grid step that is a handful of (T, T)x(T, 64) MXU matmuls with zero
HBM traffic for the score tensor; the (B, H, T, T) probs never exist in
HBM in either direction. Dropout uses the same integer-hash generator as
nn/dropout.py, seeded per (batch, head) so the VJP can regenerate the
mask bit-exactly.

STATUS: tested, opt-in (`fused_attention=True` on the attention modules),
and — like the conv and AdamW kernels — SLOWER than XLA end-to-end
despite winning the isolated core comparison (12-layer cores f+b: kernel
9.9 ms vs XLA 11.8 ms; full pretrain bench: 2.14x vs 2.22x). Inside the
model XLA fuses the attention core with the surrounding projections /
residual chain, and the pallas_call boundary forfeits that. Kept as a
measured ablation (docs/PERF.md) and the template for regimes where XLA's
attention does worse (e.g. much longer T with no streaming structure).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x, m):
    return (x + m - 1) // m * m


def _hash_keep(shape, seed, rate: float):
    """Same murmur-style hash as nn/dropout._hash_keep_mask, on a 2-D iota
    (TPU needs >=2D iota inside kernels). ``seed`` may be traced."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(shape[1]) + c) ^ seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return x >= threshold


def _probs(q, k, kmask_row, seed_ref, g, t_real: int, scale: float,
           rate: float):
    """(T_pad, dh) q/k -> dropped probabilities (T_pad, T_pad) f32 + keep
    mask; shared by fwd and bwd so the mask regenerates identically."""
    t_pad = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)
    valid = col < t_real
    if kmask_row is not None:
        valid = valid & (kmask_row > 0)
    s = jnp.where(valid, s, NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if rate > 0.0:
        keep = _hash_keep((t_pad, t_pad), seed_ref[0] + g.astype(jnp.uint32),
                          rate)
        pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        keep = None
        pd = p
    return p, pd, keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, o_ref,
                *, t_real: int, scale: float, rate: float):
    hs = q_ref.shape[0]  # heads per grid step (amortizes per-step overhead)
    g0 = pl.program_id(0) * hs
    for j in range(hs):
        km = None if km_ref is None else km_ref[j]  # (1, T_pad) row
        _, pd, _ = _probs(q_ref[j], k_ref[j], km, seed_ref, g0 + j, t_real,
                          scale, rate)
        o_ref[j] = jnp.dot(pd.astype(q_ref.dtype), v_ref[j],
                           preferred_element_type=jnp.float32
                           ).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, km_ref, do_ref,
                dq_ref, dk_ref, dv_ref,
                *, t_real: int, scale: float, rate: float):
    hs = q_ref.shape[0]
    g0 = pl.program_id(0) * hs
    for j in range(hs):
        km = None if km_ref is None else km_ref[j]  # (1, T_pad) row
        q, k, v, do = q_ref[j], k_ref[j], v_ref[j], do_ref[j]
        p, pd, keep = _probs(q, k, km, seed_ref, g0 + j, t_real, scale, rate)

        pd_bf = pd.astype(q.dtype)
        # dv = p_d^T @ do : contract over the query axis
        dv = jax.lax.dot_general(pd_bf, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dp_d = do @ v^T
        dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            dp = jnp.where(keep, dpd * (1.0 / (1.0 - rate)), 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_bf = ds.astype(q.dtype)
        dq = jnp.dot(ds_bf, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds_bf, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[j] = dq.astype(dq_ref.dtype)
        dk_ref[j] = dk.astype(dk_ref.dtype)
        dv_ref[j] = dv.astype(dv_ref.dtype)


def _prep(q, k, v, key_valid):
    """(B, H, T, dh) -> (B*H, T_pad, dh_pad) + per-(b,h) key mask rows."""
    b, h, t, dh = q.shape
    t_pad = _round_up(t, 128)
    # dh stays unpadded: a block whose last dim equals the full array dim is
    # Mosaic-legal, and padding 64 -> 128 would double the kernel's HBM
    # traffic (measured: the padded variant loses its isolated-core win in
    # the full model, docs/PERF.md)
    dh_pad = dh

    def pad(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return x.reshape(b * h, t_pad, dh_pad)

    km = None
    if key_valid is not None:
        km = jnp.broadcast_to(key_valid[:, None, :], (b, h, t)).astype(jnp.int32)
        km = jnp.pad(km, ((0, 0), (0, 0), (0, t_pad - t)))
        # (BH, 1, T_pad): the middle singleton keeps the block shape legal
        # (second-to-last dim equals the array dim)
        km = km.reshape(b * h, 1, t_pad)
    return pad(q), pad(k), pad(v), km, t_pad, dh_pad


HEADS_PER_STEP = 2


def _call(kernel, n_out, qp, kp, vp, km, seed, t_pad, dh_pad, t_real, scale,
          rate, dtype, extra=()):
    bh = qp.shape[0]
    # one head per step for long T: the unrolled 2-head body keeps two
    # (T_pad, T_pad) f32 score/prob sets live, which busts VMEM past ~640
    hs = HEADS_PER_STEP if (bh % HEADS_PER_STEP == 0 and t_pad <= 640) else 1
    io_spec = pl.BlockSpec((hs, t_pad, dh_pad), lambda i, *_: (i, 0, 0))
    in_specs = [io_spec, io_spec, io_spec]
    args = [qp, kp, vp]
    if km is not None:
        in_specs.append(
            pl.BlockSpec((hs, 1, t_pad), lambda i, *_: (i, 0, 0)))
        args.append(km)
    else:
        in_specs.append(None)
        args.append(None)
    for e in extra:
        in_specs.append(io_spec)
        args.append(e)

    # None placeholders are not supported as operands; drop them and let the
    # kernel see km_ref=None via closure instead.
    has_km = km is not None
    real_specs = [s for s in in_specs if s is not None]
    real_args = [a for a in args if a is not None]

    def wrapped(seed_ref, *refs):
        if has_km:
            qr, kr, vr, kmr = refs[:4]
            rest = refs[4:]
        else:
            qr, kr, vr = refs[:3]
            kmr = None
            rest = refs[3:]
        kernel(seed_ref, qr, kr, vr, kmr, *rest,
               t_real=t_real, scale=scale, rate=rate)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // hs,),
        in_specs=real_specs,
        out_specs=[io_spec] * n_out,
    )
    out_shape = [jax.ShapeDtypeStruct((bh, t_pad, dh_pad), dtype)] * n_out
    return pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() != "tpu",
    )(seed, *real_args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def attention_core(q, k, v, key_valid, scale: float, rate: float,
                   seed=None):
    """Fused short-T attention: softmax((q k^T) * scale [+mask]) [dropout] v.

    q/k/v: (B, H, T, dh) in compute dtype; key_valid: optional (B, T) bool;
    rate: attention-prob dropout (0 = off); seed: uint32 scalar array
    (required when rate > 0). Returns (B, H, T, dh).
    """
    out, _ = _attn_fwd(q, k, v, key_valid, scale, rate, seed)
    return out


def _attn_fwd(q, k, v, key_valid, scale, rate, seed):
    b, h, t, dh = q.shape
    qp, kp, vp, km, t_pad, dh_pad = _prep(q, k, v, key_valid)
    if seed is None:
        seed = jnp.zeros((1,), jnp.uint32)
    else:
        seed = seed.reshape((1,)).astype(jnp.uint32)
    kern = functools.partial(_fwd_kernel)
    (o,) = _call(kern, 1, qp, kp, vp, km, seed, t_pad, dh_pad, t, scale,
                 rate, q.dtype)
    out = o.reshape(b, h, t_pad, dh_pad)[:, :, :t, :dh]
    return out, (q, k, v, key_valid, seed)


def _attn_bwd(scale, rate, res, dout):
    q, k, v, key_valid, seed = res
    b, h, t, dh = q.shape
    qp, kp, vp, km, t_pad, dh_pad = _prep(q, k, v, key_valid)
    dop = jnp.pad(dout, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
                  ).reshape(b * h, t_pad, dh_pad)
    kern = functools.partial(_bwd_kernel)
    dq, dk, dv = _call(kern, 3, qp, kp, vp, km, seed, t_pad, dh_pad, t,
                       scale, rate, q.dtype, extra=(dop,))

    def unpad(x):
        return x.reshape(b, h, t_pad, dh_pad)[:, :, :t, :dh]

    return unpad(dq), unpad(dk), unpad(dv), None, None


attention_core.defvjp(_attn_fwd, _attn_bwd)


def structural_ok(t_q: int, t_k: int, dh: int, rpr_k, cache) -> bool:
    """Shape/feature gate shared with MultiHeadAttention._fused_eligible:
    square self-attention only (the kernel assumes T_q == T_k), no
    relative-position bias, no decode cache, and a T small enough that the
    (T_pad, T_pad) f32 score tile fits VMEM (T_pad^2 * 8B <= ~8 MB)."""
    if rpr_k is not None or cache is not None:
        return False
    return t_q == t_k and t_q <= 1024 and dh <= 128


def supported(t: int, dh: int, rpr_k, cache) -> bool:
    """structural_ok + the TPU backend requirement."""
    if jax.default_backend() != "tpu":
        return False
    return structural_ok(t, t, dh, rpr_k, cache)
