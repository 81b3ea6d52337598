"""Transformer encoder/decoder stacks.

From-scratch replacements for the eight_mile ``TransformerEncoderStack`` /
``TransformerDecoderStack`` surface the reference builds on
(/root/reference/audio8/wav2vec2.py:613-622, text.py:201-210), designed for
XLA on TPU:

- static shapes end-to-end; padding handled by additive attention masks;
- post-norm (``pre_norm=False``) matches the fairseq wav2vec2-base layout the
  reference selects via ``layer_norms_after=True``;
- decoder supports an explicit KV cache for O(T) incremental decode (the
  reference re-runs the full prefix every step,
  /root/reference/audio8/wav2vec2.py:991-1006 — deliberately fixed here);
- optional Shaw-style relative position attention (``rpr_k``) used by the
  paired text encoder (/root/reference/audio8/text.py:122-134).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense, LayerNorm, gelu

Dtype = Any

NEG_INF = -1e9  # large-negative instead of -inf: keeps bf16/softmax NaN-free


def _activation(name: str):
    if name == "gelu":
        return gelu
    if name == "relu":
        return jax.nn.relu
    if name in ("swish", "silu"):
        return jax.nn.silu
    raise ValueError(f"Unknown activation {name!r}")


class KVCache:
    """Pytree holding per-layer decode state with a static max length."""

    @staticmethod
    def init(batch: int, num_layers: int, num_heads: int, max_len: int, d_head: int, dtype) -> dict:
        shape = (num_layers, batch, num_heads, max_len, d_head)
        return {
            "k": jnp.zeros(shape, dtype),
            "v": jnp.zeros(shape, dtype),
            "index": jnp.zeros((), jnp.int32),
        }


def relative_position_buckets(t_q: int, t_k: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """WavLM/T5 bidirectional relative-position bucketing (static shapes).

    Computed host-side with numpy at trace time — T is static under jit,
    so the (t_q, t_k) int32 bucket table is a compile-time constant and
    the only traced op downstream is the embedding gather. Semantics
    match HF ``WavLMAttention._relative_positions_bucket``: half the
    buckets for each sign, half of those exact, the rest log-spaced up
    to ``max_distance``.
    """
    rel = np.arange(t_k)[None, :] - np.arange(t_q)[:, None]
    half = num_buckets // 2
    out = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (half - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    out += np.where(is_small, rel, large)
    return out.astype(np.int32)


class RelativePositionBias(nn.Module):
    """Bucketed relative-position bias shared across a WavLM encoder
    stack (HF ``WavLMAttention.compute_bias``; the embedding lives in
    layer 0's attention in the torch tree — here it is a stack-level
    module so the (T, T) table is built once per forward)."""

    num_heads: int
    num_buckets: int = 320
    max_distance: int = 800
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.rel_attn_embed = nn.Embed(
            self.num_buckets, self.num_heads,
            dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, t_q: int, t_k: int) -> jnp.ndarray:
        buckets = relative_position_buckets(
            t_q, t_k, self.num_buckets, self.max_distance)
        bias = self.rel_attn_embed(jnp.asarray(buckets))  # (Tq, Tk, H)
        return bias.transpose(2, 0, 1)[None]  # (1, H, Tq, Tk)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with separate Q/K/V/O projections.

    Separate projections keep a 1:1 param mapping to fairseq checkpoints
    (w_Q/w_K/w_V/w_O naming mirrors the reference key maps at
    /root/reference/audio8/wav2vec2.py:40-47).
    """

    num_heads: int
    d_model: int
    d_k: Optional[int] = None  # total key/query dim; defaults to d_model
    scale: bool = True
    rpr_k: Optional[int] = None
    rpr_value_on: bool = False
    dropout_rate: float = 0.0  # applied to attention probabilities
    flash: bool = False  # use the Pallas flash-attention kernel on TPU
    # softmax over compute-dtype logits when dtype != f32 (+8% measured on
    # the wav2vec2-base pretrain step); False = always-f32 softmax
    bf16_softmax: bool = True
    # whole-row fused attention kernel (ops/pallas/attention_kernel.py):
    # opt-in (True). It beats XLA on the isolated attention core (9.9 vs
    # 11.8 ms, tools/exp_attn_core.py) but LOSES end-to-end — XLA fuses
    # the core with the surrounding projections/residual chain and the
    # pallas_call is an opaque boundary (2.14x vs 2.22x on the pretrain
    # bench; docs/PERF.md). Kept like the conv/AdamW kernels: a measured
    # ablation and the template for regimes XLA handles worse.
    fused_attention: Optional[bool] = None
    # WavLM gated relative position bias: per-layer gates (a small
    # per-head Dense over the attention *inputs* + a learned constant)
    # scale a shared bucketed position bias passed in as
    # ``position_bias`` (HF WavLMAttention steps 1-4)
    gated_rel_pos: bool = False
    # Self-attention Q/K/V as ONE (d_model, 3*d_qk) GEMM: the kernels/
    # biases of the three Dense submodules are concatenated at trace time
    # (param tree unchanged — checkpoint/fairseq parity intact, the
    # backward slices the packed dW). XLA does not merge independent
    # GEMMs itself; one wide matmul amortizes the MXU invocation and
    # reads the activations from HBM once instead of three times.
    packed_qkv: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        d_qk = self.d_k if self.d_k is not None else self.d_model
        assert d_qk % self.num_heads == 0
        self.d_head = d_qk // self.num_heads
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.w_Q = Dense(d_qk, **dd)
        self.w_K = Dense(d_qk, **dd)
        self.w_V = Dense(d_qk, **dd)
        self.w_O = Dense(self.d_model, **dd)
        if self.gated_rel_pos:
            self.gru_rel_pos_linear = Dense(8, **dd)
            self.gru_rel_pos_const = self.param(
                "gru_rel_pos_const", nn.initializers.ones,
                (1, self.num_heads, 1, 1), self.param_dtype)
        if self.rpr_k is not None:
            self.rpr_key_emb = nn.Embed(
                2 * self.rpr_k + 1, self.d_head, dtype=self.dtype, param_dtype=self.param_dtype
            )
            if self.rpr_value_on:
                self.rpr_value_emb = nn.Embed(
                    2 * self.rpr_k + 1, self.d_head, dtype=self.dtype, param_dtype=self.param_dtype
                )
        self.attn_dropout = Dropout(self.dropout_rate)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.d_head).transpose(0, 2, 1, 3)

    def _flash(self, q, k, v, mask):
        """Run the Pallas TPU flash-attention kernel on (B, H, T, dh) inputs.

        ``mask`` may be None (dense) or a boolean pad mask broadcastable to
        (B, 1, 1, T) — expressed to the kernel as segment ids so padded
        keys/queries only attend within the pad segment. T is padded up to
        a lane multiple for the kernel and sliced back after.
        """
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)

        b, h, t, dh = q.shape
        t_pad = (t + 127) // 128 * 128
        pad = t_pad - t

        if mask is not None:
            key_valid = jnp.broadcast_to(
                jnp.squeeze(mask, axis=(1, 2)) if mask.ndim == 4 else mask,
                (b, t))
            seg = jnp.where(key_valid, 1, 0).astype(jnp.int32)
        elif pad:
            seg = jnp.ones((b, t), jnp.int32)
        else:
            seg = None
        if pad:
            widths = ((0, 0), (0, 0), (0, pad), (0, 0))
            q = jnp.pad(q, widths)
            k = jnp.pad(k, widths)
            v = jnp.pad(v, widths)
            if seg is not None:
                seg = jnp.pad(seg, ((0, 0), (0, pad)))  # pads get segment 0
        segment_ids = None if seg is None else SegmentIds(q=seg, kv=seg)

        # largest power-of-two block that divides the padded length
        block = max(bs for bs in (512, 256, 128) if t_pad % bs == 0)
        sizes = BlockSizes(
            block_q=block, block_k_major=block, block_k=block, block_b=1,
            block_q_major_dkv=block, block_k_major_dkv=block,
            block_k_dkv=block, block_q_dkv=block,
            block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
        )
        out = flash_attention(
            q, k, v, segment_ids=segment_ids, causal=False,
            sm_scale=(1.0 / float(np.sqrt(self.d_head))) if self.scale else 1.0,
            block_sizes=sizes)
        return out[:, :, :t, :]

    def _fused_eligible(self, mask, cache, t_q: int, t_k: int):
        """Gate + mask conversion for the whole-row fused attention kernel.

        Returns None when ineligible; False when eligible with no mask; or
        the (B, T) boolean key-validity rows extracted from a broadcastable
        (B|1, 1, 1, T) pad mask. Causal/arbitrary (T, T) masks and
        non-square (cross-)attention fall back to the XLA path."""
        if self.fused_attention is not True or self.flash:
            return None
        from audio8_tpu.ops.pallas.attention_kernel import structural_ok

        if not structural_ok(t_q, t_k, self.d_head, self.rpr_k, cache):
            return None
        if mask is None:
            return False
        if (hasattr(mask, "ndim") and mask.ndim == 4
                and mask.shape[1] == 1 and mask.shape[2] == 1):
            return jnp.squeeze(mask, axis=(1, 2))
        return None

    def _block_eligible(self, query, key, value, mask, cache,
                        position_bias):
        """Gate for the fused attention-BLOCK kernel
        (``fused_attention="block"``, attention_block_kernel.py): strict
        self-attention (same array object for q/k/v), square T within
        the VMEM bound, no rpr/bias/cache/flash, key-validity masks
        only, and never during init (the XLA path must create the Dense
        params first). Returns False (no mask) / (B, T) key-validity /
        None (ineligible)."""
        if self.fused_attention != "block" or self.flash:
            return None
        if self.is_initializing():
            return None
        if not (query is key and key is value):
            return None
        if position_bias is not None or self.gated_rel_pos:
            return None
        from audio8_tpu.ops.pallas.attention_kernel import structural_ok

        t = query.shape[1]
        if not structural_ok(t, t, self.d_head, self.rpr_k, cache):
            return None
        # int8-quantized serving keeps the Dense int8-MXU path
        if self.get_variable("params", "w_Q")["kernel"].dtype == jnp.int8:
            return None
        if mask is None:
            return False
        if (hasattr(mask, "ndim") and mask.ndim == 4
                and mask.shape[1] == 1 and mask.shape[2] == 1):
            kv = jnp.squeeze(mask, axis=(1, 2))
            return jnp.broadcast_to(kv, (query.shape[0], t))
        return None

    def _fused_block(self, x, key_valid, deterministic):
        """Run the fused-projections attention block kernel."""
        from audio8_tpu.ops.pallas.attention_block_kernel import (
            attention_block_nheads)

        pq = self.get_variable("params", "w_Q")
        pk = self.get_variable("params", "w_K")
        pv = self.get_variable("params", "w_V")
        po = self.get_variable("params", "w_O")
        cast = lambda a: a.astype(self.dtype)
        rate = 0.0 if deterministic else self.dropout_rate
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), -(2 ** 31), 2 ** 31 - 1,
                jnp.int32).astype(jnp.uint32)
        block = attention_block_nheads(self.num_heads)
        return block(
            x.astype(self.dtype),
            cast(pq["kernel"]), cast(pq["bias"]),
            cast(pk["kernel"]), cast(pk["bias"]),
            cast(pv["kernel"]), cast(pv["bias"]),
            cast(po["kernel"]), cast(po["bias"]),
            None if key_valid is False else key_valid,
            (1.0 / float(np.sqrt(self.d_head))) if self.scale else 1.0,
            rate, seed)

    def _rel_ids(self, t_q: int, t_k: int, q_offset) -> jnp.ndarray:
        qi = jnp.arange(t_q)[:, None] + q_offset
        kj = jnp.arange(t_k)[None, :]
        return jnp.clip(kj - qi, -self.rpr_k, self.rpr_k) + self.rpr_k

    def compute_kv(self, key: jnp.ndarray, value: jnp.ndarray):
        """Precompute split K/V heads (for cross-attention over a fixed
        memory during incremental decode)."""
        return self._split(self.w_K(key)), self._split(self.w_V(value))

    def attend_kv(self, query, k, v, mask=None):
        """Attention with precomputed (B, H, T_k, dh) keys/values."""
        q = self._split(self.w_Q(query))
        if self.scale:
            q = q * (1.0 / jnp.sqrt(jnp.array(self.d_head, jnp.float32))).astype(q.dtype)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, t, d = out.shape
        return self.w_O(out.transpose(0, 2, 1, 3).reshape(b, t, h * d))

    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cache: Optional[dict] = None,
        cache_index=None,
        position_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """mask: boolean, broadcastable to (B, H, T_q, T_k); True = attend.

        ``position_bias``: optional (1|B, H, T_q, T_k) float bias added to
        the scaled logits. With ``gated_rel_pos=True`` it is first scaled
        by the WavLM per-layer gate computed from the attention inputs.

        When ``cache`` is given (a dict with 'k'/'v' of shape
        (B, H, T_max, d_head)), the new key/value rows are written at
        ``cache_index`` and attention runs over the full static cache with
        positions >= cache_index + T_new masked out; returns (out, cache).
        """
        blk = self._block_eligible(query, key, value, mask, cache,
                                   position_bias)
        if blk is not None:
            return self._fused_block(query, blk, deterministic)

        if (self.packed_qkv and query is key and key is value
                and not self.is_initializing()):
            pq, pk, pv = (m.variables["params"]
                          for m in (self.w_Q, self.w_K, self.w_V))
            if pq["kernel"].dtype == jnp.int8:  # quantized serving path
                q, k, v = (self._split(m(query))
                           for m in (self.w_Q, self.w_K, self.w_V))
            else:
                w = jnp.concatenate(
                    [p["kernel"].astype(self.dtype) for p in (pq, pk, pv)],
                    axis=1)
                b = jnp.concatenate(
                    [p["bias"].astype(self.dtype) for p in (pq, pk, pv)])
                qkv = jnp.dot(query.astype(self.dtype), w) + b
                q, k, v = (self._split(t)
                           for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = self._split(self.w_Q(query))
            k = self._split(self.w_K(key))
            v = self._split(self.w_V(value))

        fused = (None if position_bias is not None
                 else self._fused_eligible(mask, cache, q.shape[2], k.shape[2]))
        if fused is not None:
            from audio8_tpu.ops.pallas.attention_kernel import attention_core

            key_valid = fused
            rate = 0.0 if deterministic else self.dropout_rate
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), -(2 ** 31), 2 ** 31 - 1,
                    jnp.int32).astype(jnp.uint32)
            out = attention_core(
                q, k, v,
                None if key_valid is False else key_valid,
                (1.0 / float(np.sqrt(self.d_head))) if self.scale else 1.0,
                rate, seed)
            b, h, t, d = out.shape
            return self.w_O(out.transpose(0, 2, 1, 3).reshape(b, t, h * d))

        if (
            self.flash
            and cache is None
            and self.rpr_k is None
            and position_bias is None
            # the flash kernel expresses masking as pad-segment ids, which
            # only encodes key-validity (B|1, 1, 1, T) masks; arbitrary
            # (T, T) masks (causal_chunk_frames) take the XLA path
            and (mask is None
                 or (getattr(mask, "ndim", 0) == 4 and mask.shape[2] == 1))
            and jax.default_backend() == "tpu"
        ):
            # Pallas flash-attention path (jax.experimental.pallas.ops.tpu).
            # The kernel has no attention-probability dropout; training a
            # recipe that specifies it (wav2vec2-base uses 0.1) under flash
            # CHANGES REGULARIZATION, not just speed — warn loudly once at
            # trace time (see docs/PARITY.md).
            if not deterministic and self.dropout_rate > 0:
                import warnings

                warnings.warn(
                    "flash attention skips attention-prob dropout "
                    f"(attention_dropout={self.dropout_rate}); training "
                    "regularization differs from the reference — set "
                    "flash=False for exact dropout semantics",
                    stacklevel=2)
            out = self._flash(q, k, v, mask)
            out = out.transpose(0, 2, 1, 3).reshape(
                out.shape[0], out.shape[2], -1)
            return self.w_O(out)

        if self.scale:
            q = q * (1.0 / jnp.sqrt(jnp.array(self.d_head, jnp.float32))).astype(q.dtype)

        q_offset = 0
        if cache is not None:
            t_new = k.shape[2]
            cache = dict(cache)
            cache["k"] = jax.lax.dynamic_update_slice(cache["k"], k, (0, 0, cache_index, 0))
            cache["v"] = jax.lax.dynamic_update_slice(cache["v"], v, (0, 0, cache_index, 0))
            k, v = cache["k"], cache["v"]
            t_max = k.shape[2]
            valid = jnp.arange(t_max)[None, None, None, :] < (cache_index + t_new)
            mask = valid if mask is None else jnp.logical_and(mask, valid)
            q_offset = cache_index

        # bf16 softmax path: keep the (B, H, T, T) logits in compute dtype
        # end-to-end — the MXU still accumulates f32 internally, only the
        # HBM materialization is bf16, halving the traffic of the largest
        # attention tensors (measured +8% on the wav2vec2-base pretrain
        # step as f32-store/bf16-softmax; storing bf16 removes the other
        # f32 copy too, docs/PERF.md). rpr adds logits tensors, so that
        # path keeps f32 accumulation for parity with the text models.
        bf16_sm = (self.bf16_softmax and self.dtype != jnp.float32
                   and self.rpr_k is None)
        acc_t = self.dtype if bf16_sm else jnp.float32
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_t)
        if position_bias is not None:
            bias = position_bias.astype(jnp.float32)
            if self.gated_rel_pos:
                # WavLM gate (HF WavLMAttention steps 1-4): per-head slices
                # of the *input* features -> Dense(8) -> (..., 2, 4).sum ->
                # sigmoid -> a * (b * const - 1) + 2, broadcast over keys
                b_, t_q = query.shape[0], query.shape[1]
                g = query.reshape(b_, t_q, self.num_heads,
                                  self.d_head).transpose(0, 2, 1, 3)
                proj = self.gru_rel_pos_linear(g).astype(jnp.float32)
                proj = proj.reshape(proj.shape[:-1] + (2, 4)).sum(-1)
                gates = jax.nn.sigmoid(proj)
                gate_a, gate_b = gates[..., :1], gates[..., 1:]
                const = self.gru_rel_pos_const.astype(jnp.float32)
                bias = (gate_a * (gate_b * const - 1.0) + 2.0) * bias
            logits = logits + bias.astype(logits.dtype)
        if self.rpr_k is not None:
            rel = self.rpr_key_emb(self._rel_ids(q.shape[2], k.shape[2], q_offset))
            logits = logits + jnp.einsum(
                "bhqd,qkd->bhqk", q, rel, preferred_element_type=jnp.float32
            )
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.asarray(NEG_INF, logits.dtype))
        if bf16_sm:
            probs = jax.nn.softmax(logits, axis=-1)
        elif self.bf16_softmax and self.dtype != jnp.float32:
            probs = jax.nn.softmax(logits.astype(self.dtype), axis=-1)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        if self.rpr_k is not None and self.rpr_value_on:
            rel_v = self.rpr_value_emb(self._rel_ids(q.shape[2], k.shape[2], q_offset))
            out = out + jnp.einsum("bhqk,qkd->bhqd", probs, rel_v).astype(self.dtype)
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
        out = self.w_O(out)
        if cache is not None:
            return out, cache
        return out


class FFN(nn.Module):
    d_ff: int
    d_model: int
    activation: str = "gelu"
    dropout_rate: float = 0.0
    ffn_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.expand = Dense(self.d_ff, **dd)
        self.contract = Dense(self.d_model, **dd)
        self.drop = Dropout(self.ffn_dropout_rate)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = _activation(self.activation)(self.expand(x))
        h = self.drop(h, deterministic=deterministic)
        return self.contract(h)


class TransformerEncoderLayer(nn.Module):
    num_heads: int
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1
    attention_dropout: Optional[float] = None  # None -> dropout_rate
    ffn_dropout_rate: float = 0.0
    activation: str = "gelu"
    pre_norm: bool = False  # False = post-norm (wav2vec2-base layout)
    d_k: Optional[int] = None
    rpr_k: Optional[int] = None
    rpr_value_on: bool = False
    scale: bool = True
    flash: bool = False
    bf16_softmax: bool = True
    fused_attention: Optional[bool] = None
    gated_rel_pos: bool = False
    packed_qkv: bool = False
    # Mixture-of-Experts FFN (nn/moe.py): >0 swaps the dense FFN for
    # moe_experts Switch/GShard experts
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn_drop = (self.attention_dropout if self.attention_dropout is not None
                     else self.dropout_rate)
        self.self_attn = MultiHeadAttention(
            num_heads=self.num_heads,
            d_model=self.d_model,
            d_k=self.d_k,
            scale=self.scale,
            rpr_k=self.rpr_k,
            rpr_value_on=self.rpr_value_on,
            dropout_rate=attn_drop,
            flash=self.flash,
            bf16_softmax=self.bf16_softmax,
            fused_attention=self.fused_attention,
            gated_rel_pos=self.gated_rel_pos,
            packed_qkv=self.packed_qkv,
            **dd,
        )
        if self.moe_experts > 0:
            from audio8_tpu.nn.moe import MoEFFN  # avoid import cycle

            self.ffn = MoEFFN(
                d_ff=self.d_ff,
                d_model=self.d_model,
                num_experts=self.moe_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                activation=self.activation,
                ffn_dropout_rate=self.ffn_dropout_rate,
                **dd,
            )
        else:
            self.ffn = FFN(
                d_ff=self.d_ff,
                d_model=self.d_model,
                activation=self.activation,
                ffn_dropout_rate=self.ffn_dropout_rate,
                **dd,
            )
        # ln_attn == fairseq self_attn_layer_norm, ln_ffn == final_layer_norm
        self.ln_attn = LayerNorm(**dd)
        self.ln_ffn = LayerNorm(**dd)
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, deterministic: bool = True,
                 position_bias=None):
        attn = lambda h: self.self_attn(h, h, h, mask, deterministic,
                                        position_bias=position_bias)
        if self.pre_norm:
            h = self.ln_attn(x)
            x = x + self.drop(attn(h), deterministic=deterministic)
            h = self.ln_ffn(x)
            x = x + self.drop(self.ffn(h, deterministic), deterministic=deterministic)
        else:
            x = x + self.drop(attn(x), deterministic=deterministic)
            x = self.ln_attn(x)
            x = x + self.drop(self.ffn(x, deterministic), deterministic=deterministic)
            x = self.ln_ffn(x)
        return x


class TransformerEncoderStack(nn.Module):
    num_heads: int
    d_model: int
    num_layers: int
    d_ff: Optional[int] = None
    dropout_rate: float = 0.1
    attention_dropout: Optional[float] = None
    ffn_dropout_rate: float = 0.0
    activation: str = "gelu"
    pre_norm: bool = False
    d_k: Optional[int] = None
    rpr_k: Optional[int] = None
    rpr_value_on: bool = False
    scale: bool = True
    layer_drop: float = 0.0
    flash: bool = False
    bf16_softmax: bool = True
    fused_attention: Optional[bool] = None
    packed_qkv: bool = False
    # WavLM: one bucketed RelativePositionBias shared by the stack,
    # gated per layer inside MultiHeadAttention
    gated_rel_pos: bool = False
    rel_pos_buckets: int = 320
    rel_pos_max_distance: int = 800
    # Rematerialize each encoder layer in the backward pass
    # (jax.checkpoint): only the layer *inputs* are saved, activations
    # inside the layer (incl. the (B,H,T,T) attention probs) are
    # recomputed during backprop. Trades ~1 extra forward of FLOPs for
    # O(layers) less activation HBM — required for large models on long
    # clips, off by default for speed.
    remat: bool = False
    # Sequence parallelism: constrain the residual stream between layers
    # to P('data', 'model') — the frame axis T shards over the tensor-
    # parallel mesh axis (Megatron-SP). Bare PartitionSpecs resolve only
    # under a mesh context, so the jitted step must be TRACED inside
    # `with mesh:` (train/steps.py factories handle this via mesh=).
    seq_shard: bool = False
    # MoE (nn/moe.py): every moe_every-th layer (GShard convention:
    # layers moe_every-1, 2*moe_every-1, ...) uses a num_experts MoE FFN
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_every: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        d_ff = self.d_ff or 4 * self.d_model
        layer_cls = TransformerEncoderLayer
        if self.remat:
            # deterministic (arg index 3 counting self) must stay a
            # static python bool under nn.remat
            layer_cls = nn.remat(TransformerEncoderLayer,
                                 static_argnums=(3,))
        every = max(self.moe_every, 1)
        self.encoders = [
            layer_cls(
                num_heads=self.num_heads,
                d_model=self.d_model,
                d_ff=d_ff,
                dropout_rate=self.dropout_rate,
                attention_dropout=self.attention_dropout,
                ffn_dropout_rate=self.ffn_dropout_rate,
                activation=self.activation,
                pre_norm=self.pre_norm,
                d_k=self.d_k,
                rpr_k=self.rpr_k,
                rpr_value_on=self.rpr_value_on,
                scale=self.scale,
                flash=self.flash,
                bf16_softmax=self.bf16_softmax,
                fused_attention=self.fused_attention,
                gated_rel_pos=self.gated_rel_pos,
                packed_qkv=self.packed_qkv,
                moe_experts=(self.moe_experts
                             if i % every == every - 1 else 0),
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.gated_rel_pos:
            self.rel_pos_bias = RelativePositionBias(
                num_heads=self.num_heads, num_buckets=self.rel_pos_buckets,
                max_distance=self.rel_pos_max_distance,
                dtype=self.dtype, param_dtype=self.param_dtype)
        if self.pre_norm:
            self.ln_out = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)

    def _seq_constrain(self, x):
        if not self.seq_shard:
            return x
        from jax.sharding import PartitionSpec as P

        try:
            return jax.lax.with_sharding_constraint(x, P("data", "model"))
        except RuntimeError:
            # no mesh in context: this trace is init/eval outside the
            # mesh-wrapped step (train/steps._mesh_wrap). The constraint
            # is a layout hint, not semantics — unconstrained is correct.
            return x

    def __call__(self, x, mask=None, deterministic: bool = True,
                 return_hiddens: bool = False):
        """``return_hiddens=True`` (static) additionally returns the
        per-layer outputs [(B, T, D)] * num_layers — the data2vec teacher
        averages the top-k of these (models/data2vec.py)."""
        use_layer_drop = self.layer_drop > 0.0 and not deterministic
        if use_layer_drop:
            keys = jax.random.split(self.make_rng("dropout"), len(self.encoders))
        position_bias = (self.rel_pos_bias(x.shape[1], x.shape[1])
                         if self.gated_rel_pos else None)
        x = self._seq_constrain(x)
        hiddens = []
        for i, layer in enumerate(self.encoders):
            y = layer(x, mask, deterministic, position_bias)
            if use_layer_drop:
                # Stochastic depth (LayerDrop): drop the whole layer for the
                # whole batch. Compute-and-select keeps shapes static for XLA.
                keep = jax.random.bernoulli(keys[i], 1.0 - self.layer_drop)
                x = jnp.where(keep, y, x)
            else:
                x = y
            x = self._seq_constrain(x)
            if return_hiddens:
                hiddens.append(x)
        if self.pre_norm:
            x = self.ln_out(x)
        if return_hiddens:
            return x, hiddens
        return x


class TransformerDecoderLayer(nn.Module):
    num_heads: int
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1
    activation: str = "gelu"
    pre_norm: bool = True
    scale: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mha = dict(num_heads=self.num_heads, d_model=self.d_model, scale=self.scale,
                   dropout_rate=self.dropout_rate, **dd)
        self.self_attn = MultiHeadAttention(**mha)
        self.src_attn = MultiHeadAttention(**mha)
        self.ffn = FFN(d_ff=self.d_ff, d_model=self.d_model, activation=self.activation, **dd)
        self.ln_self = LayerNorm(**dd)
        self.ln_src = LayerNorm(**dd)
        self.ln_ffn = LayerNorm(**dd)
        self.drop = Dropout(self.dropout_rate)

    def _cross(self, h, memory, src_mask, det, cross_kv):
        if cross_kv is not None:
            return self.src_attn.attend_kv(h, cross_kv[0], cross_kv[1], src_mask)
        return self.src_attn(h, memory, memory, src_mask, det)

    def _sublayers(self, x, memory, src_mask, tgt_mask, deterministic,
                   self_cache=None, cache_index=None, cross_kv=None):
        det = deterministic
        if self.pre_norm:
            h = self.ln_self(x)
            if self_cache is not None:
                attn, self_cache = self.self_attn(h, h, h, tgt_mask, det, self_cache, cache_index)
            else:
                attn = self.self_attn(h, h, h, tgt_mask, det)
            x = x + self.drop(attn, deterministic=det)
            h = self.ln_src(x)
            attn = self._cross(h, memory, src_mask, det, cross_kv)
            x = x + self.drop(attn, deterministic=det)
            h = self.ln_ffn(x)
            x = x + self.drop(self.ffn(h, det), deterministic=det)
        else:
            if self_cache is not None:
                attn, self_cache = self.self_attn(x, x, x, tgt_mask, det, self_cache, cache_index)
            else:
                attn = self.self_attn(x, x, x, tgt_mask, det)
            x = self.ln_self(x + self.drop(attn, deterministic=det))
            attn = self._cross(x, memory, src_mask, det, cross_kv)
            x = self.ln_src(x + self.drop(attn, deterministic=det))
            x = self.ln_ffn(x + self.drop(self.ffn(x, det), deterministic=det))
        return x, self_cache

    def __call__(self, x, memory, src_mask=None, tgt_mask=None, deterministic: bool = True):
        x, _ = self._sublayers(x, memory, src_mask, tgt_mask, deterministic)
        return x

    def compute_cross_kv(self, memory):
        return self.src_attn.compute_kv(memory, memory)

    def step(self, x, memory, src_mask, self_cache, cache_index,
             deterministic: bool = True, cross_kv=None):
        """Single-token decode step using the KV cache (no tgt mask needed —
        cache masking covers causality). ``cross_kv`` is the precomputed
        memory K/V — avoids re-projecting the encoder output every step."""
        x, self_cache = self._sublayers(
            x, memory, src_mask, None, deterministic,
            self_cache=self_cache, cache_index=cache_index, cross_kv=cross_kv,
        )
        return x, self_cache


class TransformerDecoderStack(nn.Module):
    num_heads: int
    d_model: int
    num_layers: int
    d_ff: Optional[int] = None
    dropout_rate: float = 0.1
    activation: str = "gelu"
    pre_norm: bool = True
    scale: bool = True
    layer_drop: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        d_ff = self.d_ff or 4 * self.d_model
        self.decoders = [
            TransformerDecoderLayer(
                num_heads=self.num_heads,
                d_model=self.d_model,
                d_ff=d_ff,
                dropout_rate=self.dropout_rate,
                activation=self.activation,
                pre_norm=self.pre_norm,
                scale=self.scale,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.pre_norm:
            self.ln_out = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, x, memory, src_mask=None, tgt_mask=None, deterministic: bool = True):
        for layer in self.decoders:
            x = layer(x, memory, src_mask, tgt_mask, deterministic)
        if self.pre_norm:
            x = self.ln_out(x)
        return x

    def init_cache(self, batch: int, max_len: int, dtype=None) -> dict:
        d_head = self.d_model // self.num_heads
        return KVCache.init(batch, self.num_layers, self.num_heads, max_len, d_head,
                            dtype or self.dtype)

    def compute_cross_kv(self, memory):
        """Per-layer precomputed cross-attention K/V over a fixed memory."""
        return [layer.compute_cross_kv(memory) for layer in self.decoders]

    def step(self, x, memory, src_mask, cache: dict, deterministic: bool = True,
             cross_kv=None):
        """One decode step for all layers; returns (out, updated cache)."""
        idx = cache["index"]
        new_k, new_v = [], []
        for i, layer in enumerate(self.decoders):
            layer_cache = {"k": cache["k"][i], "v": cache["v"][i]}
            x, layer_cache = layer.step(
                x, memory, src_mask, layer_cache, idx, deterministic,
                cross_kv=None if cross_kv is None else cross_kv[i])
            new_k.append(layer_cache["k"])
            new_v.append(layer_cache["v"])
        if self.pre_norm:
            x = self.ln_out(x)
        cache = {
            "k": jnp.stack(new_k),
            "v": jnp.stack(new_v),
            "index": idx + 1,
        }
        return x, cache


def subsequent_mask(size: int) -> jnp.ndarray:
    """Causal mask (1, 1, T, T), True where position j <= i may be attended."""
    return jnp.tril(jnp.ones((size, size), jnp.bool_))[None, None, :, :]
