"""Mixture-of-Experts FFN with expert parallelism (GShard/Switch style).

Beyond the reference (its FFN is dense, eight_mile
``TransformerEncoderStack``); this is the TPU-native capability that
completes the parallelism menu: expert weights carry a leading (E, ...)
axis sharded over the 'model' mesh axis (``EP_RULES``), and the
dispatch/combine are dense one-hot einsums — no host-side scatter, no
dynamic shapes, so the whole layer stays one XLA program and the
partitioner inserts the token all-to-alls over ICI.

Routing is top-k (k=1 Switch, k=2 GShard) with a fixed per-expert
capacity ``ceil(k * S * capacity_factor / E)``: tokens beyond an
expert's capacity are dropped for that expert (their gate contribution
is zero, the residual connection carries them unchanged — standard
Switch behavior). The load-balance auxiliary loss is Switch eq. (4):
``E * sum_e f_e * p_e`` (token fraction times mean router prob), sowed
into the 'losses' collection so step factories can add
``moe_aux_weight * aux`` without changing the module interface.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense
from audio8_tpu.nn.transformer import _activation

Dtype = Any


class MoEFFN(nn.Module):
    """Drop-in FFN replacement: ``__call__(x (B,T,C), deterministic)``."""

    d_ff: int
    d_model: int
    num_experts: int = 8
    top_k: int = 1
    capacity_factor: float = 1.25
    activation: str = "gelu"
    ffn_dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        e, d, f = self.num_experts, self.d_model, self.d_ff
        assert self.top_k in (1, 2), "top_k 1 (Switch) or 2 (GShard)"
        self.router = Dense(e, use_bias=False, dtype=jnp.float32,
                            param_dtype=self.param_dtype)
        init = nn.initializers.lecun_normal()
        self.wi = self.param("wi", init, (e, d, f), self.param_dtype)
        self.bi = self.param("bi", nn.initializers.zeros_init(), (e, f),
                             self.param_dtype)
        self.wo = self.param("wo", init, (e, f, d), self.param_dtype)
        self.bo = self.param("bo", nn.initializers.zeros_init(), (e, d),
                             self.param_dtype)
        self.drop = Dropout(self.ffn_dropout_rate)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, t, d = x.shape
        e = self.num_experts
        s = b * t
        cap = max(int(math.ceil(self.top_k * s * self.capacity_factor / e)), 1)
        cap = min(cap, s)

        xf = x.reshape(s, d)
        # router in f32: tiny matmul, and gate ordering must not wobble
        # under bf16 compute
        logits = self.router(xf.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (S, E)

        # Switch load-balance loss (eq. 4) on the top-1 assignment:
        # E * sum_e (fraction of tokens routed to e) * (mean router prob e)
        top1 = jax.nn.one_hot(jnp.argmax(probs, axis=-1), e, dtype=jnp.float32)
        aux = e * jnp.sum(jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))
        self.sow("losses", "moe_aux", aux)

        combine = jnp.zeros((s, e, cap), jnp.float32)
        masked = probs
        position_base = jnp.zeros((e,), jnp.int32)  # slots already used
        for _ in range(self.top_k):
            idx = jnp.argmax(masked, axis=-1)                     # (S,)
            onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)      # (S, E)
            pos = (jnp.cumsum(onehot, axis=0) - 1) * onehot       # (S, E)
            pos = pos + position_base[None, :] * onehot
            keep = (pos < cap) & (onehot > 0)
            gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
            slot = jax.nn.one_hot(jnp.sum(pos * onehot, axis=-1), cap,
                                  dtype=jnp.float32)              # (S, C)
            combine = combine + (gate[:, None, None]
                                 * keep.astype(jnp.float32)[:, :, None]
                                 * slot[:, None, :])
            position_base = position_base + jnp.sum(
                keep.astype(jnp.int32), axis=0)
            masked = masked * (1.0 - onehot.astype(jnp.float32))

        if self.top_k == 2:
            # GShard: the two kept gates renormalize to sum to 1 per token
            tot = jnp.sum(combine, axis=(1, 2), keepdims=True)
            combine = jnp.where(tot > 0, combine / jnp.maximum(tot, 1e-9), 0.0)

        dispatch = (combine > 0).astype(self.dtype)               # (S, E, C)
        xe = jnp.einsum("sec,sd->ecd", dispatch, xf.astype(self.dtype))
        h = _activation(self.activation)(
            jnp.einsum("ecd,edf->ecf", xe, self.wi.astype(self.dtype))
            + self.bi.astype(self.dtype)[:, None])
        h = self.drop(h, deterministic=deterministic)
        ye = (jnp.einsum("ecf,efd->ecd", h, self.wo.astype(self.dtype))
              + self.bo.astype(self.dtype)[:, None])
        y = jnp.einsum("sec,ecd->sd", combine.astype(self.dtype), ye)
        return y.reshape(b, t, d)
