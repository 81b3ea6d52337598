"""Conformer encoder stack (arXiv 2005.08100) for the wav2vec2-conformer
model family.

Beyond the reference (vanilla transformer only): each block is the
macaron layout — half-step FFN, self-attention with rotary (RoPE) or
Transformer-XL relative position encodings, a convolution module
(pointwise GLU -> depthwise conv -> norm -> swish -> pointwise), a
second half-step FFN, and a final LayerNorm. Semantics track HF
``Wav2Vec2ConformerEncoderLayer`` for checkpoint parity, with two
deliberate TPU-first choices:

- positional tables (RoPE cos/sin, the (2T-1, D) XL sinusoid table) are
  built host-side with numpy at trace time — T is static under jit, so
  the only traced work is the matmuls that consume them;
- the conv module's BatchNorm runs in frozen-statistics form: the
  converter folds (running_mean, running_var, weight, bias) into an
  equivalent per-channel affine at load time (exact at inference;
  fine-tuning trains the affine — the standard freeze-BN-stats recipe —
  instead of threading a mutable batch-stats collection through every
  jitted step). From-scratch training starts the affine at identity.

Note HF's conformer encoder *constructs* a wav2vec2-style pos-conv
embedding but never applies it in ``forward`` (modeling_wav2vec2_conformer.py:646
vs its forward); those dead checkpoint weights are consumed and dropped
by the converter, and this stack has no pos-conv on purpose.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Conv1D, Dense, LayerNorm
from audio8_tpu.nn.transformer import NEG_INF, _activation

Dtype = Any


def rotary_tables(t: int, d_head: int, base: float = 10000.0):
    """RoPE cos/sin tables, (t, d_head) each (HF duplicates the half-dim
    frequency vector: cat(freqs, freqs))."""
    inv_freq = 1.0 / (base ** (np.arange(0, d_head, 2) / d_head))
    freqs = np.arange(t)[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def relative_sinusoid_table(t: int, d_model: int) -> np.ndarray:
    """Transformer-XL relative position table, (2t-1, d_model): positive
    distances (key left of query) first, reversed, then negative
    (HF ``Wav2Vec2ConformerRelPositionalEmbedding``)."""
    pos = np.arange(t)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * -(np.log(10000.0) / d_model))
    pe_pos = np.zeros((t, d_model))
    pe_neg = np.zeros((t, d_model))
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]]).astype(np.float32)


class ConformerAttention(nn.Module):
    """Self-attention with rotary or Transformer-XL relative positions
    (HF ``Wav2Vec2ConformerSelfAttention``)."""

    num_heads: int
    d_model: int
    position_embeddings_type: str = "relative"  # 'relative'|'rotary'|'none'
    rotary_base: float = 10000.0
    dropout_rate: float = 0.0
    bf16_softmax: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.d_head = self.d_model // self.num_heads
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.w_Q = Dense(self.d_model, **dd)
        self.w_K = Dense(self.d_model, **dd)
        self.w_V = Dense(self.d_model, **dd)
        self.w_O = Dense(self.d_model, **dd)
        if self.position_embeddings_type == "relative":
            self.linear_pos = Dense(self.d_model, use_bias=False, **dd)
            self.pos_bias_u = self.param(
                "pos_bias_u", nn.initializers.zeros,
                (self.num_heads, self.d_head), self.param_dtype)
            self.pos_bias_v = self.param(
                "pos_bias_v", nn.initializers.zeros,
                (self.num_heads, self.d_head), self.param_dtype)
        self.attn_dropout = Dropout(self.dropout_rate)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.d_head).transpose(0, 2, 1, 3)

    def _rotate(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply RoPE to the attention INPUT (B, T, D) — HF rotates the
        hidden states before the q/k projections, not q/k themselves."""
        b, t, _ = x.shape
        cos, sin = rotary_tables(t, self.d_head, self.rotary_base)
        cos = jnp.asarray(cos, x.dtype)[None, :, None, :]
        sin = jnp.asarray(sin, x.dtype)[None, :, None, :]
        h = x.reshape(b, t, self.num_heads, self.d_head)
        h1, h2 = h[..., : self.d_head // 2], h[..., self.d_head // 2:]
        rot = jnp.concatenate([-h2, h1], axis=-1)
        return (h * cos + rot * sin).reshape(b, t, self.d_model)

    def _relative_scores(self, q, k, t: int) -> jnp.ndarray:
        """Transformer-XL scores (arXiv 1901.02860 §3.3): content term
        (q + u)k^T plus position term (q + v)R^T with the shift trick
        realigning the (T, 2T-1) distance axis."""
        pe = jnp.asarray(relative_sinusoid_table(t, self.d_model),
                         self.dtype)[None]  # (1, 2T-1, D)
        r = self._split(self.linear_pos(pe))  # (1, H, 2T-1, dh)
        u = self.pos_bias_u.astype(q.dtype)[None, :, None, :]
        v = self.pos_bias_v.astype(q.dtype)[None, :, None, :]
        ac = jnp.einsum("bhqd,bhkd->bhqk", q + u, k,
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhqd,xhrd->bhqr", q + v, r,
                        preferred_element_type=jnp.float32)  # (B,H,T,2T-1)
        b_, h_, _, rr = bd.shape
        padded = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
        padded = padded.reshape(b_, h_, rr + 1, t)[:, :, 1:, :]
        bd = padded.reshape(b_, h_, t, rr)[..., :t]
        return (ac + bd) / np.sqrt(self.d_head)

    def __call__(self, x, mask=None, deterministic: bool = True):
        qk_in = x
        if self.position_embeddings_type == "rotary":
            qk_in = self._rotate(x)
        q = self._split(self.w_Q(qk_in))
        k = self._split(self.w_K(qk_in))
        v = self._split(self.w_V(x))
        t = x.shape[1]
        if self.position_embeddings_type == "relative":
            logits = self._relative_scores(q, k, t)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(self.d_head)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.asarray(NEG_INF, logits.dtype))
        if self.bf16_softmax and self.dtype != jnp.float32:
            probs = jax.nn.softmax(logits.astype(self.dtype), axis=-1)
        else:
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        probs = self.attn_dropout(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, h, tq, d = out.shape
        return self.w_O(out.transpose(0, 2, 1, 3).reshape(b, tq, h * d))


class ConformerConvModule(nn.Module):
    """LN -> pointwise(2C) -> GLU -> depthwise(k, SAME) -> folded-BN
    affine -> activation -> pointwise(C) -> dropout."""

    d_model: int
    kernel_size: int = 31
    activation: str = "swish"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        assert self.kernel_size % 2 == 1, "depthwise kernel must be odd"
        self.ln = LayerNorm(**dd)
        self.pw1 = Dense(2 * self.d_model, use_bias=False, **dd)
        pad = (self.kernel_size - 1) // 2
        self.dw = Conv1D(features=self.d_model, kernel_size=self.kernel_size,
                         stride=1, padding=(pad, pad), groups=self.d_model,
                         use_bias=False, **dd)
        # frozen-BN affine (converter folds running stats into these)
        self.bn_scale = self.param("bn_scale", nn.initializers.ones,
                                   (self.d_model,), self.param_dtype)
        self.bn_bias = self.param("bn_bias", nn.initializers.zeros,
                                  (self.d_model,), self.param_dtype)
        self.pw2 = Dense(self.d_model, use_bias=False, **dd)
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, x, deterministic: bool = True):
        h = self.ln(x)
        h = self.pw1(h)
        a, g = h[..., : self.d_model], h[..., self.d_model:]
        h = a * jax.nn.sigmoid(g)
        h = self.dw(h)
        h = h * self.bn_scale.astype(h.dtype) + self.bn_bias.astype(h.dtype)
        h = _activation(self.activation)(h)
        h = self.pw2(h)
        return self.drop(h, deterministic=deterministic)


class ConformerFFN(nn.Module):
    d_ff: int
    d_model: int
    activation: str = "swish"
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = Dense(self.d_ff, name="expand", **dd)(x)
        h = _activation(self.activation)(h)
        h = Dropout(self.dropout_rate)(h, deterministic=deterministic)
        h = Dense(self.d_model, name="contract", **dd)(h)
        return Dropout(self.dropout_rate)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    num_heads: int
    d_model: int
    d_ff: int
    position_embeddings_type: str = "relative"
    rotary_base: float = 10000.0
    conv_kernel_size: int = 31
    activation: str = "swish"
    dropout_rate: float = 0.1
    attention_dropout: Optional[float] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ffn = dict(d_ff=self.d_ff, d_model=self.d_model,
                   activation=self.activation,
                   dropout_rate=self.dropout_rate, **dd)
        self.ffn1_ln = LayerNorm(**dd)
        self.ffn1 = ConformerFFN(**ffn)
        self.attn_ln = LayerNorm(**dd)
        self.self_attn = ConformerAttention(
            num_heads=self.num_heads, d_model=self.d_model,
            position_embeddings_type=self.position_embeddings_type,
            rotary_base=self.rotary_base,
            dropout_rate=(self.attention_dropout
                          if self.attention_dropout is not None
                          else self.dropout_rate),
            **dd)
        self.conv = ConformerConvModule(
            d_model=self.d_model, kernel_size=self.conv_kernel_size,
            activation=self.activation, dropout_rate=self.dropout_rate, **dd)
        self.ffn2_ln = LayerNorm(**dd)
        self.ffn2 = ConformerFFN(**ffn)
        self.final_ln = LayerNorm(**dd)
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, deterministic: bool = True):
        x = x + 0.5 * self.ffn1(self.ffn1_ln(x), deterministic)
        a = self.self_attn(self.attn_ln(x), mask, deterministic)
        x = x + self.drop(a, deterministic=deterministic)
        x = x + self.conv(x, deterministic)
        x = x + 0.5 * self.ffn2(self.ffn2_ln(x), deterministic)
        return self.final_ln(x)


class ConformerEncoderStack(nn.Module):
    """Dropout -> N conformer blocks -> LayerNorm (HF
    ``Wav2Vec2ConformerEncoder`` minus its never-applied pos-conv)."""

    num_heads: int
    d_model: int
    num_layers: int
    d_ff: Optional[int] = None
    position_embeddings_type: str = "relative"
    rotary_base: float = 10000.0
    conv_kernel_size: int = 31
    activation: str = "swish"
    dropout_rate: float = 0.1
    attention_dropout: Optional[float] = None
    layer_drop: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        block_cls = ConformerBlock
        if self.remat:
            block_cls = nn.remat(ConformerBlock, static_argnums=(3,))
        self.blocks = [
            block_cls(
                num_heads=self.num_heads, d_model=self.d_model,
                d_ff=self.d_ff or 4 * self.d_model,
                position_embeddings_type=self.position_embeddings_type,
                rotary_base=self.rotary_base,
                conv_kernel_size=self.conv_kernel_size,
                activation=self.activation, dropout_rate=self.dropout_rate,
                attention_dropout=self.attention_dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}")
            for i in range(self.num_layers)
        ]
        self.ln_out = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype)
        self.drop = Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, deterministic: bool = True):
        x = self.drop(x, deterministic=deterministic)
        use_layer_drop = self.layer_drop > 0.0 and not deterministic
        if use_layer_drop:
            keys = jax.random.split(self.make_rng("dropout"), len(self.blocks))
        for i, block in enumerate(self.blocks):
            y = block(x, mask, deterministic)
            if use_layer_drop:
                keep = jax.random.bernoulli(keys[i], 1.0 - self.layer_drop)
                x = jnp.where(keep, y, x)
            else:
                x = y
        return self.ln_out(x)
