"""Paired audio<->text dual-encoder with symmetric CLIP loss.

Replaces eight_mile's ``BasicDualEncoderModel`` +
``create_loss('symmetric', init_temp, learn_temp)`` as used by
/root/reference/audio8/pretrain_paired.py:203,250-254 and
wav2vec2.py:299-368 (`create_paired_model`). The learnable temperature is a
parameter of the loss module (the reference wraps the loss module in the
optimizer for exactly this reason, pretrain_paired.py:250-254).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import PooledConfig, TextEncoderConfig
from audio8_tpu.models.text import TextBoWPooledEncoder, TextTransformerPooledEncoder
from audio8_tpu.models.wav2vec2 import Wav2Vec2PooledEncoder
from audio8_tpu.nn.layers import Dense

Dtype = Any


class ProjectionStack(nn.Module):
    """Optional stacking MLP + final projection to the shared space."""

    stacking_layers: Tuple[int, ...]
    output_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.stacking_layers):
            x = jax.nn.relu(Dense(h, dtype=self.dtype, param_dtype=self.param_dtype,
                                  name=f"stack_{i}")(x))
        return Dense(self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="out")(x)


class DualEncoderModel(nn.Module):
    """Two towers projected to a shared embedding space."""

    audio_config: PooledConfig
    text_config: TextEncoderConfig
    stacking_layers: Tuple[int, ...] = ()
    output_dim: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.audio_encoder = Wav2Vec2PooledEncoder(config=self.audio_config, **dd)
        if self.text_config.encoder_type == "transformer":
            self.text_encoder = TextTransformerPooledEncoder(config=self.text_config, **dd)
        else:
            self.text_encoder = TextBoWPooledEncoder(
                vocab_size=self.text_config.vocab_size,
                d_model=self.text_config.d_model,
                reduction_type=self.text_config.reduction_type, **dd)
        self.audio_proj = ProjectionStack(
            stacking_layers=tuple(self.stacking_layers), output_dim=self.output_dim, **dd)
        self.text_proj = ProjectionStack(
            stacking_layers=tuple(self.stacking_layers), output_dim=self.output_dim, **dd)

    def encode_audio(self, x, lengths, train=False, freeze=True):
        pooled = self.audio_encoder(x, lengths, train, freeze)
        return self.audio_proj(pooled)

    def encode_text(self, ids, lengths, train=False, freeze=True):
        pooled = self.text_encoder(ids, lengths, train, freeze)
        return self.text_proj(pooled)

    def __call__(self, audio, audio_lengths, text, text_lengths,
                 train: bool = False, freeze_audio: bool = True,
                 freeze_text: bool = True):
        a = self.encode_audio(audio, audio_lengths, train, freeze_audio)
        t = self.encode_text(text, text_lengths, train, freeze_text)
        return a, t


class SymmetricCLIPLoss(nn.Module):
    """InfoNCE in both directions with (optionally learnable) temperature.

    logits = exp(logit_scale) * normalize(a) @ normalize(t)^T;
    loss = (CE(rows) + CE(cols)) / 2.
    """

    init_temperature: float = 0.07
    learn_temperature: bool = True

    @nn.compact
    def __call__(self, audio_emb: jnp.ndarray, text_emb: jnp.ndarray,
                 row_mask: Optional[jnp.ndarray] = None):
        """``row_mask`` (B,) marks real rows; padding rows added for batch
        snapping are excluded both as anchors and as negatives."""
        import math

        init = math.log(1.0 / self.init_temperature)
        if self.learn_temperature:
            logit_scale = self.param(
                "logit_scale", lambda k, s: jnp.full(s, init, jnp.float32), ())
        else:
            logit_scale = jnp.asarray(init, jnp.float32)
        a = audio_emb.astype(jnp.float32)
        t = text_emb.astype(jnp.float32)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
        logits = jnp.exp(logit_scale) * (a @ t.T)  # (B, B)
        b = logits.shape[0]
        m = (jnp.ones((b,), jnp.float32) if row_mask is None
             else row_mask.astype(jnp.float32))
        neg = jnp.where(m > 0, 0.0, -1e30)  # exclude pad rows as candidates
        labels = jnp.arange(b)
        lse_rows = jax.nn.logsumexp(logits + neg[None, :], axis=-1)
        lse_cols = jax.nn.logsumexp(logits + neg[:, None], axis=0)
        diag = jnp.diagonal(logits)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss_a = jnp.sum((lse_rows - diag) * m) / denom
        loss_t = jnp.sum((lse_cols - diag) * m) / denom
        loss = 0.5 * (loss_a + loss_t)
        hits = (jnp.argmax(logits + neg[None, :], axis=-1) == labels)
        acc = jnp.sum(hits.astype(jnp.float32) * m) / denom
        return loss, {"clip_loss": loss, "clip_accuracy": acc,
                      "logit_scale": jnp.exp(logit_scale)}


def create_paired_model(
    vocab_size: int,
    audio_config: Optional[PooledConfig] = None,
    text_config: Optional[TextEncoderConfig] = None,
    stacking_layers: Sequence[int] = (),
    output_dim: int = 256,
    dtype=jnp.float32,
    **kwargs,
) -> DualEncoderModel:
    """Factory mirroring create_paired_model (wav2vec2.py:299-368)."""
    ac = audio_config or PooledConfig(
        d_model=int(kwargs.get("audio_d_model", 768)),
        num_heads=int(kwargs.get("audio_num_heads", 12)),
        num_layers=int(kwargs.get("audio_num_layers", 12)),
        dropout=float(kwargs.get("audio_dropout", 0.1)),
        d_ff=int(kwargs.get("audio_d_ff", 3072)),
        reduction_type=str(kwargs.get("audio_reduction_type", "max")),
        reduction_d_k=int(kwargs.get("audio_d_k", 64)),
        timestep_masking=float(kwargs.get("audio_timestep_masking", 0.5)),
        channel_masking=float(kwargs.get("audio_channel_masking", 0.1)),
    )
    tc = text_config or TextEncoderConfig(
        vocab_size=vocab_size,
        d_model=int(kwargs.get("text_d_model", 512)),
        num_heads=int(kwargs.get("text_num_heads", 8)),
        num_layers=int(kwargs.get("text_num_layers", 8)),
        dropout=float(kwargs.get("text_dropout", 0.1)),
        d_ff=int(kwargs.get("text_d_ff", 2048)),
        rpr_k=kwargs.get("text_rpr_k", 8),
        reduction_type=str(kwargs.get("text_reduction_type", "max")),
        reduction_d_k=int(kwargs.get("text_d_k", 64)),
        encoder_type=str(kwargs.get("text_encoder_type", "transformer")),
    )
    return DualEncoderModel(
        audio_config=ac, text_config=tc,
        stacking_layers=tuple(stacking_layers), output_dim=output_dim, dtype=dtype)
