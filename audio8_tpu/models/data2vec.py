"""data2vec-audio masked-regression pretraining (arXiv 2202.03555).

Beyond the reference (which has no data2vec objective): the *student*
sees span-masked features and predicts, at the masked frames, the
*teacher's* representation of the unmasked audio — where the teacher is
an exponential moving average of the student's own weights and the
regression target is the instance-normalized average of its top-k
transformer-layer outputs. With the HuBERT and contrastive objectives
this completes all three pretraining recipes of the model zoo.

TPU-first shape of the implementation:

- one module serves both roles: ``mask`` / ``collect_hiddens`` are
  static flags, so the jitted train step applies it twice (student with
  masking, teacher under ``stop_gradient`` with per-layer outputs) and
  XLA compiles a single fused program — no separate teacher graph;
- the EMA update is a pure tree_map folded into the same step;
- targets/losses are dense with a masked weighting (no boolean
  compaction), like the HuBERT loss.

The param tree mirrors ``Wav2Vec2Encoder`` (+ ``final_proj``), so a
data2vec-pretrained run warm-starts CTC fine-tuning like any other
family, and the topology knobs (incl. ``pos_conv_depth=5`` to train the
actual data2vec-audio layout) come from the shared EncoderConfig.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import Data2VecPretrainConfig
from audio8_tpu.models.wav2vec2 import (
    AudioTransformerEncoder, ConvFeatureExtractor, downsample_lengths,
)
from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense, LayerNorm
from audio8_tpu.ops.masks import span_mask

Dtype = Any


class Data2VecAudioModel(nn.Module):
    config: Data2VecPretrainConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.feature_extractor = ConvFeatureExtractor(
            conv_features=tuple(cfg.conv_features), mode=cfg.extractor_mode,
            conv_bias=cfg.conv_bias, **dd)
        self.layer_norm = LayerNorm(**dd)
        self.proj_to_input = Dense(cfg.d_model, **dd)
        self.encoder = AudioTransformerEncoder(
            d_model=cfg.d_model, num_heads=cfg.num_heads,
            num_layers=cfg.num_layers, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout, d_ff=cfg.d_ff,
            conv_pos_kernel=cfg.conv_pos_kernel,
            conv_pos_groups=cfg.conv_pos_groups,
            pos_conv_depth=cfg.pos_conv_depth,
            gated_rel_pos=cfg.gated_rel_pos,
            rel_pos_buckets=cfg.rel_pos_buckets,
            rel_pos_max_distance=cfg.rel_pos_max_distance,
            layer_drop=cfg.layer_drop, pre_norm=cfg.pre_norm,
            flash_attention=cfg.flash_attention,
            bf16_softmax=cfg.bf16_softmax, packed_qkv=cfg.packed_qkv,
            remat=cfg.remat,
            sequence_parallel=cfg.sequence_parallel,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_every=cfg.moe_every, **dd)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (cfg.d_model,),
            self.param_dtype)
        self.final_proj = Dense(cfg.d_model, **dd)
        self.dropout_input = Dropout(cfg.dropout_input)

    def __call__(self, x: jnp.ndarray,
                 input_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False, mask: bool = True,
                 collect_hiddens: bool = False):
        """Student role (default): (prediction (B, T', D), time_mask,
        pad_mask). Teacher role (``mask=False, collect_hiddens=True``):
        (hiddens [(B, T', D)] per layer, zero time_mask, pad_mask) — no
        RNGs needed.
        """
        cfg = self.config
        fx = self.feature_extractor(x, train, input_lengths=input_lengths)
        features = self.layer_norm(fx)
        features = self.proj_to_input(features)
        features = self.dropout_input(features, deterministic=not train)
        b, t, _ = features.shape

        pad_mask = None
        if input_lengths is not None:
            frame_lengths = downsample_lengths(input_lengths, x.shape[1], t)
            pad_mask = jnp.arange(t)[None, :] < frame_lengths[:, None]

        if mask and cfg.timestep_masking > 0.0:
            time_mask = span_mask(self.make_rng("mask"), b, t,
                                  cfg.timestep_masking, cfg.timestep_mask_len)
            features = jnp.where(time_mask[..., None],
                                 self.mask_emb.astype(features.dtype),
                                 features)
        else:
            time_mask = jnp.zeros((b, t), bool)

        if collect_hiddens:
            _, hiddens = self.encoder(features, pad_mask, train,
                                      return_hiddens=True)
            return hiddens, time_mask, pad_mask
        context = self.encoder(features, pad_mask, train)
        return self.final_proj(context), time_mask, pad_mask


def data2vec_targets(hiddens, k: int) -> jnp.ndarray:
    """Instance-normalize each of the top-k layer outputs over time (per
    sample, per channel — fairseq's F.instance_norm for the audio
    modality) and average, in f32."""
    acc = None
    for h in hiddens[-k:]:
        h = h.astype(jnp.float32)
        mu = jnp.mean(h, axis=1, keepdims=True)
        var = jnp.var(h, axis=1, keepdims=True)
        n = (h - mu) * jax.lax.rsqrt(var + 1e-5)
        acc = n if acc is None else acc + n
    return acc / k


def data2vec_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  time_mask: jnp.ndarray,
                  pad_mask: Optional[jnp.ndarray]):
    """Mean squared error over channels at masked valid frames, scaled
    by 1/sqrt(D) (fairseq loss_scale default), averaged over the masked
    frames. Also reports the target/prediction standard deviation at
    those frames — the standard representation-collapse monitors."""
    d = pred.shape[-1]
    w = time_mask if pad_mask is None else (time_mask & pad_mask)
    wf = w.astype(jnp.float32)
    diff2 = jnp.sum(
        (pred.astype(jnp.float32) - jax.lax.stop_gradient(target)) ** 2,
        axis=-1) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    denom = jnp.maximum(jnp.sum(wf), 1.0)
    loss = jnp.sum(diff2 * wf) / denom

    def masked_std(x):
        mu = jnp.sum(x * wf[..., None], axis=(0, 1)) / denom
        var = jnp.sum(((x - mu) ** 2) * wf[..., None], axis=(0, 1)) / denom
        return jnp.mean(jnp.sqrt(var + 1e-8))

    metrics = {"target_std": masked_std(target.astype(jnp.float32)),
               "pred_std": masked_std(pred.astype(jnp.float32)),
               "n_masked": jnp.sum(wf)}
    return loss, metrics


def ema_decay_schedule(step: jnp.ndarray, start: float, end: float,
                       anneal_steps: int) -> jnp.ndarray:
    """Linear anneal start -> end over anneal_steps (fairseq EMAModule)."""
    if anneal_steps <= 0:
        return jnp.asarray(end, jnp.float32)
    frac = jnp.clip(step.astype(jnp.float32) / anneal_steps, 0.0, 1.0)
    return start + (end - start) * frac


def ema_update(teacher, student, decay):
    """teacher <- decay * teacher + (1 - decay) * student, in f32."""
    return jax.tree_util.tree_map(
        lambda t, s: (t.astype(jnp.float32) * decay
                      + s.astype(jnp.float32) * (1.0 - decay)).astype(t.dtype),
        teacher, student)
