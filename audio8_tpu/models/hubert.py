"""HuBERT masked-prediction pretraining model (arXiv 2106.07447).

Beyond the reference (which can *load* HuBERT checkpoints via the model
zoo but has no HuBERT training objective): the encoder predicts offline
k-means cluster ids (cli/cluster_targets.py) at masked frames. TPU-first
choices:

- targets are generated on the acoustic conv stack's exact frame grid
  (data/mfcc.py WIN=400/HOP=320), so labels align 1:1 with encoder
  frames — no label-rate resampling, no dynamic gathers;
- logits are computed at ALL frames as one (B, T', K) cosine matmul
  against the label-embedding table and the masked/unmasked split is a
  weighting in the loss — fully static shapes, no boolean compaction
  (fairseq gathers masked frames host-style; the XLA-friendly form is
  the weighted dense loss);
- the span mask reuses ops/masks.span_mask (the same on-device masking
  the wav2vec2 path uses).

The param tree deliberately mirrors ``Wav2Vec2Encoder`` (same
feature_extractor / layer_norm / proj_to_input / mask_emb / encoder
names), so a HuBERT-pretrained tree warm-starts the downstream CTC /
pooled models exactly like a wav2vec2-pretrained one.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import HubertPretrainConfig
from audio8_tpu.models.wav2vec2 import (
    AudioTransformerEncoder, ConvFeatureExtractor, downsample_lengths,
    _l2_normalize,
)
from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense, LayerNorm
from audio8_tpu.ops.masks import span_mask

Dtype = Any


class HubertPretrainModel(nn.Module):
    config: HubertPretrainConfig
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
            encoder_type=cfg.encoder_type,
            position_embeddings_type=cfg.position_embeddings_type,
            conv_depthwise_kernel_size=cfg.conv_depthwise_kernel_size,
            rotary_base=cfg.rotary_base,
            conformer_activation=cfg.conformer_activation,
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
        self.final_proj = Dense(cfg.final_dim, **dd)
        # cluster codebook (fairseq label_embs_concat): cosine similarity
        # against these rows forms the prediction logits
        self.label_embs = self.param(
            "label_embs", nn.initializers.uniform(scale=1.0),
            (cfg.num_clusters, cfg.final_dim), self.param_dtype)
        self.dropout_input = Dropout(cfg.dropout_input)

    def __call__(self, x: jnp.ndarray,
                 input_lengths: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """(B, T) audio -> (logits (B, T', K), time_mask (B, T') bool,
        pad_mask (B, T') bool or None).

        The span mask is applied whenever ``timestep_masking > 0`` (also
        at eval — the validation metric is masked-prediction accuracy),
        so callers must provide a ``mask`` RNG; ``train`` gates dropout
        only.
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

        if cfg.timestep_masking > 0.0:
            time_mask = span_mask(self.make_rng("mask"), b, t,
                                  cfg.timestep_masking, cfg.timestep_mask_len)
            features = jnp.where(time_mask[..., None],
                                 self.mask_emb.astype(features.dtype),
                                 features)
        else:
            time_mask = jnp.zeros((b, t), bool)
        if train and cfg.channel_masking > 0.0:
            cm = span_mask(self.make_rng("mask"), b, features.shape[-1],
                           cfg.channel_masking, cfg.channel_mask_len)
            features = jnp.where(cm[:, None, :], 0.0, features)

        context = self.encoder(features, pad_mask, train)
        proj = _l2_normalize(self.final_proj(context).astype(jnp.float32))
        codes = _l2_normalize(self.label_embs.astype(jnp.float32))
        logits = proj @ codes.T / cfg.logit_temp  # (B, T', K) cosine
        return logits, time_mask, pad_mask


def hubert_pretrain_loss(logits: jnp.ndarray, time_mask: jnp.ndarray,
                         pad_mask: Optional[jnp.ndarray],
                         targets: jnp.ndarray, target_lengths: jnp.ndarray,
                         pred_masked_weight: float = 1.0,
                         pred_unmasked_weight: float = 0.0):
    """Masked-prediction cross-entropy over frame cluster ids.

    ``targets`` is (B, U) int32 padded with -1 (datasets TGT_KM); U is
    statically padded/sliced to T'. A frame contributes when it has a
    real label, sits inside the pad mask, and gets the masked/unmasked
    weight per fairseq's pred_masked_weight/pred_nomask_weight.
    Returns (loss, metrics) with masked-accuracy like fairseq's
    correct_m/count_m.
    """
    b, t, k = logits.shape
    u = targets.shape[1]
    if u < t:
        targets = jnp.pad(targets, ((0, 0), (0, t - u)), constant_values=-1)
    else:
        targets = targets[:, :t]
    has_label = (targets >= 0) & (
        jnp.arange(t)[None, :] < jnp.minimum(target_lengths, t)[:, None])
    if pad_mask is not None:
        has_label &= pad_mask

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, k - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]

    w = has_label * (pred_masked_weight * time_mask
                     + pred_unmasked_weight * (~time_mask))
    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum(nll * w) / denom

    pred = jnp.argmax(logits, axis=-1)
    m = has_label & time_mask
    correct_m = jnp.sum((pred == tgt) & m)
    count_m = jnp.maximum(jnp.sum(m), 1)
    metrics = {"acc_masked": correct_m / count_m,
               "n_masked": jnp.sum(m).astype(jnp.float32)}
    return loss, metrics
