"""wav2vec 2.0 model family, TPU-native.

Re-design of /root/reference/audio8/wav2vec2.py for JAX/XLA:

- channel-last activations; all masking on-device (jax.random), no host
  round-trips in the step (the reference builds masks in NumPy per step,
  wav2vec2.py:937-938);
- the pretraining masked-position gather is a *static-width* gather
  (`compact_mask_indices`) with a validity mask instead of the reference's
  dynamic boolean indexing (wav2vec2.py:946), so one XLA program serves
  every batch;
- negative sampling runs on-device (the reference round-trips
  ``np.random.randint`` per step, wav2vec2.py:967-968);
- freeze/unfreeze is ``stop_gradient`` under a static flag rather than
  ``torch.no_grad`` context juggling (wav2vec2.py:697,767).

Structure map to the reference (for parity review):
  ConvFeatureExtractor      <- ConvFeatureExtractionModel (399-456)
  GumbelVectorQuantizer     <- GumbelVectorQuantizer      (459-576)
  AudioTransformerEncoder   <- AudioTransformerEncoder    (579-646)
  Wav2Vec2Encoder           <- Wav2Vec2Encoder            (649-723)
  Wav2Vec2AcousticModel     <- Wav2Vec2AcousticModel      (726-770)
  Wav2Vec2PooledEncoder     <- Wav2Vec2PooledEncoder      (773-868)
  Wav2Vec2Model             <- Wav2Vec2Model              (871-952)
  wav2vec2_pretrain_loss    <- Wav2Vec2Loss + Sampler     (371-396, 955-976)
"""
from __future__ import annotations

import itertools
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio8_tpu.config import (
    AcousticConfig,
    EncoderConfig,
    PooledConfig,
    PretrainConfig,
    DIVERSITY_WGT,
    XE_WGT,
    conv_output_length,
)
from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import (Conv1D, Dense, GroupNorm, LayerNorm,
                                  PositionalConv, StackedPositionalConv, gelu)
from audio8_tpu.nn.pooling import Reduction
from audio8_tpu.nn.transformer import TransformerEncoderStack
from audio8_tpu.ops.masks import compact_mask_indices, num_spans, span_mask

Dtype = Any


class ConvFeatureExtractor(nn.Module):
    """Strided conv stack: raw waveform (B, T) -> frames (B, T', C).

    ``mode='group'`` matches the reference layout (conv -> dropout ->
    [GroupNorm on block 0] -> GELU; kaiming init, no conv bias;
    wav2vec2.py:399-456). ``mode='layer'`` is the fairseq/HF
    'layer-norm' extractor used by the LV-60/XLSR large topology
    (per-block channel LayerNorm after every conv, usually with conv
    bias) — an extension beyond the reference, which is group-only."""

    conv_features: tuple
    dropout: float = 0.0
    conv_bias: bool = False
    mode: str = "group"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 input_lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``input_lengths``: optional per-row valid sample counts. When
        given, the block-0 GroupNorm computes statistics over valid frames
        only, so a row's features are identical however much zero-padding
        its batch carries (torch GroupNorm — and hence the reference, which
        pads to batch max — lets padding shift the statistics; see
        docs/PARITY.md)."""
        x = x[..., None].astype(self.dtype)  # (B, T, 1)
        for i, (dim, k, stride) in enumerate(self.conv_features):
            x = Conv1D(
                features=dim, kernel_size=k, stride=stride, use_bias=self.conv_bias,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv_{i}",
            )(x)
            if self.dropout > 0:
                x = Dropout(self.dropout)(x, deterministic=not train)
            if self.mode == "layer":
                # per-frame channel LayerNorm: padding-invariant by
                # construction (no cross-frame statistics)
                x = LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                              name=f"ln_{i}")(x)
            elif i == 0:
                mask = None
                if input_lengths is not None:
                    valid = jnp.maximum(
                        (input_lengths - k) // stride + 1, 0)
                    mask = jnp.arange(x.shape[1])[None, :] < valid[:, None]
                x = GroupNorm(
                    num_groups=dim, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="norm_0",
                )(x, mask)
            x = gelu(x)
        return x


class GumbelVectorQuantizer(nn.Module):
    """Gumbel-softmax vector quantizer (wav2vec2.py:459-576).

    Codebook ``vars`` is (G*V, vq_dim/G) with uniform[0,1) init; the
    projection is N(0,1)/zero-bias (wav2vec2.py:481-487). Train mode uses
    hard (straight-through) Gumbel-softmax at the given temperature; eval
    uses argmax one-hots.

    Perplexity follows fairseq wav2vec2: per-group soft perplexity summed
    over groups (range [G, G*V]) so the diversity term can reach 0. (The
    reference pools all groups into one distribution, wav2vec2.py:553-554 —
    a deviation from fairseq that caps its own diversity loss; deliberate
    fix, see SURVEY.md §7 "quirks".)
    """

    input_dim: int
    num_vars: int
    num_groups: int
    vq_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.vq_dim % self.num_groups == 0
        var_dim = self.vq_dim // self.num_groups
        self.vars = self.param(
            "vars", nn.initializers.uniform(scale=1.0),
            (self.num_groups * self.num_vars, var_dim), self.param_dtype,
        )
        self.weight_proj = Dense(
            self.num_groups * self.num_vars,
            kernel_init=nn.initializers.normal(stddev=1.0),
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        temperature: jnp.ndarray | float = 1.0,
        train: bool = False,
        valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, M, input_dim); valid: optional (B, M) bool weighting for
        the perplexity statistics. Returns (quantized (B, M, vq_dim),
        prob_ppl scalar)."""
        b, m, _ = x.shape
        g, v = self.num_groups, self.num_vars
        logits = self.weight_proj(x).reshape(b, m, g, v).astype(jnp.float32)

        probs = jax.nn.softmax(logits, axis=-1)
        if valid is None:
            avg_probs = jnp.mean(probs.reshape(b * m, g, v), axis=0)
        else:
            w = valid.reshape(b * m, 1, 1).astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            avg_probs = jnp.sum(probs.reshape(b * m, g, v) * w, axis=0) / denom
        # sum over groups of exp(entropy): soft codebook perplexity
        prob_ppl = jnp.sum(
            jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
        )

        if train:
            from audio8_tpu.ops.hashrand import hash_gumbel, seed_from_key

            key = self.make_rng("gumbel")
            gumbels = hash_gumbel(logits.shape, seed_from_key(key))
            y_soft = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
            index = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(index, v, dtype=jnp.float32)
            # straight-through estimator
            one_hot = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
        else:
            index = jnp.argmax(logits, axis=-1)
            one_hot = jax.nn.one_hot(index, v, dtype=jnp.float32)

        codebook = self.vars.astype(jnp.float32).reshape(g, v, -1)
        quantized = jnp.einsum(
            "bmgv,gvd->bmgd", one_hot, codebook, preferred_element_type=jnp.float32
        ).reshape(b, m, self.vq_dim)
        return quantized.astype(self.dtype), prob_ppl

    # ---- codebook enumeration utilities (wav2vec2.py:499-533) ----

    def codebook_indices(self) -> np.ndarray:
        """All G-tuples of per-group codeword rows, flattened row indices
        into ``vars`` — (V**G * G,)."""
        inds = np.array(
            list(itertools.product(*[range(self.num_vars)] * self.num_groups)),
            dtype=np.int64,
        )
        for b in range(1, self.num_groups):
            inds[:, b] += self.num_vars * b
        return inds.reshape(-1)

    def codebook(self) -> jnp.ndarray:
        """(V**G, vq_dim) table of every composite codeword."""
        idx = jnp.asarray(self.codebook_indices())
        return jnp.take(self.vars, idx, axis=0).reshape(
            self.num_vars ** self.num_groups, -1
        )

    def sample_from_codebook(self, key, b: int, n: int) -> jnp.ndarray:
        idx = self.codebook_indices().reshape(-1, self.num_groups)
        cb_size = idx.shape[0]
        assert n < cb_size, f"sample size {n} >= codebook size {cb_size}"
        sample = jax.random.randint(key, (b * n,), 0, cb_size)
        rows = jnp.take(jnp.asarray(idx), sample, axis=0).reshape(-1)
        return jnp.take(self.vars, rows, axis=0).reshape(b, n, -1)

    def to_codebook_index(self, indices: jnp.ndarray) -> jnp.ndarray:
        """(..., G) per-group indices -> (...,) composite codebook index."""
        res = jnp.zeros(indices.shape[:-1], indices.dtype)
        for i in range(self.num_groups):
            exponent = self.num_groups - i - 1
            res = res + indices[..., i] * (self.num_vars ** exponent)
        return res


class AudioTransformerEncoder(nn.Module):
    """Conv positional embedding + transformer stack (wav2vec2.py:579-646).

    ``pre_norm=False`` (default) is the reference's post-norm layout:
    LayerNorm after pos-conv, post-norm layers. ``pre_norm=True`` is the
    fairseq/HF 'stable layer norm' (LV-60/XLSR) layout: pre-norm layers
    with the LayerNorm applied once after the stack (the stack's
    ``ln_out``) — beyond the reference, which is post-norm only."""

    d_model: int
    num_heads: int
    num_layers: int
    dropout: float = 0.1
    attention_dropout: Optional[float] = None
    d_ff: Optional[int] = None
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    # >1 selects the data2vec-audio positional stack (N unnormalized
    # grouped convs + affine-less LN + GELU) instead of the single
    # weight-normed wav2vec2 pos-conv
    pos_conv_depth: int = 1
    # WavLM gated relative position bias (shared bucket table + per-layer
    # gates; see nn.transformer.RelativePositionBias)
    gated_rel_pos: bool = False
    rel_pos_buckets: int = 320
    rel_pos_max_distance: int = 800
    # wav2vec2-conformer: 'conformer' swaps the transformer stack for
    # conformer blocks (no pos-conv; see nn/conformer.py)
    encoder_type: str = "transformer"
    position_embeddings_type: str = "relative"
    conv_depthwise_kernel_size: int = 31
    rotary_base: float = 10000.0
    conformer_activation: str = "swish"
    layer_drop: float = 0.0
    pre_norm: bool = False
    flash_attention: bool = False
    fused_attention: object = None  # None | True (core) | "block"
    bf16_softmax: bool = True
    packed_qkv: bool = False
    remat: bool = False
    sequence_parallel: bool = False
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_every: int = 2
    # >0: block-causal streaming attention — frame i attends only to
    # frames in its own chunk (of this many frames) and earlier chunks
    # (optionally capped at causal_left_chunks). Streamable encoders
    # need extractor_mode='layer' (the group-mode instance norm
    # normalizes over the whole time axis) and tolerate the pos-conv's
    # one-sided lookahead of ~conv_pos_kernel/2 frames.
    causal_chunk_frames: int = 0
    causal_left_chunks: int = -1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.encoder_type == "conformer":
            # conformer: positions live INSIDE the attention (rotary/XL
            # relative); HF's conformer encoder never applies a pos-conv
            # (see nn/conformer.py docstring) and layer-norms after the
            # stack only
            from audio8_tpu.nn.conformer import ConformerEncoderStack

            self.transformer = ConformerEncoderStack(
                num_heads=self.num_heads, d_model=self.d_model,
                num_layers=self.num_layers,
                d_ff=self.d_ff or 4 * self.d_model,
                position_embeddings_type=self.position_embeddings_type,
                rotary_base=self.rotary_base,
                conv_kernel_size=self.conv_depthwise_kernel_size,
                activation=self.conformer_activation,
                dropout_rate=self.dropout,
                attention_dropout=self.attention_dropout,
                layer_drop=self.layer_drop, remat=self.remat, **dd,
            )
            return
        if self.pos_conv_depth > 1:
            self.pos_conv = StackedPositionalConv(
                features=self.d_model, depth=self.pos_conv_depth,
                kernel_size=self.conv_pos_kernel,
                groups=self.conv_pos_groups, **dd,
            )
        else:
            self.pos_conv = PositionalConv(
                features=self.d_model, kernel_size=self.conv_pos_kernel,
                groups=self.conv_pos_groups, dropout_rate=self.dropout, **dd,
            )
        if not self.pre_norm:
            self.ln = LayerNorm(**dd)
        self.drop = Dropout(self.dropout)
        self.transformer = TransformerEncoderStack(
            num_heads=self.num_heads, d_model=self.d_model,
            num_layers=self.num_layers, d_ff=self.d_ff or 4 * self.d_model,
            dropout_rate=self.dropout, attention_dropout=self.attention_dropout,
            activation="gelu", pre_norm=self.pre_norm,
            layer_drop=self.layer_drop, flash=self.flash_attention,
            fused_attention=self.fused_attention,
            bf16_softmax=self.bf16_softmax, packed_qkv=self.packed_qkv,
            remat=self.remat,
            seq_shard=self.sequence_parallel,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_every=self.moe_every,
            gated_rel_pos=self.gated_rel_pos,
            rel_pos_buckets=self.rel_pos_buckets,
            rel_pos_max_distance=self.rel_pos_max_distance, **dd,
        )

    def pre_stack(self, x, pad_mask=None, train: bool = False):
        """Everything before the transformer stack: zero padded frames,
        add positional conv, (post-norm) LayerNorm, dropout. Returns
        (x, attn_mask) — the exact stack input, so pipeline-parallel
        execution (parallel/pipeline.py) can run the layers itself."""
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0)
        attn_mask = None if pad_mask is None else pad_mask[:, None, None, :]
        if self.causal_chunk_frames > 0:
            t = x.shape[1]
            cid = jnp.arange(t) // self.causal_chunk_frames
            ok = cid[None, :] <= cid[:, None]  # no future chunks
            if self.causal_left_chunks >= 0:
                ok &= cid[None, :] >= cid[:, None] - self.causal_left_chunks
            chunk_mask = ok[None, None, :, :]
            attn_mask = (chunk_mask if attn_mask is None
                         else attn_mask & chunk_mask)
        if self.encoder_type == "conformer":
            return x, attn_mask
        x = x + self.pos_conv(x)
        if not self.pre_norm:
            x = self.ln(x)
        x = self.drop(x, deterministic=not train)
        return x, attn_mask

    def __call__(self, x, pad_mask=None, train: bool = False,
                 return_hiddens: bool = False):
        x, attn_mask = self.pre_stack(x, pad_mask, train)
        if self.encoder_type == "conformer":
            assert not return_hiddens, "hiddens: transformer stack only"
            return self.transformer(x, attn_mask, deterministic=not train)
        return self.transformer(x, attn_mask, deterministic=not train,
                                return_hiddens=return_hiddens)


def downsample_lengths(input_lengths: jnp.ndarray, t_samples: int, t_frames: int) -> jnp.ndarray:
    """Sample-level lengths -> frame-level lengths with the reference's
    reshape-all() semantics (wav2vec2.py:703-708): a frame is valid iff all
    ``ratio`` samples in its window are valid, ratio = T_samples // T'."""
    ratio = max(t_samples // max(t_frames, 1), 1)
    return jnp.minimum(input_lengths // ratio, t_frames)


class Wav2Vec2Encoder(nn.Module):
    """Downstream encoder: conv features -> LN -> proj -> (train-time
    masking) -> transformer (wav2vec2.py:649-723)."""

    config: EncoderConfig
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
            conv_pos_kernel=cfg.conv_pos_kernel, conv_pos_groups=cfg.conv_pos_groups,
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
            fused_attention=cfg.fused_attention,
            bf16_softmax=cfg.bf16_softmax, packed_qkv=cfg.packed_qkv,
            remat=cfg.remat,
            sequence_parallel=cfg.sequence_parallel,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_every=cfg.moe_every,
            causal_chunk_frames=cfg.causal_chunk_frames,
            causal_left_chunks=cfg.causal_left_chunks, **dd)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (cfg.d_model,),
            self.param_dtype)
        self.dropout_input = Dropout(cfg.dropout_input)
        self.dropout_features = Dropout(cfg.dropout_features)

    def _features(self, x, input_lengths=None, train: bool = False):
        """Conv features -> LN -> proj -> train-time masking: the encoder
        up to (not including) the transformer. Returns (features, pad_mask)."""
        cfg = self.config
        fx = self.feature_extractor(x, train, input_lengths=input_lengths)
        if cfg.freeze_fx:
            fx = jax.lax.stop_gradient(fx)
        features = self.layer_norm(fx)

        pad_mask = None
        if input_lengths is not None:
            frame_lengths = downsample_lengths(input_lengths, x.shape[1], features.shape[1])
            pad_mask = jnp.arange(features.shape[1])[None, :] < frame_lengths[:, None]

        features = self.proj_to_input(features)
        b, t, c = features.shape
        features = self.dropout_input(features, deterministic=not train)
        if train and cfg.timestep_masking > 0.0:
            tm = span_mask(self.make_rng("mask"), b, t, cfg.timestep_masking,
                           cfg.timestep_mask_len)
            features = jnp.where(tm[..., None], self.mask_emb.astype(features.dtype), features)
        if train and cfg.channel_masking > 0.0:
            cm = span_mask(self.make_rng("mask"), b, c, cfg.channel_masking,
                           cfg.channel_mask_len)
            features = jnp.where(cm[:, None, :], 0.0, features)
        return features, pad_mask

    def pre_transformer(self, x, input_lengths=None, train: bool = False):
        """Everything before the transformer stack's layer loop — the
        pipeline-parallel split point (parallel/pipeline.py). Returns
        (stack_input, attn_mask, pad_mask)."""
        features, pad_mask = self._features(x, input_lengths, train)
        h, attn_mask = self.encoder.pre_stack(features, pad_mask, train)
        return h, attn_mask, pad_mask

    def __call__(self, x, input_lengths=None, train: bool = False):
        features, pad_mask = self._features(x, input_lengths, train)
        x = self.encoder(features, pad_mask, train)
        return x, pad_mask


class Wav2Vec2AcousticModel(nn.Module):
    """Encoder + CTC projection head -> log-probs (wav2vec2.py:726-770).

    ``freeze`` (static) stops gradients into the encoder (the reference's
    ``self.freeze`` no_grad toggle flipped at unfreeze_enc_after_step)."""

    config: AcousticConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Wav2Vec2Encoder(
            config=self.config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.proj = Dense(self.config.num_labels, dtype=self.dtype,
                          param_dtype=self.param_dtype)

    def __call__(self, x, input_lengths=None, train: bool = False, freeze: bool = True):
        encoded, pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            encoded = jax.lax.stop_gradient(encoded)
        logits = self.proj(encoded).astype(jnp.float32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, pad_mask

    # -- pipeline-parallel split points (parallel/pipeline.py): the model
    # up to the transformer layer loop, and the head after it. The layer
    # loop itself runs outside the module, GPipe-scheduled over the
    # 'pipe' mesh axis.
    def pipeline_pre(self, x, input_lengths=None, train: bool = False):
        return self.encoder.pre_transformer(x, input_lengths, train)

    def pipeline_head(self, encoded):
        logits = self.proj(encoded).astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)


class Wav2Vec2PooledEncoder(nn.Module):
    """Encoder + optional projection + utterance reduction
    (wav2vec2.py:773-868)."""

    config: PooledConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Wav2Vec2Encoder(config=cfg, dtype=self.dtype,
                                       param_dtype=self.param_dtype)
        self.out_dim = cfg.final_output_dim or cfg.d_model
        if cfg.final_output_dim:
            self.proj_layer = Dense(cfg.final_output_dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.reduction = Reduction(
            reduction_type=cfg.reduction_type, d_model=self.out_dim,
            d_k=cfg.reduction_d_k, dropout_rate=cfg.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype)

    @property
    def output_dim(self):
        return self.out_dim

    def __call__(self, x, input_lengths=None, train: bool = False, freeze: bool = True):
        encoded, pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            encoded = jax.lax.stop_gradient(encoded)
        if self.config.final_output_dim:
            encoded = self.proj_layer(encoded)
        if pad_mask is None:
            pad_mask = jnp.ones(encoded.shape[:2], jnp.bool_)
        return self.reduction(encoded, pad_mask, deterministic=not train)


class Wav2Vec2Model(nn.Module):
    """Contrastive pretraining model (wav2vec2.py:871-952).

    Assumes dense (un-padded) min-cropped batches like the reference
    (docstring wav2vec2.py:872-877). Returns static-shape tensors:

      context_masked (B, M, final_dim)  final_proj of context at masked slots
      targets_masked (B, M, final_dim)  project_q(quantizer(features)) there
      prob_ppl       scalar             soft codebook perplexity
      valid          (B, M) bool        which of the M slots are real
    where M = num_spans(T', p, L) * L is the static masked-slot capacity.
    """

    config: PretrainConfig
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
        self.quantizer = GumbelVectorQuantizer(
            input_dim=cfg.fx_dim, num_vars=cfg.num_vq_vars,
            num_groups=cfg.num_vq_groups, vq_dim=cfg.final_dim, **dd)
        self.encoder = AudioTransformerEncoder(
            d_model=cfg.d_model, num_heads=cfg.num_heads,
            num_layers=cfg.num_layers, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout, d_ff=cfg.d_ff,
            conv_pos_kernel=cfg.conv_pos_kernel, conv_pos_groups=cfg.conv_pos_groups,
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
            fused_attention=cfg.fused_attention,
            bf16_softmax=cfg.bf16_softmax, packed_qkv=cfg.packed_qkv,
            remat=cfg.remat,
            sequence_parallel=cfg.sequence_parallel,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_every=cfg.moe_every,
            causal_chunk_frames=cfg.causal_chunk_frames,
            causal_left_chunks=cfg.causal_left_chunks, **dd)
        self.project_q = Dense(cfg.final_dim, **dd)
        self.final_proj = Dense(cfg.final_dim, **dd)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (cfg.d_model,),
            self.param_dtype)
        self.dropout_input = Dropout(cfg.dropout_input)
        self.dropout_features = Dropout(cfg.dropout_features)

    def __call__(self, x, train: bool = False, temperature: float | jnp.ndarray = 2.0):
        cfg = self.config
        fx = self.feature_extractor(x, train)
        features = self.layer_norm(fx)
        unmasked_features = features
        features = self.proj_to_input(features)
        b, t, _ = features.shape
        features = self.dropout_input(features, deterministic=not train)
        unmasked_features = self.dropout_features(unmasked_features, deterministic=not train)

        time_mask = span_mask(self.make_rng("mask"), b, t,
                              cfg.timestep_masking, cfg.timestep_mask_len)
        features = jnp.where(time_mask[..., None], self.mask_emb.astype(features.dtype), features)
        if train and cfg.channel_masking > 0.0:
            # channel span masking zeroes feature channels across time.
            # (The reference's equivalent branch is shape-broken and dead by
            # default, wav2vec2.py:941-944 — implemented properly here.)
            cm = span_mask(self.make_rng("mask"), b, features.shape[-1],
                           cfg.channel_masking, cfg.channel_mask_len)
            features = jnp.where(cm[:, None, :], 0.0, features)

        capacity = num_spans(t, cfg.timestep_masking, cfg.timestep_mask_len) * cfg.timestep_mask_len
        idx, valid = compact_mask_indices(time_mask, capacity)

        y = jnp.take_along_axis(unmasked_features, idx[..., None], axis=1)  # (B, M, fx)
        context = self.encoder(features, None, train)
        quantized, prob_ppl = self.quantizer(y, temperature, train, valid)
        targets_masked = self.project_q(quantized)
        context_masked = self.final_proj(jnp.take_along_axis(context, idx[..., None], axis=1))
        return context_masked, targets_masked, prob_ppl, valid


def sample_negative_indices(
    key: jax.Array, batch: int, slots: int, n_negatives: int, valid_counts: jnp.ndarray
) -> jnp.ndarray:
    """In-utterance negative slot sampling (Sampler, wav2vec2.py:955-976).

    For each (b, m, n): draw uniformly from the row's valid slots excluding
    m itself via the draw-from-[0, vc-1)-then-shift trick the reference uses
    (wav2vec2.py:967-969), fully on-device. Returns (B, M, N) int32 slot ids.
    """
    from audio8_tpu.ops.hashrand import hash_randint, seed_from_key

    vc = jnp.maximum(valid_counts[:, None, None], 2)  # (B,1,1); degenerate rows self-sample
    r = hash_randint((batch, slots, n_negatives), seed_from_key(key), vc - 1)
    own = jnp.arange(slots)[None, :, None]
    r = r + (r >= own)
    return jnp.minimum(r, vc - 1).astype(jnp.int32)


def _select_negatives(sims: jnp.ndarray, neg_idx: jnp.ndarray,
                      mode: str) -> jnp.ndarray:
    """Pick negative similarities sims[b, m, neg_idx[b, m, n]] -> (B, M, N).

    mode="gather" is the direct formulation (take_along_axis). On TPU its
    lane-axis gather lowers to a serialized per-element fusion and the
    backward to a scatter-add — profiled at 3.2 + 2.2 ms/step at the
    pretrain bench shape, the two largest non-matmul ops in the program
    (docs/PERF.md round 3). mode="onehot" computes the same values as a
    dense one-hot contraction: forward and backward are regular
    broadcast-compare-multiply-reduce fusions the VPU streams at full
    width. Each (b, m, n) row of the one-hot has exactly one nonzero, so
    the contraction is *bit-exact* vs the gather (no reassociation: one
    term per output), and the backward matches scatter-add semantics.
    """
    if mode == "gather":
        return jnp.take_along_axis(sims, neg_idx, axis=2)
    if mode == "onehot":
        m = sims.shape[-1]
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, m), 3)
        oh = neg_idx[..., None] == slot  # (B, M, N, M) bool, fused
        return jnp.sum(jnp.where(oh, sims[:, :, None, :], 0.0), axis=-1)
    raise ValueError(f"unknown neg_lookup mode: {mode!r}")


# Captured ONCE at import so a mutated environment can't silently change
# the compiled program between retraces; pass neg_lookup= explicitly to
# override per-call.
_NEG_LOOKUP_ENV = os.environ.get("A8T_NEG_LOOKUP")


_NEG_LOOKUP_LOGGED = False


def _default_neg_lookup() -> str:
    """onehot on TPU (where the lane-axis gather serializes — see
    _select_negatives), gather elsewhere: on CPU/GPU take_along_axis is a
    native gather and the dense (B, M, N, M) contraction would do O(M)
    times the work. Logs the selected mode once (and bench.py asserts
    'onehot' on TPU hardware) so a silent hot-path flip — a ~10%
    regression — is loud."""
    global _NEG_LOOKUP_LOGGED
    dev = jax.devices()[0]
    if _NEG_LOOKUP_ENV is not None:
        mode = _NEG_LOOKUP_ENV
    else:
        # platform is "tpu" natively but e.g. "axon" through the TPU
        # relay; device_kind ("TPU v5 lite") identifies the hardware
        is_tpu = "tpu" in f"{dev.platform} {dev.device_kind}".lower()
        mode = "onehot" if is_tpu else "gather"
    if not _NEG_LOOKUP_LOGGED:
        _NEG_LOOKUP_LOGGED = True
        import logging

        logging.getLogger(__name__).info(
            "InfoNCE neg_lookup mode: %s (platform=%s, device_kind=%s%s)",
            mode, dev.platform, dev.device_kind,
            ", from A8T_NEG_LOOKUP" if _NEG_LOOKUP_ENV is not None else "")
    return mode


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    # rsqrt of the CLAMPED squared norm: sqrt'(0) = inf makes the naive
    # sqrt-then-max form produce 0*inf = NaN gradients at exactly-zero
    # vectors (hit by fully-padded rows in the HuBERT loss); this form is
    # numerically identical for ||x|| > eps and has finite grads at 0
    norm2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(norm2, eps * eps))


def wav2vec2_pretrain_loss(
    context_masked: jnp.ndarray,
    targets_masked: jnp.ndarray,
    prob_ppl: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    n_vars: int,
    n_negatives: int = 100,
    neg_lookup: str | None = None,
):
    """InfoNCE + diversity loss (Wav2Vec2Loss, wav2vec2.py:371-396).

    logits are cosine similarities between the masked-position context and
    [positive target; sampled negative targets]; cross-entropy against index
    0, averaged over valid slots; plus DIVERSITY_WGT*(n_vars - ppl)/n_vars.
    Returns (loss, metrics dict).

    TPU-first formulation: cosine similarity is bilinear in the normalized
    vectors, so ALL pairwise sims are one (M, M) MXU matmul per utterance
    and negatives gather scalars from it. The reference's layout
    (gather (N, B, T, C) candidate *vectors* then reduce,
    wav2vec2.py:383-385) would make the backward pass a huge scatter-add —
    O(N*C) more HBM traffic for identical math.
    """
    b, m, c = context_masked.shape
    vc = jnp.sum(valid, axis=-1)
    neg_idx = sample_negative_indices(key, b, m, n_negatives, vc)  # (B,M,N)

    c_hat = _l2_normalize(context_masked.astype(jnp.float32))
    t_hat = _l2_normalize(targets_masked.astype(jnp.float32))
    sims = jnp.einsum("bmc,bnc->bmn", c_hat, t_hat,
                      preferred_element_type=jnp.float32)  # (B, M, M)
    pos = jnp.diagonal(sims, axis1=1, axis2=2)  # (B, M)
    if neg_lookup is None:
        neg_lookup = _default_neg_lookup()
    negs = _select_negatives(sims, neg_idx, neg_lookup)  # (B, M, N) scalars
    logits = jnp.concatenate([pos[..., None], negs], axis=2)  # (B, M, 1+N)

    logz = jax.nn.logsumexp(logits, axis=-1)
    xe = logz - logits[..., 0]  # -log softmax[0]
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    xe_loss = jnp.sum(xe * w) / denom
    diversity = DIVERSITY_WGT * (n_vars - prob_ppl) / n_vars
    loss = XE_WGT * xe_loss + diversity

    correct = jnp.sum((jnp.argmax(logits, axis=-1) == 0) * w) / denom
    metrics = {
        "contrastive_loss": xe_loss,
        "diversity_loss": diversity,
        "code_perplexity": prob_ppl,
        "accuracy": correct,
    }
    return loss, metrics


class Wav2Vec2Loss:
    """Callable bundling negative sampling + InfoNCE, interface-parity with
    the reference's loss object (create_loss(n_vars, n_negatives),
    wav2vec2.py:371-396). Call with the model outputs and an rng key."""

    def __init__(self, n_vars: int, n_negatives: int = 100):
        self.n_vars = n_vars
        self.n_negatives = n_negatives

    def __call__(self, context_masked, targets_masked, prob_ppl, valid, key):
        return wav2vec2_pretrain_loss(
            context_masked, targets_masked, prob_ppl, valid, key,
            self.n_vars, self.n_negatives)


def create_loss(n_vars: int, n_negatives: int = 100) -> Wav2Vec2Loss:
    """Factory mirroring create_loss (wav2vec2.py:395-396)."""
    return Wav2Vec2Loss(n_vars, n_negatives)


def create_model(config: Optional[PretrainConfig] = None, dtype=jnp.float32, **kwargs) -> Wav2Vec2Model:
    """Factory mirroring create_model (wav2vec2.py:219-259)."""
    cfg = config or PretrainConfig(**kwargs)
    return Wav2Vec2Model(config=cfg, dtype=dtype)


def create_acoustic_model(num_labels: int, config: Optional[AcousticConfig] = None,
                          dtype=jnp.float32, **kwargs) -> Wav2Vec2AcousticModel:
    """Factory mirroring create_acoustic_model (wav2vec2.py:262-296)."""
    cfg = config or AcousticConfig(num_labels=num_labels, **kwargs)
    return Wav2Vec2AcousticModel(config=cfg, dtype=dtype)
