"""Typed configuration for the framework.

Replaces the reference's per-script argparse splatting (``**vars(args)``
into model factories, /root/reference/audio8/train.py:198) with explicit
dataclasses. CLI entry points parse flags into these.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

# Per-sample-rate conv feature stacks: (channels, kernel, stride), mirroring
# /root/reference/audio8/wav2vec2.py:26-29. 16 kHz total stride 320
# (receptive field 400 samples); 8 kHz total stride 160.
CONV_FEATURES = {
    16: [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2)],
    8: [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2)],
}

# Pretraining constants (/root/reference/audio8/wav2vec2.py:31-35)
START_TEMP = 2.0
END_TEMP = 0.5
TEMP_DECAY_FACTOR = 0.999995
XE_WGT = 0.1
DIVERSITY_WGT = 10.0


def conv_output_length(length: int, conv_features) -> int:
    """Exact output frame count of the strided conv stack for an input of
    ``length`` samples."""
    for _, k, s in conv_features:
        length = (length - k) // s + 1
    return length


def max_input_for_output(frames: int, conv_features) -> int:
    """Largest sample count whose conv output is exactly ``frames``.

    Exact inverse of :func:`conv_output_length`: per layer the largest
    preimage of output ``o`` is ``(o - 1) * s + k + (s - 1)``, and because
    every layer is monotone non-decreasing the per-layer maxima compose.
    """
    length = frames
    for _, k, s in reversed(conv_features):
        length = (length - 1) * s + k + (s - 1)
    return length


def lane_aligned_length(length: int, conv_features, multiple: int = 128,
                        max_crop: float = 0.1) -> int:
    """Snap an audio length (samples) DOWN so the conv stack emits a frame
    count that is a multiple of ``multiple`` (the TPU MXU lane width, 128).

    The encoder's attention score/AV matmuls are (T', T') x (T', d); XLA
    pads both T' dims up to the next 128-lane tile, so e.g. T'=546 computes
    640-wide tiles — ~37% padding FLOPs in the quadratic term. Cropping the
    clip so T' lands exactly on the tile boundary removes that waste while
    trimming only a few percent of (linear-cost) audio. The reference crops
    clips freely in its data layer too (/root/reference/audio8/data.py:439-480);
    this just picks TPU-shaped crop points.

    Lengths are returned UNCHANGED when snapping would crop more than
    ``max_crop`` of the frames (snapping T'=194 down to 128 would discard a
    third of the audio — worse for data efficiency than the tile padding it
    saves) or when T' < ``multiple`` (one tile regardless; snapping to zero
    would be invalid).
    """
    frames = conv_output_length(length, conv_features)
    target = (frames // multiple) * multiple
    if target <= 0 or target == frames:
        return length
    if (frames - target) / frames > max_crop:
        return length
    return max_input_for_output(target, conv_features)


def lane_aligned_pad(t_pad: int, max_audio: int, conv_features,
                     multiple: int = 128) -> int:
    """Clamp a PAD target so it never pushes the conv frame count across a
    128-lane MXU tile boundary that the data itself didn't require.

    Supervised batches pad UP (the audio is transcribed — cropping would
    drop labelled speech), so the lever differs from the pretrain-side
    :func:`lane_aligned_length` crop: given the batch's real ``max_audio``
    and the grid/round-up pad target ``t_pad``, the score/AV attention
    matmuls tile T' up to ``ceil(T'/128)*128`` lanes either way — but a pad
    target whose T' overshoots the boundary the data required adds a whole
    extra 128-wide tile of quadratic FLOPs for nothing (e.g. max_audio
    41,000 = T'127 = one tile, rounded up to 48,000 = T'149 = two tiles).
    When ``t_pad`` overshoots, return the LARGEST length whose frame count
    sits exactly on the data's boundary; otherwise return ``t_pad``
    unchanged (it is within the same tile set and costs less linear-term
    compute). Result is always >= ``max_audio``, and the emitted lengths
    stay a small static set (grid entries ∪ boundary preimages).
    """
    frames_needed = conv_output_length(max_audio, conv_features)
    # ceil to tile; at least one tile so degenerate sub-receptive-field
    # batches (frames_needed == 0) keep a valid, frame-producing pad
    boundary = max(multiple, -(-frames_needed // multiple) * multiple)
    if conv_output_length(t_pad, conv_features) <= boundary:
        return t_pad
    return max_input_for_output(boundary, conv_features)


def lane_aligned_chunk(length: int, conv_features, multiple: int = 128) -> int:
    """Snap a serving CHUNK window UP so its frame count sits exactly on a
    128-lane tile boundary.

    Chunk windows partition the waveform (ChunkedTranscriber), so unlike
    training batches there is nothing to pad or crop — the window size is a
    free choice, and any frames between T' and the tile boundary XLA pads
    to are FLOPs the MXU burns either way. Snapping UP fills them with real
    audio: the default 480,000-sample (30 s) chunk computes 1536-wide tiles
    for 1499 real frames; 491,919 samples computes the same tiles for 1536
    real frames."""
    frames = conv_output_length(length, conv_features)
    boundary = max(multiple, -(-frames // multiple) * multiple)
    return max_input_for_output(boundary, conv_features)


def lane_aligned_grid(grid, conv_features, multiple: int = 128,
                      max_crop: float = 0.1):
    """Map a length grid through :func:`lane_aligned_length`, ascending and
    deduplicated. Grid entries whose T' already sits on a tile boundary, is
    below one tile, or is too far above the boundary (crop > ``max_crop``)
    pass through unchanged. When two adjacent entries would snap onto the
    SAME boundary preimage, the second keeps its original value instead —
    collapsing a grid level would compound the per-clip crop beyond the
    ``max_crop`` guard (a clip just under the next bucket would fall two
    levels instead of one)."""
    out = []
    for g in sorted(grid):
        a = lane_aligned_length(g, conv_features, multiple, max_crop)
        if a in out:
            a = g
        if a not in out:
            out.append(a)
    return out


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Wav2Vec2Encoder hyperparameters (downstream defaults;
    /root/reference/audio8/wav2vec2.py:660-694)."""

    sample_rate: int = 16
    d_model: int = 768
    num_heads: int = 12
    num_layers: int = 12
    dropout: float = 0.1
    # attention-probability dropout; None follows `dropout` (fairseq's
    # separate attention_dropout knob, default 0.1 for wav2vec2-base)
    attention_dropout: Optional[float] = None
    d_ff: Optional[int] = None
    dropout_input: float = 0.0
    dropout_features: float = 0.0
    timestep_masking: float = 0.5
    channel_masking: float = 0.1
    timestep_mask_len: int = 10
    channel_mask_len: int = 64
    layer_drop: float = 0.0
    freeze_fx: bool = True
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    # >1 = data2vec-audio positional stack (N plain grouped convs with
    # affine-less LN + GELU each, typically depth 5 / kernel 19) instead
    # of the single weight-normed wav2vec2 pos-conv
    pos_conv_depth: int = 1
    # >0: block-causal streaming attention (chunk of this many conv
    # frames; each frame attends to its own + earlier chunks, optionally
    # capped at causal_left_chunks). Use extractor_mode='layer' for a
    # truly streamable stack (group-mode instance norm is full-sequence).
    causal_chunk_frames: int = 0
    causal_left_chunks: int = -1
    # WavLM gated relative position bias: a bucketed T5-style bias table
    # shared across the stack, scaled per layer by a gate computed from
    # the attention inputs (arXiv 2110.13900)
    gated_rel_pos: bool = False
    rel_pos_buckets: int = 320
    rel_pos_max_distance: int = 800
    # wav2vec2-conformer (arXiv 2005.08100): 'conformer' swaps the
    # transformer stack for macaron conformer blocks with rotary or
    # Transformer-XL relative positions (nn/conformer.py)
    encoder_type: str = "transformer"
    position_embeddings_type: str = "relative"  # conformer: rotary|relative
    conv_depthwise_kernel_size: int = 31
    rotary_base: float = 10000.0
    conformer_activation: str = "swish"
    # Pallas flash-attention for encoder self-attention on TPU (skips
    # attention-prob dropout). Off by default: at wav2vec2's short frame
    # counts (~550) XLA's fused attention is faster (measured on v5e);
    # enable for long-clip buckets where O(T^2) HBM traffic dominates.
    flash_attention: bool = False
    # softmax over bf16 logits when compute dtype is bf16 (+8% step
    # throughput measured on v5e; no effect under f32 compute).
    bf16_softmax: bool = True
    # Q/K/V projections as one packed (d, 3d) GEMM at trace time (param
    # tree unchanged; nn/transformer.MultiHeadAttention.packed_qkv).
    packed_qkv: bool = False
    # Fused attention kernels (ops/pallas): None = XLA attention
    # (fastest measured end-to-end); True = whole-row fused core
    # (attention_kernel.py); "block" = projections-inside fused block
    # (attention_block_kernel.py). Both opt-in, both parity-tested.
    fused_attention: object = None
    # Rematerialize each transformer layer in backprop (jax.checkpoint):
    # saves only layer inputs, recomputes in-layer activations. Needed
    # for large models on long clips; costs ~1 extra forward.
    remat: bool = False
    # Mixture-of-Experts FFN (beyond the reference; nn/moe.py): replace
    # the dense FFN with num_experts Switch/GShard experts in every
    # moe_every-th layer. Expert weights carry a leading (E, ...) axis
    # that shards over the 'model' mesh axis (expert parallelism; EP
    # rules in parallel/sharding.py TP_RULES). The router's Switch
    # load-balance loss is sowed into the 'losses' collection and added
    # by the step factories with weight moe_aux_weight.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_every: int = 2
    moe_aux_weight: float = 0.01
    # Sequence parallelism (Megatron-SP layout): constrain the (B, T', C)
    # residual stream between transformer layers to P('data', 'model') so
    # the frame axis shards over the TP mesh axis — norms/dropout/
    # elementwise work and activation HBM split T'/tp ways, XLA inserting
    # the all-gather/reduce-scatter pairs around the head-sharded
    # attention and FFN matmuls. No reference equivalent (it is pure DDP,
    # SURVEY.md §2.6); requires the step to be traced under the mesh
    # context (train/steps.py factories take mesh=).
    sequence_parallel: bool = False
    # Topology variants beyond the reference (which is post-norm +
    # group-norm extractor only): pre_norm=True is fairseq/HF 'stable
    # layer norm' (LV-60/XLSR large); extractor_mode='layer' puts a
    # channel LayerNorm after every conv block (usually with conv_bias).
    pre_norm: bool = False
    extractor_mode: str = "group"
    conv_bias: bool = False
    # Optional override of the per-sample-rate conv stack: a tuple of
    # (channels, kernel, stride) blocks. The reference hardcodes the two
    # CONV_FEATURES stacks (/root/reference/audio8/wav2vec2.py:26-29);
    # HF checkpoints may carry arbitrary conv_dim/conv_kernel/conv_stride,
    # and the committed golden fixtures use a tiny stack.
    custom_conv_features: Optional[Tuple[Tuple[int, int, int], ...]] = None

    @property
    def conv_features(self) -> List[Tuple[int, int, int]]:
        if self.custom_conv_features is not None:
            return [tuple(b) for b in self.custom_conv_features]
        return CONV_FEATURES[self.sample_rate]

    @property
    def fx_dim(self) -> int:
        return self.conv_features[-1][0]


@dataclasses.dataclass(frozen=True)
class PretrainConfig(EncoderConfig):
    """Wav2Vec2Model pretraining hyperparameters
    (/root/reference/audio8/wav2vec2.py:219-259 defaults)."""

    num_vq_vars: int = 320
    num_vq_groups: int = 2
    final_dim: int = 256
    start_temp: float = START_TEMP
    end_temp: float = END_TEMP
    temp_decay_factor: float = TEMP_DECAY_FACTOR
    dropout_input: float = 0.1
    dropout_features: float = 0.1
    timestep_masking: float = 0.65
    channel_masking: float = 0.0
    n_negatives: int = 100


@dataclasses.dataclass(frozen=True)
class HubertPretrainConfig(EncoderConfig):
    """HuBERT masked-prediction pretraining (arXiv 2106.07447 §3.3) —
    beyond the reference, which loads HuBERT checkpoints but has no
    HuBERT training objective. Defaults follow fairseq hubert-base
    (mask_prob 0.8 / span 10, logit_temp 0.1, masked-only loss)."""

    num_clusters: int = 100
    final_dim: int = 256
    logit_temp: float = 0.1
    pred_masked_weight: float = 1.0
    pred_unmasked_weight: float = 0.0
    dropout_input: float = 0.1
    timestep_masking: float = 0.80
    channel_masking: float = 0.0


@dataclasses.dataclass(frozen=True)
class Data2VecPretrainConfig(EncoderConfig):
    """data2vec-audio masked-regression pretraining (arXiv 2202.03555) —
    beyond the reference: the student regresses an EMA teacher's
    instance-normalized top-k layer average at masked frames. Defaults
    follow fairseq data2vec_audio base."""

    average_top_k_layers: int = 8
    ema_decay: float = 0.999
    ema_end_decay: float = 0.9999
    ema_anneal_steps: int = 30_000
    dropout_input: float = 0.0
    timestep_masking: float = 0.65
    channel_masking: float = 0.0


@dataclasses.dataclass(frozen=True)
class AcousticConfig(EncoderConfig):
    """CTC acoustic model (/root/reference/audio8/wav2vec2.py:262-296)."""

    num_labels: int = 32


@dataclasses.dataclass(frozen=True)
class PooledConfig(EncoderConfig):
    """Pooled utterance encoder (/root/reference/audio8/wav2vec2.py:773-846)."""

    reduction_type: str = "sha"
    reduction_d_k: int = 64
    final_output_dim: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """Paired text tower (/root/reference/audio8/text.py:103-134)."""

    vocab_size: int = 0
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 8
    dropout: float = 0.1
    d_ff: int = 2048
    rpr_k: Optional[int] = 8
    reduction_type: str = "max"
    reduction_d_k: int = 64
    encoder_type: str = "transformer"  # or 'bow'


@dataclasses.dataclass(frozen=True)
class TextLMConfig:
    """Causal (decoder-only) text LM for n-best rescoring — a workload
    beyond the reference, whose only LM story is the KenLM-style ARPA
    fusion inside ctcdecode (/root/reference/audio8/ctc.py:22-30)."""

    vocab_size: int = 0
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 6
    dropout: float = 0.1
    d_ff: int = 2048
    rpr_k: Optional[int] = 8  # Shaw relative attention: any length at eval
    block_len: int = 512      # packed training block (tokens)


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Seq2seq text decoder (/root/reference/audio8/train_seq2seq.py:38-92)."""

    vocab_size: int = 0
    d_model: int = 768
    num_heads: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    d_ff: Optional[int] = None
    layer_drop: float = 0.0
    max_len: int = 1200


@dataclasses.dataclass(frozen=True)
class TransducerConfig(EncoderConfig):
    """RNN-T (transducer) ASR: wav2vec2 encoder + LSTM prediction network
    + additive joint — a streaming-ASR workload beyond the reference
    (models/transducer.py, ops/transducer.py)."""

    vocab_size: int = 0
    pred_layers: int = 2
    pred_dim: int = 512
    pred_embed_dim: int = 256
    pred_dropout: float = 0.1
    d_joint: int = 512
