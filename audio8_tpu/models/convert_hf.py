"""HuggingFace ``transformers`` Wav2Vec2 checkpoint -> JAX param pytree.

Extension beyond the reference (which loads only fairseq ``.pt``,
/root/reference/audio8/wav2vec2.py:154-186): HF's Wav2Vec2 module tree is
a renaming of the same fairseq graph, so conversion is implemented as a
key translation into fairseq naming followed by the existing structural
converter (``models/convert.py``). Supported sources:

- ``Wav2Vec2Model`` / ``Wav2Vec2ForPreTraining`` -> ``Wav2Vec2Model``
  params (quantizer + projections included when present);
- ``Wav2Vec2ForCTC`` -> ``Wav2Vec2AcousticModel`` params (``lm_head`` ->
  CTC projection);
- ``HubertModel`` / ``HubertForCTC`` -> the same targets: HuBERT's HF
  module tree is key-for-key identical to Wav2Vec2's under the
  ``hubert.`` prefix (no quantizer in released checkpoints), and both
  HuBERT topologies map to layouts we already express — hubert-base is
  the group-norm post-norm layout, hubert-large/xlarge the stable-LN
  layer-norm-extractor one;
- ``Data2VecAudioModel`` / ``Data2VecAudioForCTC`` -> the stacked
  positional-conv layout (``pos_conv_depth>1``);
- ``WavLMModel`` / ``WavLMForCTC`` -> the gated-relative-position-bias
  layout (``gated_rel_pos=True``; the shared bucket embedding sits in
  layer 0's attention in the torch tree and in the stack-level
  ``rel_pos_bias`` module here).

Both wav2vec2 topologies convert: the post-norm base layout
(``do_stable_layer_norm=False``, ``feat_extract_norm='group'``) and the
stable-LN LV-60/XLSR large layout (``do_stable_layer_norm=True``,
``feat_extract_norm='layer'``, ``conv_bias``) — the latter is beyond the
reference, whose encoder is post-norm only.

Note on vocabularies: HF CTC vocabs (<pad>=0, ...) differ from fairseq
dict ordering. Weights are copied as-is; remap rows (or use
``Offsets.remap_fairseq_ctc``-style index handling) if decoding with a
different symbol table.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from audio8_tpu.models.convert import convert_ctc_state, convert_pretrained_state

# HF base-model key fragment -> fairseq key fragment (encoder body)
_STATIC_MAP = {
    "feature_projection.layer_norm": "layer_norm",
    "feature_projection.projection": "post_extract_proj",
    "masked_spec_embed": "mask_emb",
    "encoder.pos_conv_embed.conv.parametrizations.weight.original0":
        "encoder.pos_conv.0.weight_g",
    "encoder.pos_conv_embed.conv.parametrizations.weight.original1":
        "encoder.pos_conv.0.weight_v",
    "encoder.pos_conv_embed.conv.weight_g": "encoder.pos_conv.0.weight_g",
    "encoder.pos_conv_embed.conv.weight_v": "encoder.pos_conv.0.weight_v",
    "encoder.pos_conv_embed.conv.bias": "encoder.pos_conv.0.bias",
    # pretraining heads (Wav2Vec2ForPreTraining): project_hid is the
    # context projection (fairseq final_proj), project_q the target one
    "quantizer.codevectors": "quantizer.vars",
    "quantizer.weight_proj": "quantizer.weight_proj",
    "project_q": "project_q",
    "project_hid": "final_proj",
}


def _translate_key(key: str, extractor_mode: str = "group"):
    """One HF base-model key -> fairseq-named key, or None if untranslatable."""
    if key.startswith("feature_extractor.conv_layers."):
        rest = key[len("feature_extractor.conv_layers."):]
        i, sub = rest.split(".", 1)
        if sub == "conv.weight":
            return f"feature_extractor.conv_layers.{i}.0.weight"
        if sub == "conv.bias":
            return f"feature_extractor.conv_layers.{i}.0.bias"
        if sub in ("layer_norm.weight", "layer_norm.bias"):
            leaf = sub.split(".")[1]
            if extractor_mode == "layer":
                # per-block LN in the fairseq sequential sits at 2.1
                return f"feature_extractor.conv_layers.{i}.2.1.{leaf}"
            # group-mode: only block 0 carries a GroupNorm, index 2
            return f"feature_extractor.conv_layers.{i}.2.{leaf}"
        return None
    if key == "encoder.embed_positions.inv_freq":
        # rotary frequency buffer: a deterministic constant, rebuilt from
        # config (nn/conformer.rotary_tables); passed through for the
        # conformer converter to consume
        return key
    if key.startswith("encoder.pos_conv_embed.layers."):
        # data2vec-audio positional stack: HF layers.{i}.conv -> the
        # fairseq-style stacked name encoder.pos_conv.{i}.0
        rest = key[len("encoder.pos_conv_embed.layers."):]
        i, sub = rest.split(".", 1)
        if sub in ("conv.weight", "conv.bias"):
            return f"encoder.pos_conv.{i}.0.{sub.split('.')[1]}"
        return None
    if key.startswith("encoder.layers."):
        rest = key[len("encoder.layers."):]
        i, sub = rest.split(".", 1)
        sub = (sub
               .replace("attention.", "self_attn.")
               .replace("layer_norm.", "self_attn_layer_norm.", 1)
               if sub.startswith(("attention.", "layer_norm."))
               else sub)
        sub = (sub
               .replace("feed_forward.intermediate_dense", "fc1")
               .replace("feed_forward.output_dense", "fc2"))
        return f"encoder.layers.{i}.{sub}"
    if key.startswith("encoder.layer_norm."):
        return key
    for hf, fs in _STATIC_MAP.items():
        if key == hf or key.startswith(hf + "."):
            return fs + key[len(hf):]
    return None


def hf_to_fairseq_state(state: Dict[str, Any], ctc: bool = False,
                        extractor_mode: str = "group"
                        ) -> Tuple[Dict[str, np.ndarray], list]:
    """Rename an HF Wav2Vec2 state dict into fairseq naming.

    Returns (renamed_state, untranslated_keys). ``ctc=True`` expects
    Wav2Vec2ForCTC keys (``wav2vec2.`` prefix + ``lm_head``) and emits the
    fairseq fine-tuned layout (``w2v_encoder.w2v_model.`` + proj head).
    """
    out: Dict[str, np.ndarray] = {}
    skipped = []
    for key, value in state.items():
        value = np.asarray(value)
        if ctc and key == "lm_head.weight":
            out["w2v_encoder.proj.weight"] = value
            continue
        if ctc and key == "lm_head.bias":
            out["w2v_encoder.proj.bias"] = value
            continue
        base_key = key
        for prefix in ("wav2vec2_conformer.", "wav2vec2.",
                       "wav2vec2_model.", "hubert.",
                       "data2vec_audio.", "wavlm."):
            if base_key.startswith(prefix):
                base_key = base_key[len(prefix):]
                break
        fs = _translate_key(base_key, extractor_mode)
        if fs is None:
            skipped.append(key)
            continue
        if fs == "encoder.pos_conv.0.weight_g" and value.ndim == 3 \
                and value.shape[:2] != (1, 1):
            # torch >=2 parametrized weight-norm may keep g over dim 2
            # as (1, 1, K) already; older exports match fairseq layout
            value = value.reshape(1, 1, -1)
        out[("w2v_encoder.w2v_model." if ctc else "") + fs] = value
    return out, skipped


def convert_hf_state(state: Dict[str, Any], num_layers: int = 12,
                     num_fx_layers: int = 7, ctc: bool = False,
                     pre_norm: bool = False, extractor_mode: str = "group",
                     conv_bias: bool = False,
                     pos_conv_depth: int = 1,
                     gated_rel_pos: bool = False,
                     encoder_type: str = "transformer",
                     position_embeddings_type: str = "relative"
                     ) -> Tuple[Dict, Dict]:
    """HF Wav2Vec2 state dict -> our params. Same (params, report)
    contract as ``load_fairseq_bin``; untranslatable HF keys are reported
    under ``unexpected``. ``pre_norm``/``extractor_mode``/``conv_bias``
    select the stable-LN (LV-60/XLSR) topology; ``pos_conv_depth>1``
    the data2vec-audio positional stack."""
    renamed, skipped = hf_to_fairseq_state(state, ctc=ctc,
                                           extractor_mode=extractor_mode)
    kw = dict(pre_norm=pre_norm, extractor_mode=extractor_mode,
              conv_bias=conv_bias, pos_conv_depth=pos_conv_depth,
              gated_rel_pos=gated_rel_pos, encoder_type=encoder_type,
              position_embeddings_type=position_embeddings_type)
    if ctc:
        params, report = convert_ctc_state(renamed, num_layers,
                                           num_fx_layers, **kw)
    else:
        params, report = convert_pretrained_state(renamed, num_layers,
                                                  num_fx_layers, **kw)
    report["unexpected"] = sorted(report["unexpected"] + skipped)
    return params, report


def _hf_topology(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Encoder-topology kwargs from an HF config dict, by model_type."""
    if cfg.get("model_type") == "wav2vec2-conformer":
        # macaron conformer blocks with rotary/XL-relative positions; the
        # stack layer-norms once after the blocks (our ln_out) and the
        # extractor layout reads from config like wav2vec2
        return dict(pre_norm=False,
                    extractor_mode=cfg.get("feat_extract_norm", "group"),
                    conv_bias=cfg.get("conv_bias", False),
                    pos_conv_depth=1, gated_rel_pos=False,
                    encoder_type="conformer",
                    position_embeddings_type=cfg.get(
                        "position_embeddings_type", "relative"))
    if cfg.get("model_type") == "wavlm":
        # WavLM (arXiv 2110.13900): wav2vec2 layouts + gated relative
        # position bias. base is group-norm post-norm, large is the
        # stable-LN layer-norm-extractor layout — both read from config.
        return dict(pre_norm=cfg.get("do_stable_layer_norm", False),
                    extractor_mode=cfg.get("feat_extract_norm", "group"),
                    conv_bias=cfg.get("conv_bias", False),
                    pos_conv_depth=1, gated_rel_pos=True)
    if cfg.get("model_type") == "data2vec-audio":
        # data2vec-audio is always layer-norm extractor + post-norm
        # encoder, with the stacked positional conv
        return dict(pre_norm=False, extractor_mode="layer",
                    conv_bias=cfg.get("conv_bias", False),
                    pos_conv_depth=cfg.get("num_conv_pos_embeddings", 5),
                    gated_rel_pos=False)
    if cfg.get("feat_extract_norm", "group") not in ("group", "layer"):
        raise ValueError(
            f"unknown feat_extract_norm {cfg.get('feat_extract_norm')!r}")
    return dict(pre_norm=cfg.get("do_stable_layer_norm", False),
                extractor_mode=cfg.get("feat_extract_norm", "group"),
                conv_bias=cfg.get("conv_bias", False),
                pos_conv_depth=1, gated_rel_pos=False)


def acoustic_config_from_hf(cfg: Dict[str, Any],
                            topology: Dict[str, Any] = None,
                            **overrides):
    """Build an eval-ready ``AcousticConfig`` (dropout/masking off) from
    an HF config dict — dims, family topology (``_hf_topology``),
    positional-conv geometry, WavLM bucket table, conformer extras, and
    the conv stack (``custom_conv_features`` when it isn't one of the
    reference's two CONV_FEATURES stacks)."""
    from audio8_tpu.config import CONV_FEATURES, AcousticConfig

    topo = dict(topology if topology is not None else _hf_topology(cfg))
    kw = dict(num_labels=cfg["vocab_size"], d_model=cfg["hidden_size"],
              num_heads=cfg["num_attention_heads"],
              num_layers=cfg["num_hidden_layers"],
              d_ff=cfg["intermediate_size"],
              dropout=0.0, attention_dropout=0.0,
              timestep_masking=0.0, channel_masking=0.0)
    if topo.get("pos_conv_depth", 1) > 1:  # data2vec stacked pos conv
        kw["conv_pos_kernel"] = cfg.get("conv_pos_kernel_size", 19)
    else:
        kw["conv_pos_kernel"] = cfg.get("num_conv_pos_embeddings", 128)
    kw["conv_pos_groups"] = cfg.get("num_conv_pos_embedding_groups", 16)
    if topo.get("gated_rel_pos"):
        kw["rel_pos_buckets"] = cfg.get("num_buckets", 320)
        kw["rel_pos_max_distance"] = cfg.get("max_bucket_distance", 800)
    if topo.get("encoder_type") == "conformer":
        kw["conv_depthwise_kernel_size"] = cfg.get(
            "conv_depthwise_kernel_size", 31)
        kw["rotary_base"] = float(cfg.get("rotary_embedding_base", 10000))
        kw["conformer_activation"] = cfg.get("hidden_act", "swish")
    conv = tuple(zip(cfg.get("conv_dim", (512,) * 7),
                     cfg.get("conv_kernel", (10, 3, 3, 3, 3, 2, 2)),
                     cfg.get("conv_stride", (5, 2, 2, 2, 2, 2, 2))))
    for sr, stack in CONV_FEATURES.items():
        if conv == tuple(tuple(b) for b in stack):
            kw["sample_rate"] = sr
            break
    else:
        kw["custom_conv_features"] = conv
    kw.update(topo)
    kw.update(overrides)
    return AcousticConfig(**kw)


def is_hf_dir(path: str) -> bool:
    """True when ``path`` looks like a transformers save_pretrained dir."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "config.json"))


def load_hf_dir(model_dir: str, ctc=False) -> Tuple[Dict, Dict]:
    """Load a ``save_pretrained`` directory (config.json +
    model.safetensors / pytorch_model.bin) and convert.

    ``ctc='auto'`` detects the source head (``lm_head`` present ->
    ForCTC); the decision is reported as ``report['kind']``."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    topology = _hf_topology(cfg)
    st_path = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        state = load_file(st_path)
    else:
        import torch

        blob = torch.load(os.path.join(model_dir, "pytorch_model.bin"),
                          map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in blob.items()}
    num_fx = len(cfg.get("conv_kernel", [10, 3, 3, 3, 3, 2, 2]))
    if ctc == "auto":
        ctc = any(k.startswith("lm_head") for k in state)
    params, report = convert_hf_state(
        state, num_layers=cfg["num_hidden_layers"], num_fx_layers=num_fx,
        ctc=ctc, **topology)
    report["kind"] = "ctc" if ctc else "pretrained"
    report["topology"] = dict(topology)
    report["hf_config"] = cfg
    return params, report
