"""fairseq wav2vec2 checkpoint -> JAX param pytree conversion.

Equivalent of the reference's key maps + ``load_fairseq_bin``
(/root/reference/audio8/wav2vec2.py:39-186) and the offline converter
(convert_wav2vec2_checkpoint.py). Instead of literal rename tables, the
mapping is generated structurally; tensors are re-laid-out for JAX:

- Linear ``weight`` (out, in)        -> Dense ``kernel`` (in, out)   [.T]
- Conv1d ``weight`` (out, in/g, k)   -> Conv1D ``kernel`` (k, in/g, out)
- weight-norm pos-conv ``weight_v``  -> (k, in/g, out); ``weight_g``
  (1, 1, k) -> (k, 1, 1)
- norm ``weight``/``bias``           -> ``scale``/``bias``
- quantizer ``vars`` (1, G*V, d)     -> (G*V, d)

Two source layouts are handled, matching the reference maps:
pretrained wav2vec2 (keys like ``encoder.layers.N...``) and fine-tuned CTC
(``w2v_encoder.w2v_model...`` + ``w2v_encoder.proj``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def _conv(x) -> np.ndarray:  # (out, in/g, k) -> (k, in/g, out)
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 1, 0)))


def _set(tree: Dict, path: List[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _encoder_assignments(num_layers: int, num_fx_layers: int,
                         pre_norm: bool = False,
                         extractor_mode: str = "group",
                         conv_bias: bool = False,
                         pos_conv_depth: int = 1,
                         gated_rel_pos: bool = False,
                         encoder_type: str = "transformer",
                         position_embeddings_type: str = "relative"):
    """(fairseq_key, our_path, transform) for the shared encoder body.

    Paths are relative to our ``Wav2Vec2Encoder`` params tree and fairseq
    keys relative to the wav2vec2 model root. ``pre_norm`` /
    ``extractor_mode='layer'`` / ``conv_bias`` select the LV-60/XLSR
    'stable layer norm' topology (fairseq layer_norm_first: the final
    ``encoder.layer_norm`` sits after the stack; per-block extractor
    LayerNorms live at sequential index 2.1).
    """
    out = []
    # conv feature extractor
    for i in range(num_fx_layers):
        out.append((f"feature_extractor.conv_layers.{i}.0.weight",
                    ["feature_extractor", f"conv_{i}", "kernel"], _conv))
        if conv_bias:
            out.append((f"feature_extractor.conv_layers.{i}.0.bias",
                        ["feature_extractor", f"conv_{i}", "bias"], np.asarray))
        if extractor_mode == "layer":
            out.append((f"feature_extractor.conv_layers.{i}.2.1.weight",
                        ["feature_extractor", f"ln_{i}", "scale"], np.asarray))
            out.append((f"feature_extractor.conv_layers.{i}.2.1.bias",
                        ["feature_extractor", f"ln_{i}", "bias"], np.asarray))
    if extractor_mode == "group":
        out.append(("feature_extractor.conv_layers.0.2.weight",
                    ["feature_extractor", "norm_0", "scale"], np.asarray))
        out.append(("feature_extractor.conv_layers.0.2.bias",
                    ["feature_extractor", "norm_0", "bias"], np.asarray))
    # post-fx layer norm + input projection + mask embedding
    out.append(("layer_norm.weight", ["layer_norm", "scale"], np.asarray))
    out.append(("layer_norm.bias", ["layer_norm", "bias"], np.asarray))
    out.append(("post_extract_proj.weight", ["proj_to_input", "kernel"], _t))
    out.append(("post_extract_proj.bias", ["proj_to_input", "bias"], np.asarray))
    out.append(("mask_emb", ["mask_emb"], np.asarray))
    if encoder_type == "conformer":
        # wav2vec2-conformer: no pos-conv (HF constructs one but never
        # applies it — its dead weights are popped by the callers), a
        # single post-stack LayerNorm, and the conformer block schema.
        # Keys keep HF naming (no fairseq distribution of these models).
        out.append(("encoder.layer_norm.weight",
                    ["encoder", "transformer", "ln_out", "scale"], np.asarray))
        out.append(("encoder.layer_norm.bias",
                    ["encoder", "transformer", "ln_out", "bias"], np.asarray))
        for i in range(num_layers):
            base = f"encoder.layers.{i}"
            ours = ["encoder", "transformer", f"layer_{i}"]
            for hf_ffn, mine in (("ffn1", "ffn1"), ("ffn2", "ffn2")):
                out.append((f"{base}.{hf_ffn}_layer_norm.weight",
                            ours + [f"{mine}_ln", "scale"], np.asarray))
                out.append((f"{base}.{hf_ffn}_layer_norm.bias",
                            ours + [f"{mine}_ln", "bias"], np.asarray))
                out.append((f"{base}.{hf_ffn}.intermediate_dense.weight",
                            ours + [mine, "expand", "kernel"], _t))
                out.append((f"{base}.{hf_ffn}.intermediate_dense.bias",
                            ours + [mine, "expand", "bias"], np.asarray))
                out.append((f"{base}.{hf_ffn}.output_dense.weight",
                            ours + [mine, "contract", "kernel"], _t))
                out.append((f"{base}.{hf_ffn}.output_dense.bias",
                            ours + [mine, "contract", "bias"], np.asarray))
            out.append((f"{base}.self_attn_layer_norm.weight",
                        ours + ["attn_ln", "scale"], np.asarray))
            out.append((f"{base}.self_attn_layer_norm.bias",
                        ours + ["attn_ln", "bias"], np.asarray))
            for hf_p, mine in (("linear_q", "w_Q"), ("linear_k", "w_K"),
                               ("linear_v", "w_V"), ("linear_out", "w_O")):
                out.append((f"{base}.self_attn.{hf_p}.weight",
                            ours + ["self_attn", mine, "kernel"], _t))
                out.append((f"{base}.self_attn.{hf_p}.bias",
                            ours + ["self_attn", mine, "bias"], np.asarray))
            if position_embeddings_type == "relative":
                out.append((f"{base}.self_attn.linear_pos.weight",
                            ours + ["self_attn", "linear_pos", "kernel"], _t))
                out.append((f"{base}.self_attn.pos_bias_u",
                            ours + ["self_attn", "pos_bias_u"], np.asarray))
                out.append((f"{base}.self_attn.pos_bias_v",
                            ours + ["self_attn", "pos_bias_v"], np.asarray))
            cm = f"{base}.conv_module"
            out.append((f"{cm}.layer_norm.weight",
                        ours + ["conv", "ln", "scale"], np.asarray))
            out.append((f"{cm}.layer_norm.bias",
                        ours + ["conv", "ln", "bias"], np.asarray))
            # pointwise convs are k=1: (C_out, C_in, 1) -> Dense (C_in, C_out)
            pw = lambda x: np.ascontiguousarray(
                np.asarray(x)[..., 0].T)
            out.append((f"{cm}.pointwise_conv1.weight",
                        ours + ["conv", "pw1", "kernel"], pw))
            out.append((f"{cm}.pointwise_conv2.weight",
                        ours + ["conv", "pw2", "kernel"], pw))
            out.append((f"{cm}.depthwise_conv.weight",
                        ours + ["conv", "dw", "kernel"], _conv))
            # synthetic keys written by _fold_conformer_batchnorm
            out.append((f"{cm}.bn_folded.scale",
                        ours + ["conv", "bn_scale"], np.asarray))
            out.append((f"{cm}.bn_folded.bias",
                        ours + ["conv", "bn_bias"], np.asarray))
            out.append((f"{base}.final_layer_norm.weight",
                        ours + ["final_ln", "scale"], np.asarray))
            out.append((f"{base}.final_layer_norm.bias",
                        ours + ["final_ln", "bias"], np.asarray))
        if gated_rel_pos:
            raise ValueError("gated_rel_pos is a transformer-stack feature")
        return out
    if pos_conv_depth > 1:
        # data2vec-audio positional stack: plain grouped convs, no weight
        # norm (fairseq names the i-th conv ``encoder.pos_conv.{i}.0``)
        for i in range(pos_conv_depth):
            out.append((f"encoder.pos_conv.{i}.0.weight",
                        ["encoder", "pos_conv", f"layer_{i}", "kernel"], _conv))
            out.append((f"encoder.pos_conv.{i}.0.bias",
                        ["encoder", "pos_conv", f"layer_{i}", "bias"], np.asarray))
    else:
        # conv positional embedding (weight-normed)
        out.append(("encoder.pos_conv.0.weight_v", ["encoder", "pos_conv", "weight_v"], _conv))
        out.append(("encoder.pos_conv.0.weight_g", ["encoder", "pos_conv", "weight_g"],
                    lambda x: np.transpose(np.asarray(x), (2, 1, 0))))
        out.append(("encoder.pos_conv.0.bias", ["encoder", "pos_conv", "bias"], np.asarray))
    # encoder-level layer norm: pre-transformer in the post-norm layout,
    # after the stack (ln_out) under layer_norm_first/stable-LN
    ln_path = (["encoder", "transformer", "ln_out"] if pre_norm
               else ["encoder", "ln"])
    out.append(("encoder.layer_norm.weight", ln_path + ["scale"], np.asarray))
    out.append(("encoder.layer_norm.bias", ln_path + ["bias"], np.asarray))
    # transformer layers (fairseq post-norm: self_attn_layer_norm after
    # attention == our ln_attn; final_layer_norm after FFN == our ln_ffn;
    # same correspondence as the reference maps, wav2vec2.py:49-56)
    for i in range(num_layers):
        base = f"encoder.layers.{i}"
        ours = ["encoder", "transformer", f"layer_{i}"]
        for fs, mine in (("q_proj", "w_Q"), ("k_proj", "w_K"),
                         ("v_proj", "w_V"), ("out_proj", "w_O")):
            out.append((f"{base}.self_attn.{fs}.weight",
                        ours + ["self_attn", mine, "kernel"], _t))
            out.append((f"{base}.self_attn.{fs}.bias",
                        ours + ["self_attn", mine, "bias"], np.asarray))
        out.append((f"{base}.self_attn_layer_norm.weight", ours + ["ln_attn", "scale"], np.asarray))
        out.append((f"{base}.self_attn_layer_norm.bias", ours + ["ln_attn", "bias"], np.asarray))
        out.append((f"{base}.fc1.weight", ours + ["ffn", "expand", "kernel"], _t))
        out.append((f"{base}.fc1.bias", ours + ["ffn", "expand", "bias"], np.asarray))
        out.append((f"{base}.fc2.weight", ours + ["ffn", "contract", "kernel"], _t))
        out.append((f"{base}.fc2.bias", ours + ["ffn", "contract", "bias"], np.asarray))
        out.append((f"{base}.final_layer_norm.weight", ours + ["ln_ffn", "scale"], np.asarray))
        out.append((f"{base}.final_layer_norm.bias", ours + ["ln_ffn", "bias"], np.asarray))
        if gated_rel_pos:
            # WavLM per-layer gate over the shared position bias
            out.append((f"{base}.self_attn.gru_rel_pos_linear.weight",
                        ours + ["self_attn", "gru_rel_pos_linear", "kernel"], _t))
            out.append((f"{base}.self_attn.gru_rel_pos_linear.bias",
                        ours + ["self_attn", "gru_rel_pos_linear", "bias"], np.asarray))
            out.append((f"{base}.self_attn.gru_rel_pos_const",
                        ours + ["self_attn", "gru_rel_pos_const"], np.asarray))
    if gated_rel_pos:
        # the bucketed bias embedding lives in layer 0's attention in the
        # torch tree; ours is a stack-level module shared by all layers
        out.append(("encoder.layers.0.self_attn.rel_attn_embed.weight",
                    ["encoder", "transformer", "rel_pos_bias",
                     "rel_attn_embed", "embedding"], np.asarray))
    return out


# unilm/fairseq-native WavLM key spellings -> the HF-style names our
# assignments use (official WavLM .pt files name the gate ``grep_linear``
# / ``grep_a`` and the bucket table ``relative_attention_bias``)
_WAVLM_FAIRSEQ_ALIASES = (
    (".self_attn.grep_linear.", ".self_attn.gru_rel_pos_linear."),
    (".self_attn.grep_a", ".self_attn.gru_rel_pos_const"),
    (".self_attn.relative_attention_bias.", ".self_attn.rel_attn_embed."),
)


def _canonicalize_wavlm_keys(state: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in state.items():
        for old, new in _WAVLM_FAIRSEQ_ALIASES:
            if old in k:
                k = k.replace(old, new)
                break
        out[k] = v
    return out


def _fold_conformer_batchnorm(state: Dict[str, Any], prefix: str = "",
                              eps: float = 1e-5) -> None:
    """Fold each conv_module BatchNorm's (weight, bias, running stats)
    into an equivalent per-channel affine, writing synthetic
    ``...conv_module.bn_folded.{scale,bias}`` keys (exact at inference;
    our conformer runs frozen-statistics BN — see nn/conformer.py).
    Also pops the dead pos-conv weights HF constructs but never applies
    (modeling_wav2vec2_conformer.py:646)."""
    layers = set()
    for k in list(state):
        if ".conv_module.batch_norm." in k and k.startswith(prefix):
            layers.add(k[len(prefix):].split(".conv_module.")[0])
        if k.startswith(prefix) and (".pos_conv." in k
                                      or "embed_positions." in k):
            state.pop(k)
    for base in layers:
        bn = f"{prefix}{base}.conv_module.batch_norm."
        state.pop(bn + "num_batches_tracked", None)
        try:
            w = np.asarray(state.pop(bn + "weight"), np.float64)
            b = np.asarray(state.pop(bn + "bias"), np.float64)
            mean = np.asarray(state.pop(bn + "running_mean"), np.float64)
            var = np.asarray(state.pop(bn + "running_var"), np.float64)
        except KeyError:
            continue  # incomplete BN -> surfaces as missing bn_folded keys
        scale = w / np.sqrt(var + eps)
        state[f"{prefix}{base}.conv_module.bn_folded.scale"] = \
            scale.astype(np.float32)
        state[f"{prefix}{base}.conv_module.bn_folded.bias"] = \
            (b - mean * scale).astype(np.float32)


def convert_pretrained_state(state: Dict[str, Any], num_layers: int = 12,
                             num_fx_layers: int = 7, pre_norm: bool = False,
                             extractor_mode: str = "group",
                             conv_bias: bool = False,
                             pos_conv_depth: int = 1,
                             gated_rel_pos: bool = False,
                             encoder_type: str = "transformer",
                             position_embeddings_type: str = "relative"
                             ) -> Tuple[Dict, Dict]:
    """fairseq pretrained wav2vec2 'model' dict -> Wav2Vec2Model params.

    Returns (params, report) with report['missing'/'unexpected'] like
    ``load_fairseq_bin`` (wav2vec2.py:171-186)."""
    state = _canonicalize_wavlm_keys(state) if gated_rel_pos else dict(state)
    if encoder_type == "conformer":
        _fold_conformer_batchnorm(state)
    params: Dict = {}
    missing: List[str] = []
    for key, path, tf in _encoder_assignments(num_layers, num_fx_layers,
                                              pre_norm, extractor_mode,
                                              conv_bias, pos_conv_depth,
                                              gated_rel_pos, encoder_type,
                                              position_embeddings_type):
        if key in state:
            _set(params, path, tf(state.pop(key)))
        else:
            missing.append(key)
    extra = [
        ("quantizer.vars", ["quantizer", "vars"],
         lambda x: np.asarray(x)[0]),
        ("quantizer.weight_proj.weight", ["quantizer", "weight_proj", "kernel"], _t),
        ("quantizer.weight_proj.bias", ["quantizer", "weight_proj", "bias"], np.asarray),
        ("project_q.weight", ["project_q", "kernel"], _t),
        ("project_q.bias", ["project_q", "bias"], np.asarray),
        ("final_proj.weight", ["final_proj", "kernel"], _t),
        ("final_proj.bias", ["final_proj", "bias"], np.asarray),
    ]
    for key, path, tf in extra:
        if key in state:
            _set(params, path, tf(state.pop(key)))
        else:
            missing.append(key)
    return params, {"missing": missing, "unexpected": sorted(state.keys())}


def convert_ctc_state(state: Dict[str, Any], num_layers: int = 12,
                      num_fx_layers: int = 7, pre_norm: bool = False,
                      extractor_mode: str = "group",
                      conv_bias: bool = False,
                      pos_conv_depth: int = 1,
                      gated_rel_pos: bool = False,
                      encoder_type: str = "transformer",
                      position_embeddings_type: str = "relative"
                      ) -> Tuple[Dict, Dict]:
    """fairseq fine-tuned wav2vec2-CTC 'model' dict ->
    Wav2Vec2AcousticModel params (w2v_encoder.w2v_model.* nesting +
    w2v_encoder.proj head, mirroring W2V_CTC_MAP wav2vec2.py:39-104)."""
    state = _canonicalize_wavlm_keys(state) if gated_rel_pos else dict(state)
    prefix = "w2v_encoder.w2v_model."
    if encoder_type == "conformer":
        _fold_conformer_batchnorm(state, prefix)
    params: Dict = {}
    missing: List[str] = []
    for key, path, tf in _encoder_assignments(num_layers, num_fx_layers,
                                              pre_norm, extractor_mode,
                                              conv_bias, pos_conv_depth,
                                              gated_rel_pos, encoder_type,
                                              position_embeddings_type):
        full = prefix + key
        if full in state:
            _set(params, ["encoder"] + path, tf(state.pop(full)))
        else:
            missing.append(full)
    for key, path, tf in (
        ("w2v_encoder.proj.weight", ["proj", "kernel"], _t),
        ("w2v_encoder.proj.bias", ["proj", "bias"], np.asarray),
    ):
        if key in state:
            _set(params, path, tf(state.pop(key)))
        else:
            missing.append(key)
    # quantizer/projection keys legitimately absent in CTC checkpoints
    leftovers = sorted(k for k in state if not k.startswith(prefix + "quantizer")
                       and not k.startswith(prefix + "project_q"))
    return params, {"missing": missing, "unexpected": leftovers}


def load_torch_file(bin_file: str) -> Dict[str, Any]:
    """Load a fairseq ``.pt`` and return its 'model' state dict as numpy.

    Uses torch when importable; otherwise the in-package torch-free zip
    reader (models/pt_reader.py, bit-identical on zip-format saves —
    tests/test_fairseq_golden.py), so TPU hosts can consume fairseq
    checkpoints without a torch install."""
    try:
        import torch
    except ImportError:
        from audio8_tpu.models.pt_reader import load_state_dict

        return load_state_dict(bin_file)

    blob = torch.load(bin_file, map_location="cpu", weights_only=False)
    model = blob.get("model", blob)
    return {k: v.detach().numpy() if hasattr(v, "detach") else v
            for k, v in model.items()}


def load_fairseq_bin(bin_file: str, ctc: bool = False, num_layers: int = 12,
                     sr: int = 16, pre_norm: bool = False,
                     extractor_mode: str = "group",
                     conv_bias: bool = False,
                     pos_conv_depth: int = 1,
                     gated_rel_pos: bool = False,
                     encoder_type: str = "transformer",
                     position_embeddings_type: str = "relative"
                     ) -> Tuple[Dict, Dict]:
    """Reference-shaped entry point (wav2vec2.py:171-186): returns
    (params, {'missing': [...], 'unexpected': [...]}). The topology
    kwargs select the LV-60/XLSR stable-LN layout or (pos_conv_depth>1)
    the data2vec-audio positional stack (beyond the reference's
    post-norm-only loader)."""
    state = load_torch_file(bin_file)
    # conv-stack depth from the checkpoint itself (falls back to the
    # per-sample-rate CONV_FEATURES depth when the keys are absent)
    prefix = "w2v_encoder.w2v_model." if ctc else ""
    num_fx = 0
    while f"{prefix}feature_extractor.conv_layers.{num_fx}.0.weight" in state:
        num_fx += 1
    if num_fx == 0:
        num_fx = 7 if sr == 16 else 6
    kw = dict(pre_norm=pre_norm, extractor_mode=extractor_mode,
              conv_bias=conv_bias, pos_conv_depth=pos_conv_depth,
              gated_rel_pos=gated_rel_pos, encoder_type=encoder_type,
              position_embeddings_type=position_embeddings_type)
    if ctc:
        return convert_ctc_state(state, num_layers, num_fx, **kw)
    return convert_pretrained_state(state, num_layers, num_fx, **kw)


def merge_params(target: Dict, loaded: Dict, _dropped: Optional[list] = None) -> Dict:
    """Overlay loaded params onto a freshly-initialized tree.

    - keys missing from ``loaded`` (e.g. the CTC head when warm-starting
      from a pretrained checkpoint) keep their initialization;
    - keys in ``loaded`` but absent from ``target`` (e.g. quantizer/
      projection params when loading a pretrained tree into a downstream
      model — the reference's strict=False load, wav2vec2.py:184) are
      DROPPED, since flax rejects unexpected params at apply time.
    """
    out = dict(target)
    for k, v in loaded.items():
        if k not in out:
            if _dropped is not None:
                _dropped.append(k)
            continue
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = merge_params(out[k], v, _dropped)
        else:
            out[k] = v
    return out


def fold_weight_norm(params: Dict) -> Dict:
    """Inference-time optimization: fold the pos-conv weight norm
    (g * v/||v||) into a single kernel so each forward skips the norm."""
    def fold(node):
        if isinstance(node, dict) and "weight_v" in node and "weight_g" in node:
            v = np.asarray(node["weight_v"], np.float64)
            g = np.asarray(node["weight_g"], np.float64)
            norm = np.linalg.norm(v, axis=(1, 2), keepdims=True)
            kernel = (g * v / (norm + 1e-12)).astype(np.float32)
            # keep decomposed form but pre-normalized so g == ||v||
            return {"weight_v": kernel,
                    "weight_g": norm.astype(np.float32) * 0 + np.linalg.norm(
                        kernel, axis=(1, 2), keepdims=True).astype(np.float32),
                    "bias": node["bias"]}
        if isinstance(node, dict):
            return {k: fold(v) for k, v in node.items()}
        return node

    return fold(params)
