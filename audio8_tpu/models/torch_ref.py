"""Torch replica of the fairseq wav2vec2 forward pass, parameterized.

Reference oracle for checkpoint-conversion parity
(/root/reference/audio8/wav2vec2.py:39-186 key maps;
convert_wav2vec2_checkpoint.py). Given a fairseq-format state dict this
reproduces the eval-mode forward in torch, exposing per-layer tap points so
``tools/parity_eval.py`` can report activation deltas against the JAX
model with the SAME converted weights. Also provides a synthetic
state-dict generator (shared with tests/test_convert.py).

Torch is imported lazily: the training stack never needs it.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from audio8_tpu.config import CONV_FEATURES


def infer_dims(state: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, int]:
    """d_model / num_layers / d_ff (+ num_labels for CTC heads) from the
    state-dict shapes; head count is not recoverable from weights."""
    dims = {}
    dims["d_model"] = int(state[prefix + "post_extract_proj.weight"].shape[0])
    n = 0
    while f"{prefix}encoder.layers.{n}.fc1.weight" in state:
        n += 1
    dims["num_layers"] = n
    dims["d_ff"] = int(state[prefix + "encoder.layers.0.fc1.weight"].shape[0])
    proj = state.get("w2v_encoder.proj.weight")
    if proj is not None:
        dims["num_labels"] = int(proj.shape[0])
    return dims


def make_fairseq_state(rng, d: int = 64, h: int = 4, l: int = 2,
                       fx=None, prefix: str = "") -> Dict[str, np.ndarray]:
    """Random weights in fairseq checkpoint naming/layout."""
    fx = fx if fx is not None else CONV_FEATURES[16]
    s: Dict[str, np.ndarray] = {}

    def add(name, *shape, scale=0.1):
        s[prefix + name] = rng.normal(size=shape).astype(np.float32) * scale

    in_d = 1
    for i, (c, k, st) in enumerate(fx):
        add(f"feature_extractor.conv_layers.{i}.0.weight", c, in_d, k)
        in_d = c
    c0 = fx[0][0]
    add("feature_extractor.conv_layers.0.2.weight", c0)
    add("feature_extractor.conv_layers.0.2.bias", c0)
    add("layer_norm.weight", c0)
    add("layer_norm.bias", c0)
    s[prefix + "layer_norm.weight"] += 1.0
    add("post_extract_proj.weight", d, c0)
    add("post_extract_proj.bias", d)
    add("mask_emb", d)
    add("encoder.pos_conv.0.weight_v", d, d // 16, 128)
    add("encoder.pos_conv.0.weight_g", 1, 1, 128, scale=1.0)
    s[prefix + "encoder.pos_conv.0.weight_g"] = np.abs(
        s[prefix + "encoder.pos_conv.0.weight_g"]) + 0.5
    add("encoder.pos_conv.0.bias", d)
    add("encoder.layer_norm.weight", d)
    add("encoder.layer_norm.bias", d)
    s[prefix + "encoder.layer_norm.weight"] += 1.0
    for i in range(l):
        b = f"encoder.layers.{i}"
        for p in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            add(f"{b}.self_attn.{p}.weight", d, d)
            add(f"{b}.self_attn.{p}.bias", d)
        for ln in ["self_attn_layer_norm", "final_layer_norm"]:
            add(f"{b}.{ln}.weight", d)
            add(f"{b}.{ln}.bias", d)
            s[prefix + f"{b}.{ln}.weight"] += 1.0
        add(f"{b}.fc1.weight", 4 * d, d)
        add(f"{b}.fc1.bias", 4 * d)
        add(f"{b}.fc2.weight", d, 4 * d)
        add(f"{b}.fc2.bias", d)
    return s


def forward_t(g, xt, num_heads: int = 4, fx=None, d: int = None,
              l: int = None, taps=None, time_mask=None):
    """Differentiable torch-tensor replica of the fairseq wav2vec2
    encoder forward. ``g(name)`` returns the parameter tensor for a
    fairseq key (prefix already applied); ``xt`` is a (B, T) float
    tensor. Returns (features_after_layernorm, final_hidden) as tensors —
    the trainable core shared by the numpy-facing ``forward`` and the
    training-dynamics parity tests (tests/test_train_dynamics.py).

    ``time_mask``: optional (B, T') bool tensor — masked positions get
    ``mask_emb`` substituted after post_extract_proj, replicating the
    pretraining forward (models/wav2vec2.py Wav2Vec2Model.__call__;
    reference wav2vec2.py:871-952) for the pretrain dynamics test."""
    import torch
    import torch.nn.functional as F

    fx = fx if fx is not None else CONV_FEATURES[16]
    c0 = fx[0][0]

    def tap(name, val):
        if taps is not None:
            taps.append((name, val.detach().numpy()))

    xt = xt.unsqueeze(1)  # (B, 1, T)
    for i, (c, k, st) in enumerate(fx):
        xt = F.conv1d(xt, g(f"feature_extractor.conv_layers.{i}.0.weight"), stride=st)
        if i == 0:
            xt = F.group_norm(xt, c, g("feature_extractor.conv_layers.0.2.weight"),
                              g("feature_extractor.conv_layers.0.2.bias"), eps=1e-5)
        xt = F.gelu(xt)
    feat = xt.transpose(1, 2)  # (B, T', C0)
    feat = F.layer_norm(feat, (c0,), g("layer_norm.weight"), g("layer_norm.bias"), eps=1e-5)
    tap("features", feat)
    h = F.linear(feat, g("post_extract_proj.weight"), g("post_extract_proj.bias"))
    if time_mask is not None:
        h = torch.where(time_mask[..., None], g("mask_emb").to(h.dtype), h)

    # pos conv with weight norm (dim=2)
    v = g("encoder.pos_conv.0.weight_v")
    gw = g("encoder.pos_conv.0.weight_g")
    w = gw * v / v.norm(dim=(0, 1), keepdim=True)
    pos = F.conv1d(h.transpose(1, 2), w, g("encoder.pos_conv.0.bias"),
                   padding=64, groups=16)
    pos = F.gelu(pos[:, :, :-1]).transpose(1, 2)
    h = h + pos
    h = F.layer_norm(h, (d,), g("encoder.layer_norm.weight"),
                     g("encoder.layer_norm.bias"), eps=1e-5)
    tap("pre_transformer", h)

    dh = d // num_heads
    for i in range(l):
        b = f"encoder.layers.{i}"
        q = F.linear(h, g(f"{b}.self_attn.q_proj.weight"), g(f"{b}.self_attn.q_proj.bias"))
        k = F.linear(h, g(f"{b}.self_attn.k_proj.weight"), g(f"{b}.self_attn.k_proj.bias"))
        vv = F.linear(h, g(f"{b}.self_attn.v_proj.weight"), g(f"{b}.self_attn.v_proj.bias"))
        B, T, _ = q.shape
        sp = lambda z: z.view(B, T, num_heads, dh).transpose(1, 2)
        attn = torch.softmax(sp(q) / dh ** 0.5 @ sp(k).transpose(-1, -2), -1) @ sp(vv)
        attn = attn.transpose(1, 2).reshape(B, T, d)
        attn = F.linear(attn, g(f"{b}.self_attn.out_proj.weight"),
                        g(f"{b}.self_attn.out_proj.bias"))
        h = F.layer_norm(h + attn, (d,), g(f"{b}.self_attn_layer_norm.weight"),
                         g(f"{b}.self_attn_layer_norm.bias"), eps=1e-5)
        ff = F.linear(F.gelu(F.linear(h, g(f"{b}.fc1.weight"), g(f"{b}.fc1.bias"))),
                      g(f"{b}.fc2.weight"), g(f"{b}.fc2.bias"))
        h = F.layer_norm(h + ff, (d,), g(f"{b}.final_layer_norm.weight"),
                         g(f"{b}.final_layer_norm.bias"), eps=1e-5)
        tap(f"layer_{i}", h)
    return feat, h


def forward(state: Dict[str, np.ndarray], x: np.ndarray, prefix: str = "",
            num_heads: int = 4, fx=None,
            taps: Optional[List[Tuple[str, np.ndarray]]] = None):
    """Eval-mode replica of the fairseq wav2vec2 encoder forward.

    Returns (features_after_layernorm, final_hidden) as numpy; when
    ``taps`` is a list it is filled with (name, activation) pairs
    including every transformer layer output.
    """
    import torch

    dims = infer_dims(state, prefix)
    g = lambda n: torch.from_numpy(np.asarray(state[prefix + n]))
    with torch.no_grad():
        feat, h = forward_t(g, torch.from_numpy(x), num_heads=num_heads,
                            fx=fx, d=dims["d_model"], l=dims["num_layers"],
                            taps=taps)
    return feat.numpy(), h.numpy()


def ctc_log_probs(state: Dict[str, np.ndarray], x: np.ndarray,
                  num_heads: int = 12, fx=None,
                  taps: Optional[List[Tuple[str, np.ndarray]]] = None) -> np.ndarray:
    """Full CTC forward of a fairseq finetuned checkpoint
    (w2v_encoder.w2v_model.* + w2v_encoder.proj)."""
    import torch

    _, h = forward(state, x, prefix="w2v_encoder.w2v_model.",
                   num_heads=num_heads, fx=fx, taps=taps)
    logits = h @ state["w2v_encoder.proj.weight"].T + state["w2v_encoder.proj.bias"]
    lp = torch.log_softmax(torch.from_numpy(logits), -1).numpy()
    if taps is not None:
        taps.append(("log_probs", lp))
    return lp
