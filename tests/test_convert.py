"""Golden parity: random fairseq-format weights -> converter -> our model
must reproduce a torch replica of the fairseq wav2vec2 forward pass
end-to-end (the keystone test of SURVEY.md §7 step 2)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audio8_tpu.config import AcousticConfig, CONV_FEATURES
from audio8_tpu.models.convert import (
    convert_ctc_state,
    convert_pretrained_state,
    fold_weight_norm,
    merge_params,
)
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Encoder
from audio8_tpu.config import EncoderConfig

D, H, L, V = 64, 4, 2, 10
FX = CONV_FEATURES[16]


def make_fairseq_state(rng, prefix=""):
    """Random weights in fairseq checkpoint naming/layout."""
    s = {}

    def add(name, *shape, scale=0.1):
        s[prefix + name] = rng.normal(size=shape).astype(np.float32) * scale

    in_d = 1
    for i, (c, k, st) in enumerate(FX):
        add(f"feature_extractor.conv_layers.{i}.0.weight", c, in_d, k)
        in_d = c
    add("feature_extractor.conv_layers.0.2.weight", 512)
    add("feature_extractor.conv_layers.0.2.bias", 512)
    add("layer_norm.weight", 512)
    add("layer_norm.bias", 512)
    s[prefix + "layer_norm.weight"] += 1.0
    add("post_extract_proj.weight", D, 512)
    add("post_extract_proj.bias", D)
    add("mask_emb", D)
    add("encoder.pos_conv.0.weight_v", D, D // 16, 128)
    add("encoder.pos_conv.0.weight_g", 1, 1, 128, scale=1.0)
    s[prefix + "encoder.pos_conv.0.weight_g"] = np.abs(
        s[prefix + "encoder.pos_conv.0.weight_g"]) + 0.5
    add("encoder.pos_conv.0.bias", D)
    add("encoder.layer_norm.weight", D)
    add("encoder.layer_norm.bias", D)
    s[prefix + "encoder.layer_norm.weight"] += 1.0
    for i in range(L):
        b = f"encoder.layers.{i}"
        for p in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            add(f"{b}.self_attn.{p}.weight", D, D)
            add(f"{b}.self_attn.{p}.bias", D)
        for ln in ["self_attn_layer_norm", "final_layer_norm"]:
            add(f"{b}.{ln}.weight", D)
            add(f"{b}.{ln}.bias", D)
            s[prefix + f"{b}.{ln}.weight"] += 1.0
        add(f"{b}.fc1.weight", 4 * D, D)
        add(f"{b}.fc1.bias", 4 * D)
        add(f"{b}.fc2.weight", D, 4 * D)
        add(f"{b}.fc2.bias", D)
    return s


def torch_w2v2_forward(state, x, prefix=""):
    """Eval-mode replica of the fairseq wav2vec2 encoder forward."""
    g = lambda n: torch.from_numpy(state[prefix + n])
    xt = torch.from_numpy(x).unsqueeze(1)  # (B, 1, T)
    for i, (c, k, st) in enumerate(FX):
        xt = F.conv1d(xt, g(f"feature_extractor.conv_layers.{i}.0.weight"), stride=st)
        if i == 0:
            xt = F.group_norm(xt, c, g("feature_extractor.conv_layers.0.2.weight"),
                              g("feature_extractor.conv_layers.0.2.bias"), eps=1e-5)
        xt = F.gelu(xt)
    feat = xt.transpose(1, 2)  # (B, T', 512)
    feat = F.layer_norm(feat, (512,), g("layer_norm.weight"), g("layer_norm.bias"), eps=1e-5)
    h = F.linear(feat, g("post_extract_proj.weight"), g("post_extract_proj.bias"))

    # pos conv with weight norm (dim=2)
    v = g("encoder.pos_conv.0.weight_v")
    gw = g("encoder.pos_conv.0.weight_g")
    w = gw * v / v.norm(dim=(0, 1), keepdim=True)
    pos = F.conv1d(h.transpose(1, 2), w, g("encoder.pos_conv.0.bias"),
                   padding=64, groups=16)
    pos = F.gelu(pos[:, :, :-1]).transpose(1, 2)
    h = h + pos
    h = F.layer_norm(h, (D,), g("encoder.layer_norm.weight"), g("encoder.layer_norm.bias"), eps=1e-5)

    dh = D // H
    for i in range(L):
        b = f"encoder.layers.{i}"
        q = F.linear(h, g(f"{b}.self_attn.q_proj.weight"), g(f"{b}.self_attn.q_proj.bias"))
        k = F.linear(h, g(f"{b}.self_attn.k_proj.weight"), g(f"{b}.self_attn.k_proj.bias"))
        vv = F.linear(h, g(f"{b}.self_attn.v_proj.weight"), g(f"{b}.self_attn.v_proj.bias"))
        B, T, _ = q.shape
        sp = lambda z: z.view(B, T, H, dh).transpose(1, 2)
        attn = torch.softmax(sp(q) / dh ** 0.5 @ sp(k).transpose(-1, -2), -1) @ sp(vv)
        attn = attn.transpose(1, 2).reshape(B, T, D)
        attn = F.linear(attn, g(f"{b}.self_attn.out_proj.weight"), g(f"{b}.self_attn.out_proj.bias"))
        h = F.layer_norm(h + attn, (D,), g(f"{b}.self_attn_layer_norm.weight"),
                         g(f"{b}.self_attn_layer_norm.bias"), eps=1e-5)
        ff = F.linear(F.gelu(F.linear(h, g(f"{b}.fc1.weight"), g(f"{b}.fc1.bias"))),
                      g(f"{b}.fc2.weight"), g(f"{b}.fc2.bias"))
        h = F.layer_norm(h + ff, (D,), g(f"{b}.final_layer_norm.weight"),
                         g(f"{b}.final_layer_norm.bias"), eps=1e-5)
    return feat.numpy(), h.numpy()


@pytest.fixture(scope="module")
def fairseq_ctc_state():
    rng = np.random.default_rng(7)
    s = make_fairseq_state(rng, prefix="w2v_encoder.w2v_model.")
    s["w2v_encoder.proj.weight"] = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    s["w2v_encoder.proj.bias"] = rng.normal(size=V).astype(np.float32) * 0.1
    return s


def test_ctc_conversion_full_forward_parity(fairseq_ctc_state):
    s = fairseq_ctc_state
    params, report = convert_ctc_state(s, num_layers=L, num_fx_layers=7)
    assert report["missing"] == []
    assert report["unexpected"] == []

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # converted tree covers every leaf of the model
    merged = merge_params(init, params)
    flat_init = {"/".join(map(str, [getattr(k, 'key', k) for k in p])): l.shape
                 for p, l in jax.tree_util.tree_leaves_with_path(init)}
    flat_conv = {"/".join(map(str, [getattr(k, 'key', k) for k in p])): np.shape(l)
                 for p, l in jax.tree_util.tree_leaves_with_path(params)}
    assert set(flat_conv) == set(flat_init)
    for k in flat_init:
        assert tuple(flat_init[k]) == tuple(flat_conv[k]), k

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    _, h_t = torch_w2v2_forward(s, x, prefix="w2v_encoder.w2v_model.")
    logits_t = h_t @ s["w2v_encoder.proj.weight"].T + s["w2v_encoder.proj.bias"]
    want = torch.log_softmax(torch.from_numpy(logits_t), -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    # greedy argmax parity (WER-relevant)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_pretrained_conversion_covers_encoder():
    rng = np.random.default_rng(3)
    s = make_fairseq_state(rng)
    s["quantizer.vars"] = rng.normal(size=(1, 2 * 8, 16)).astype(np.float32)
    s["quantizer.weight_proj.weight"] = rng.normal(size=(16, 512)).astype(np.float32)
    s["quantizer.weight_proj.bias"] = np.zeros(16, np.float32)
    s["project_q.weight"] = rng.normal(size=(32, 32)).astype(np.float32)
    s["project_q.bias"] = np.zeros(32, np.float32)
    s["final_proj.weight"] = rng.normal(size=(32, D)).astype(np.float32)
    s["final_proj.bias"] = np.zeros(32, np.float32)
    params, report = convert_pretrained_state(s, num_layers=L, num_fx_layers=7)
    assert report["missing"] == [] and report["unexpected"] == []
    assert params["quantizer"]["vars"].shape == (16, 16)

    # warm-start a downstream encoder from the pretrained keys
    # (reference: load_fairseq_bin(model.encoder, ...), train.py:221)
    cfg = EncoderConfig(d_model=D, num_heads=H, num_layers=L, dropout=0.0,
                        timestep_masking=0.0, channel_masking=0.0)
    enc = Wav2Vec2Encoder(config=cfg)
    x = np.zeros((1, 4000), np.float32)
    init = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    enc_params = {k: v for k, v in params.items()
                  if k in ("feature_extractor", "layer_norm", "proj_to_input",
                           "mask_emb", "encoder")}
    merged = merge_params(init, enc_params)
    out, _ = enc.apply({"params": merged}, jnp.asarray(x))
    assert np.isfinite(np.asarray(out)).all()

    _, h_t = torch_w2v2_forward(s, x)
    np.testing.assert_allclose(np.asarray(out), h_t, atol=3e-4)


def test_fold_weight_norm(fairseq_ctc_state):
    params, _ = convert_ctc_state(dict(fairseq_ctc_state), num_layers=L)
    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(1).normal(size=(1, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    p1 = merge_params(init, params)
    p2 = fold_weight_norm(p1)
    lp1, _ = model.apply({"params": p1}, jnp.asarray(x))
    lp2, _ = model.apply({"params": p2}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), atol=1e-5)
