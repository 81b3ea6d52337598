"""Golden parity for the HF transformers converter: a real (randomly
initialized) ``transformers`` Wav2Vec2ForCTC / Wav2Vec2ForPreTraining is
converted and our model must reproduce its forward pass — a stronger
oracle than a hand-written replica, since HF's module tree is the
verification target itself."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audio8_tpu.config import AcousticConfig, PretrainConfig
from audio8_tpu.models.convert import merge_params
from audio8_tpu.models.convert_hf import convert_hf_state, load_hf_dir
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Model

D, H, L, V = 64, 4, 2, 10


def hf_config(**kw):
    base = dict(hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
                intermediate_size=4 * D, vocab_size=V,
                do_stable_layer_norm=False, feat_extract_norm="group",
                layerdrop=0.0)
    base.update(kw)
    return transformers.Wav2Vec2Config(**base)


@pytest.fixture(scope="module")
def hf_ctc():
    torch.manual_seed(0)
    return transformers.Wav2Vec2ForCTC(hf_config()).eval()


def test_hf_ctc_forward_parity(hf_ctc):
    state = {k: v.numpy() for k, v in hf_ctc.state_dict().items()}
    params, report = convert_hf_state(state, num_layers=L, ctc=True)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(0).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        logits_t = hf_ctc(torch.from_numpy(x)).logits
    want = torch.log_softmax(logits_t, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_hf_pretraining_conversion_covers_model():
    torch.manual_seed(1)
    hf = transformers.Wav2Vec2ForPreTraining(hf_config(
        num_codevectors_per_group=8, num_codevector_groups=2,
        codevector_dim=16, proj_codevector_dim=16)).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, report = convert_hf_state(state, num_layers=L, ctc=False)
    assert report["missing"] == [], report["missing"]
    # dropout-only modules aside, everything translates
    assert report["unexpected"] == [], report["unexpected"]

    cfg = PretrainConfig(d_model=D, num_heads=H, num_layers=L, dropout=0.0,
                         dropout_input=0.0, dropout_features=0.0,
                         num_vq_vars=8, num_vq_groups=2, final_dim=16,
                         timestep_masking=0.65)
    model = Wav2Vec2Model(config=cfg)
    sig = jnp.zeros((1, 8000), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    init = model.init(rngs, sig, train=True)["params"]
    merged = merge_params(init, params)
    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    fi, fc = flat(init), flat(params)
    assert set(fc) == set(fi), set(fi) ^ set(fc)
    for k in fi:
        assert tuple(fi[k]) == tuple(fc[k]), k
    # converted weights must run through the pretraining forward
    context_masked, targets_masked, prob_ppl, _ = model.apply(
        {"params": merged}, sig, train=False,
        rngs={"mask": jax.random.PRNGKey(5),
              "gumbel": jax.random.PRNGKey(6)})
    for arr in (context_masked, targets_masked, prob_ppl):
        assert np.all(np.isfinite(np.asarray(arr, np.float32)))


def test_hf_stable_layer_norm_forward_parity(tmp_path):
    """The LV-60/XLSR topology (pre-norm encoder + per-block layer-norm
    extractor + conv bias) converts and matches HF's forward — a model
    family the reference cannot load at all."""
    torch.manual_seed(3)
    hf = transformers.Wav2Vec2ForCTC(hf_config(
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True)).eval()
    d = tmp_path / "lv60"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc=True)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, pre_norm=True,
                         extractor_mode="layer", conv_bias=True)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(1).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    fi, fc = flat(init), flat(params)
    assert set(fc) == set(fi), set(fi) ^ set(fc)
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_hf_convert_cli(tmp_path, hf_ctc):
    """a8t-convert-checkpoint --format auto on an HF dir writes an Orbax
    checkpoint with the HF config's dims (flags ignored for size)."""
    import os

    from audio8_tpu.cli import convert_checkpoint

    d = tmp_path / "hfmodel"
    hf_ctc.save_pretrained(str(d))
    out = tmp_path / "out" / "ckpt"
    convert_checkpoint.main([
        "--input", str(d), "--output", str(out), "--ctc", "true"])
    written = [p for p in os.listdir(tmp_path / "out") if "ckpt" in p]
    assert written, os.listdir(tmp_path / "out")


def test_hf_warmstart_resolve_restart(tmp_path, hf_ctc):
    """--restart_from <hf dir> warm-starts training: a ForCTC export
    fills the whole acoustic tree; a bare Wav2Vec2Model export fills the
    encoder submodule and keeps the fresh CTC head."""
    from audio8_tpu.cli.common import resolve_restart

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = jnp.zeros((1, 4000), jnp.float32)
    init = model.init(jax.random.PRNGKey(0), x)["params"]

    d_ctc = tmp_path / "ctc"
    hf_ctc.save_pretrained(str(d_ctc))
    params, _, step = resolve_restart(str(d_ctc), init, ctc=True,
                                      num_layers=L)
    assert step == 0
    np.testing.assert_allclose(
        params["proj"]["kernel"], hf_ctc.lm_head.weight.detach().numpy().T,
        rtol=1e-6)

    torch.manual_seed(2)
    bare = transformers.Wav2Vec2Model(hf_config()).eval()
    d_bare = tmp_path / "bare"
    bare.save_pretrained(str(d_bare))
    params2, _, _ = resolve_restart(str(d_bare), init, ctc=True,
                                    num_layers=L)
    got = params2["encoder"]["encoder"]["transformer"]["layer_0"][
        "self_attn"]["w_Q"]["kernel"]
    want = bare.encoder.layers[0].attention.q_proj.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # fresh head kept from init
    np.testing.assert_allclose(params2["proj"]["kernel"],
                               init["proj"]["kernel"], rtol=1e-6)


def test_hf_dir_roundtrip(tmp_path, hf_ctc):
    d = tmp_path / "ctc"
    hf_ctc.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc=True)
    assert report["missing"] == []
    kernel = params["proj"]["kernel"]
    want = hf_ctc.lm_head.weight.detach().numpy().T
    np.testing.assert_allclose(kernel, want, rtol=1e-6)


def test_hf_vocab_json(tmp_path):
    """read_vocab_list consumes HF vocab.json with specials at their
    exact indices (no Offsets prepending)."""
    import json as _json

    from audio8_tpu.models.text import read_vocab_list

    vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4,
             "E": 5, "T": 6}
    p = tmp_path / "vocab.json"
    p.write_text(_json.dumps(vocab))
    lst = read_vocab_list(str(p))
    assert lst == ["<pad>", "<s>", "</s>", "<unk>", "|", "E", "T"]


def test_hf_ctc_source_warmstarts_pretrain_model(tmp_path, hf_ctc):
    """A ForCTC export warm-starting a PRETRAIN model must fill the
    encoder body (not silently merge nothing)."""
    from audio8_tpu.cli.common import resolve_restart

    cfg = PretrainConfig(d_model=D, num_heads=H, num_layers=L,
                         num_vq_vars=8, num_vq_groups=2, final_dim=16)
    model = Wav2Vec2Model(config=cfg)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    init = model.init(rngs, jnp.zeros((1, 8000), jnp.float32),
                      train=False)["params"]
    d = tmp_path / "ctcsrc"
    hf_ctc.save_pretrained(str(d))
    params, _, _ = resolve_restart(str(d), init, ctc=False, num_layers=L)
    got = params["encoder"]["transformer"]["layer_0"]["self_attn"]["w_Q"]["kernel"]
    want = hf_ctc.wav2vec2.encoder.layers[0].attention.q_proj.weight
    np.testing.assert_allclose(got, want.detach().numpy().T, rtol=1e-6)


def test_hf_topology_mismatch_raises(tmp_path):
    """Warm-starting a post-norm model from a stable-LN HF dir must fail
    loudly (a silent merge would leave LayerNorms at random init)."""
    from audio8_tpu.cli.common import resolve_restart

    torch.manual_seed(5)
    hf = transformers.Wav2Vec2ForCTC(hf_config(
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=True)).eval()
    d = tmp_path / "lv60"
    hf.save_pretrained(str(d))
    with pytest.raises(ValueError, match="topology"):
        resolve_restart(str(d), {}, ctc=True, num_layers=L)


def hubert_config(**kw):
    base = dict(hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
                intermediate_size=4 * D, vocab_size=V,
                do_stable_layer_norm=False, feat_extract_norm="group",
                layerdrop=0.0)
    base.update(kw)
    return transformers.HubertConfig(**base)


def test_hf_hubert_ctc_forward_parity(tmp_path):
    """HubertForCTC converts through the same translation (the HF module
    tree is key-for-key Wav2Vec2's under the ``hubert.`` prefix) and our
    group-norm post-norm acoustic model reproduces its forward — a model
    family the reference cannot load at all."""
    torch.manual_seed(4)
    hf = transformers.HubertForCTC(hubert_config()).eval()
    d = tmp_path / "hubert"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc="auto")
    assert report["kind"] == "ctc"
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(2).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_hf_hubert_large_topology_parity(tmp_path):
    """hubert-large's stable-LN / layer-norm-extractor topology (the
    --preset hubert-large layout) converts and matches HF's forward."""
    torch.manual_seed(5)
    hf = transformers.HubertForCTC(hubert_config(
        do_stable_layer_norm=True, feat_extract_norm="layer",
        conv_bias=False)).eval()
    d = tmp_path / "hubert-large"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc=True)
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    assert report["topology"] == {"pre_norm": True,
                                  "extractor_mode": "layer",
                                  "conv_bias": False,
                                  "pos_conv_depth": 1,
                                  "gated_rel_pos": False}

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, pre_norm=True,
                         extractor_mode="layer", conv_bias=False)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(3).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)


def test_hubert_large_preset():
    from audio8_tpu.cli.train import parse_args

    args = parse_args(["--basedir", "x", "--root_dir", "y",
                       "--train_dataset", "t.tsv",
                       "--valid_dataset", "v.tsv",
                       "--preset", "hubert-large"])
    assert (args.d_model, args.num_layers, args.pre_norm,
            args.extractor_mode, args.conv_bias) == (
        1024, 24, True, "layer", False)


def test_hf_data2vec_ctc_forward_parity(tmp_path):
    """Data2VecAudioForCTC converts (layer-norm extractor + 5-deep plain
    positional conv stack, pos_conv_depth=5/k=19) and our forward matches
    HF's — a third model family beyond the reference."""
    torch.manual_seed(6)
    hf = transformers.Data2VecAudioForCTC(transformers.Data2VecAudioConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=4 * D, vocab_size=V, layerdrop=0.0)).eval()
    d = tmp_path / "d2v"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc="auto")
    assert report["kind"] == "ctc"
    assert report["topology"] == {"pre_norm": False,
                                  "extractor_mode": "layer",
                                  "conv_bias": False,
                                  "pos_conv_depth": 5,
                                  "gated_rel_pos": False}
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, extractor_mode="layer",
                         conv_bias=False, pos_conv_depth=5,
                         conv_pos_kernel=19)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(4).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    fi, fc = flat(init), flat(params)
    assert set(fc) == set(fi), set(fi) ^ set(fc)
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_data2vec_preset():
    from audio8_tpu.cli.train import parse_args

    args = parse_args(["--basedir", "x", "--root_dir", "y",
                       "--train_dataset", "t.tsv",
                       "--valid_dataset", "v.tsv",
                       "--preset", "data2vec-base"])
    assert (args.d_model, args.extractor_mode, args.pos_conv_depth,
            args.conv_pos_kernel, args.pre_norm) == (
        768, "layer", 5, 19, False)


def test_hf_wavlm_ctc_forward_parity(tmp_path):
    """WavLMForCTC converts (gated relative position bias: shared
    320-bucket table + per-layer gates) and our forward matches HF's —
    a fourth model family beyond the reference."""
    torch.manual_seed(7)
    hf = transformers.WavLMForCTC(transformers.WavLMConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=4 * D, vocab_size=V, layerdrop=0.0)).eval()
    d = tmp_path / "wavlm"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc="auto")
    assert report["kind"] == "ctc"
    assert report["topology"] == {"pre_norm": False,
                                  "extractor_mode": "group",
                                  "conv_bias": False,
                                  "pos_conv_depth": 1,
                                  "gated_rel_pos": True}
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, gated_rel_pos=True)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(5).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    fi, fc = flat(init), flat(params)
    assert set(fc) == set(fi), set(fi) ^ set(fc)
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


def test_hf_wavlm_large_topology_parity(tmp_path):
    """wavlm-large layout: gated rel-pos bias combined with the stable-LN
    (pre-norm + layer-norm-extractor) topology, encoder-only export."""
    torch.manual_seed(8)
    hf = transformers.WavLMModel(transformers.WavLMConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=4 * D, vocab_size=V, layerdrop=0.0,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        num_buckets=32, max_bucket_distance=16)).eval()
    d = tmp_path / "wavlm_large"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d))
    assert report["kind"] == "pretrained"
    assert report["topology"]["pre_norm"] is True
    assert report["topology"]["gated_rel_pos"] is True
    # encoder-only export: only pretraining heads may be missing
    assert all(k.split(".")[0] in ("quantizer", "project_q", "final_proj")
               for k in report["missing"]), report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    from audio8_tpu.config import EncoderConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder

    cfg = EncoderConfig(d_model=D, num_heads=H, num_layers=L, dropout=0.0,
                        timestep_masking=0.0, channel_masking=0.0,
                        pre_norm=True, extractor_mode="layer",
                        gated_rel_pos=True, rel_pos_buckets=32,
                        rel_pos_max_distance=16, freeze_fx=False)
    model = Wav2Vec2Encoder(config=cfg)
    x = np.random.default_rng(6).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    # a pretrained Wav2Vec2Model tree is layout-compatible with
    # Wav2Vec2Encoder (the extra quantizer/head keys are dropped)
    out, _ = model.apply({"params": merge_params(init, params)},
                         jnp.asarray(x))
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(out), want, atol=3e-4)


def test_wavlm_bucket_parity():
    """Our static relative_position_buckets matches HF
    WavLMAttention._relative_positions_bucket exactly."""
    from audio8_tpu.nn.transformer import relative_position_buckets

    attn = transformers.models.wavlm.modeling_wavlm.WavLMAttention(
        embed_dim=D, num_heads=H, num_buckets=320, max_distance=800)
    t = 257
    rel = (torch.arange(t, dtype=torch.long)[None, :]
           - torch.arange(t, dtype=torch.long)[:, None])
    want = attn._relative_positions_bucket(rel).numpy()
    got = relative_position_buckets(t, t, 320, 800)
    np.testing.assert_array_equal(got, want)

    attn_small = transformers.models.wavlm.modeling_wavlm.WavLMAttention(
        embed_dim=D, num_heads=H, num_buckets=32, max_distance=16)
    want = attn_small._relative_positions_bucket(rel).numpy()
    got = relative_position_buckets(t, t, 32, 16)
    np.testing.assert_array_equal(got, want)


def test_wavlm_preset():
    from audio8_tpu.cli.train import parse_args

    args = parse_args(["--basedir", "x", "--root_dir", "y",
                       "--train_dataset", "t.tsv",
                       "--valid_dataset", "v.tsv",
                       "--preset", "wavlm-large"])
    assert (args.d_model, args.num_layers, args.pre_norm,
            args.extractor_mode, args.gated_rel_pos,
            args.rel_pos_buckets, args.rel_pos_max_distance) == (
        1024, 24, True, "layer", True, 320, 800)


@pytest.mark.slow
def test_wavlm_gate_grads_flow():
    """Training path: gradients reach the gate params and the shared
    bias table (the WavLM additions are trainable, not inference-only)."""
    from audio8_tpu.config import EncoderConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder

    cfg = EncoderConfig(d_model=D, num_heads=H, num_layers=L, dropout=0.0,
                        timestep_masking=0.0, channel_masking=0.0,
                        gated_rel_pos=True, rel_pos_buckets=32,
                        rel_pos_max_distance=16, freeze_fx=False)
    model = Wav2Vec2Encoder(config=cfg)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 4000)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    grads = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, x)[0] ** 2))(params)
    enc = grads["encoder"]["transformer"]
    assert float(np.abs(
        enc["rel_pos_bias"]["rel_attn_embed"]["embedding"]).max()) > 0
    lyr = enc["layer_0"]["self_attn"]
    assert float(np.abs(lyr["gru_rel_pos_linear"]["kernel"]).max()) > 0
    assert float(np.abs(lyr["gru_rel_pos_const"]).max()) > 0


def test_wavlm_fairseq_native_key_aliases():
    """Official (unilm/fairseq) WavLM .pt files spell the gate params
    grep_linear/grep_a and the bucket table relative_attention_bias; the
    structural converter canonicalizes those to the HF-style names."""
    from audio8_tpu.models.convert import convert_pretrained_state
    from audio8_tpu.models.convert_hf import hf_to_fairseq_state

    torch.manual_seed(9)
    hf = transformers.WavLMModel(transformers.WavLMConfig(
        hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
        intermediate_size=4 * D, vocab_size=V, layerdrop=0.0)).eval()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    fs, skipped = hf_to_fairseq_state(state)
    assert skipped == [], skipped
    unilm = {}
    for k, v in fs.items():
        k = (k.replace(".self_attn.gru_rel_pos_linear.",
                       ".self_attn.grep_linear.")
             .replace(".self_attn.gru_rel_pos_const", ".self_attn.grep_a")
             .replace(".self_attn.rel_attn_embed.",
                      ".self_attn.relative_attention_bias."))
        unilm[k] = v
    assert any(".grep_linear." in k for k in unilm)
    params, report = convert_pretrained_state(
        unilm, num_layers=L, gated_rel_pos=True)
    assert all(k.split(".")[0] in ("quantizer", "project_q", "final_proj")
               for k in report["missing"]), report["missing"]
    assert report["unexpected"] == [], report["unexpected"]
    np.testing.assert_allclose(
        params["encoder"]["transformer"]["rel_pos_bias"]["rel_attn_embed"][
            "embedding"],
        hf.encoder.layers[0].attention.rel_attn_embed.weight.detach().numpy())
    np.testing.assert_allclose(
        params["encoder"]["transformer"]["layer_1"]["self_attn"][
            "gru_rel_pos_linear"]["kernel"],
        hf.encoder.layers[1].attention.gru_rel_pos_linear.weight
        .detach().numpy().T)


@pytest.mark.parametrize("pos_type", ["rotary", "relative"])
def test_hf_conformer_ctc_forward_parity(tmp_path, pos_type):
    """Wav2Vec2ConformerForCTC converts (macaron blocks, rotary or
    Transformer-XL relative positions, conv-module BatchNorm folded to a
    frozen affine) and our forward matches HF's — a fifth model family
    beyond the reference."""
    torch.manual_seed(10)
    hf = transformers.Wav2Vec2ConformerForCTC(
        transformers.Wav2Vec2ConformerConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=4 * D, vocab_size=V, layerdrop=0.0,
            position_embeddings_type=pos_type, hidden_act="swish")).eval()
    # non-trivial BN statistics so the folding is actually exercised
    for layer in hf.wav2vec2_conformer.encoder.layers:
        bn = layer.conv_module.batch_norm
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
    d = tmp_path / "conformer"
    hf.save_pretrained(str(d))
    params, report = load_hf_dir(str(d), ctc="auto")
    assert report["kind"] == "ctc"
    assert report["topology"]["encoder_type"] == "conformer"
    assert report["topology"]["position_embeddings_type"] == pos_type
    assert report["missing"] == [], report["missing"]
    assert report["unexpected"] == [], report["unexpected"]

    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0,
                         extractor_mode=hf.config.feat_extract_norm,
                         conv_bias=hf.config.conv_bias,
                         encoder_type="conformer",
                         position_embeddings_type=pos_type,
                         conformer_activation="swish")
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(7).normal(size=(2, 4000)).astype(np.float32)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    flat = lambda t: {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_leaves_with_path(t)}
    assert set(flat(params)) == set(flat(init))
    merged = merge_params(init, params)

    lp, _ = model.apply({"params": merged}, jnp.asarray(x))
    with torch.no_grad():
        want = torch.log_softmax(hf(torch.from_numpy(x)).logits, -1).numpy()
    np.testing.assert_allclose(np.asarray(lp), want, atol=3e-4)
    assert (np.argmax(np.asarray(lp), -1) == np.argmax(want, -1)).mean() > 0.999


@pytest.mark.slow
def test_hf_conformer_pad_mask_parity(tmp_path):
    """Conformer forward with per-row lengths matches HF's
    attention_mask path (relative positions interact with masking)."""
    torch.manual_seed(12)
    # layer-norm extractor: padding-invariant per construction (the
    # group-norm extractor's statistics see HF's zero padding — a
    # documented deviation, docs/PARITY.md — and the released conformer
    # checkpoints are layer-norm anyway)
    hf = transformers.Wav2Vec2ConformerForCTC(
        transformers.Wav2Vec2ConformerConfig(
            hidden_size=D, num_hidden_layers=L, num_attention_heads=H,
            intermediate_size=4 * D, vocab_size=V, layerdrop=0.0,
            position_embeddings_type="relative", hidden_act="swish",
            feat_extract_norm="layer", conv_bias=True)).eval()
    d = tmp_path / "c"
    hf.save_pretrained(str(d))
    params, _ = load_hf_dir(str(d), ctc=True)
    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=L,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0,
                         extractor_mode=hf.config.feat_extract_norm,
                         conv_bias=hf.config.conv_bias,
                         encoder_type="conformer",
                         position_embeddings_type="relative",
                         conformer_activation="swish", freeze_fx=False)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = np.random.default_rng(8).normal(size=(2, 4800)).astype(np.float32)
    lens = np.array([4800, 3200], np.int32)
    x[1, 3200:] = 0.0
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    lp, pm = model.apply({"params": merge_params(init, params)},
                         jnp.asarray(x), jnp.asarray(lens))
    attn = torch.zeros(2, 4800, dtype=torch.long)
    attn[0] = 1
    attn[1, :3200] = 1
    with torch.no_grad():
        want = torch.log_softmax(
            hf(torch.from_numpy(x), attention_mask=attn).logits, -1).numpy()
    fl = np.asarray(pm.sum(-1))
    for i in range(2):
        np.testing.assert_allclose(np.asarray(lp)[i, :fl[i]],
                                   want[i, :fl[i]], atol=5e-4)


@pytest.mark.slow
def test_conformer_preset_and_grads():
    from audio8_tpu.cli.train import parse_args

    args = parse_args(["--basedir", "x", "--root_dir", "y",
                       "--train_dataset", "t.tsv",
                       "--valid_dataset", "v.tsv",
                       "--preset", "conformer-large-rope"])
    assert (args.d_model, args.num_layers, args.encoder_type,
            args.position_embeddings_type, args.extractor_mode,
            args.conformer_activation) == (
        1024, 24, "conformer", "rotary", "layer", "swish")

    # training path: grads reach the conformer-specific params
    cfg = AcousticConfig(num_labels=V, d_model=D, num_heads=H, num_layers=1,
                         dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0, encoder_type="conformer",
                         position_embeddings_type="relative",
                         freeze_fx=False)
    model = Wav2Vec2AcousticModel(config=cfg)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 4000)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    grads = jax.grad(
        lambda p: jnp.sum(
            model.apply({"params": p}, x, freeze=False)[0] ** 2))(params)
    lyr = grads["encoder"]["encoder"]["transformer"]["layer_0"]
    for leaf in (lyr["self_attn"]["pos_bias_u"], lyr["conv"]["bn_scale"],
                 lyr["conv"]["dw"]["kernel"], lyr["ffn1"]["expand"]["kernel"]):
        assert float(np.abs(leaf).max()) > 0
