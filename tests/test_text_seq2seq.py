"""Text encoders, BPE, seq2seq decode (KV-cache consistency), dual encoder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import DecoderConfig, EncoderConfig, PooledConfig, TextEncoderConfig
from audio8_tpu.models.dual_encoder import DualEncoderModel, SymmetricCLIPLoss
from audio8_tpu.models.seq2seq import Seq2Seq
from audio8_tpu.models.text import (
    BPEVectorizer,
    SubwordBPE,
    TextTransformerDecoder,
    TextTransformerPooledEncoder,
    TextVectorizer,
    read_vocab_list,
)
from audio8_tpu.ops.masks import sequence_mask
from audio8_tpu.utils import Offsets

SMALL = dict(d_model=64, num_heads=4, num_layers=2, d_ff=128)


def test_read_vocab_list(tmp_path):
    f = tmp_path / "dict.ltr.txt"
    f.write_text("A 100\nB 50\n| 30\n")
    vocab = read_vocab_list(str(f))
    assert vocab[:4] == list(Offsets.VALUES)
    assert vocab[4:] == ["A", "B", "|"]


def test_text_vectorizer():
    vec = TextVectorizer({"A": 4, "B": 5, "<s>": 1, "</s>": 2}, ["<s>"], ["</s>"])
    ids = vec.run(["A", "B", "Z"])
    assert ids.tolist() == [1, 4, 5, Offsets.UNK, 2]


def test_subword_bpe(tmp_path):
    codes = tmp_path / "codes.txt"
    codes.write_text("#version: 0.2\nh e\nhe l\nl o\nlo </w>\n")
    bpe = SubwordBPE(str(codes))
    assert bpe.segment_word("hello") == ["hel@@", "lo"]
    assert bpe.segment_word("he") == ["he"]
    assert bpe.segment_word("lo") == ["lo"]


@pytest.mark.slow
def test_decoder_full_vs_step_consistency(rng):
    """KV-cached stepwise decode must equal the full forward pass."""
    v, b, t_src, t_dst = 20, 2, 7, 5
    dec_cfg = DecoderConfig(vocab_size=v, d_model=32, num_heads=4, num_layers=2,
                            d_ff=64, max_len=16, dropout=0.0)
    m = TextTransformerDecoder(config=dec_cfg)
    memory = jnp.asarray(rng.normal(size=(b, t_src, 32)).astype(np.float32))
    src_mask = jnp.ones((b, t_src), jnp.bool_)
    dst = jnp.asarray(rng.integers(0, v, size=(b, t_dst)).astype(np.int32))
    dst_mask = jnp.ones((b, t_dst), jnp.bool_)
    params = m.init(jax.random.PRNGKey(0), memory, src_mask, dst, dst_mask)

    full = m.apply(params, memory, src_mask, dst, dst_mask)  # (B, T, V)

    cache = m.apply(params, b, t_dst, method=TextTransformerDecoder.init_cache)
    outs = []
    for i in range(t_dst):
        lp, cache = m.apply(params, memory, src_mask, dst[:, i:i + 1], cache,
                            method=TextTransformerDecoder.step)
        outs.append(np.asarray(lp))
    step = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), step, atol=1e-4)


def test_seq2seq_forward_and_decode(rng):
    v = 16
    enc_cfg = EncoderConfig(**SMALL, timestep_masking=0.0, channel_masking=0.0)
    dec_cfg = DecoderConfig(vocab_size=v, d_model=64, num_heads=4, num_layers=1,
                            d_ff=64, max_len=32, dropout=0.0)
    m = Seq2Seq(encoder_config=enc_cfg, decoder_config=dec_cfg)
    x = jnp.asarray(rng.normal(size=(2, 4000)).astype(np.float32))
    lens = jnp.asarray([4000, 2000])
    dst = jnp.asarray(rng.integers(0, v, size=(2, 6)).astype(np.int32))
    dlens = jnp.asarray([6, 4])
    params = m.init(jax.random.PRNGKey(0), x, lens, dst, dlens)
    lp = m.apply(params, x, lens, dst, dlens)
    assert lp.shape == (2, 6, v)
    np.testing.assert_allclose(np.asarray(jnp.exp(lp)).sum(-1), 1.0, rtol=1e-4)

    toks, lengths = m.apply(params, x, lens, 8, method=Seq2Seq.decode)
    assert toks.shape == (2, 8)
    assert np.asarray(lengths).max() <= 8


def test_text_pooled_encoder(rng):
    cfg = TextEncoderConfig(vocab_size=30, d_model=32, num_heads=4, num_layers=2,
                            d_ff=64, rpr_k=4, reduction_type="sha")
    m = TextTransformerPooledEncoder(config=cfg)
    ids = jnp.asarray(rng.integers(0, 30, size=(3, 9)).astype(np.int32))
    lens = jnp.asarray([9, 5, 2])
    params = m.init(jax.random.PRNGKey(0), ids, lens)
    out = m.apply(params, ids, lens)
    assert out.shape == (3, 32)


def test_dual_encoder_and_clip_loss(rng):
    audio_cfg = PooledConfig(**SMALL, reduction_type="max",
                             timestep_masking=0.0, channel_masking=0.0)
    text_cfg = TextEncoderConfig(vocab_size=30, d_model=32, num_heads=2,
                                 num_layers=1, d_ff=64, rpr_k=None,
                                 reduction_type="max")
    m = DualEncoderModel(audio_config=audio_cfg, text_config=text_cfg,
                         output_dim=24)
    audio = jnp.asarray(rng.normal(size=(4, 4000)).astype(np.float32))
    alens = jnp.full((4,), 4000)
    text = jnp.asarray(rng.integers(0, 30, size=(4, 7)).astype(np.int32))
    tlens = jnp.full((4,), 7)
    params = m.init(jax.random.PRNGKey(0), audio, alens, text, tlens)
    a, t = m.apply(params, audio, alens, text, tlens)
    assert a.shape == (4, 24) and t.shape == (4, 24)

    loss_m = SymmetricCLIPLoss(init_temperature=0.07, learn_temperature=True)
    lparams = loss_m.init(jax.random.PRNGKey(1), a, t)
    loss, metrics = loss_m.apply(lparams, a, t)
    assert np.isfinite(float(loss))
    assert "logit_scale" in metrics
    # temperature is learnable
    g = jax.grad(lambda lp: loss_m.apply(lp, a, t)[0])(lparams)
    assert abs(float(g["params"]["logit_scale"])) >= 0


def test_wrd2bpe_cli(tmp_path):
    """Drive the wrd2bpe re-tokenization tool end-to-end: .wrd transcripts
    -> .bpe files + dict.bpe.txt (reference wrd2bpe.py surface)."""
    from audio8_tpu.cli.wrd2bpe import main

    codes = tmp_path / "codes.txt"
    codes.write_text("#version: 0.2\nh e\nhe l\nl o\nlo </w>\n")
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("hel@@ 10\nlo 9\nhe 8\n")
    for split in ["train", "valid"]:
        (tmp_path / f"{split}.tsv").write_text("unused\n")
        (tmp_path / f"{split}.wrd").write_text("hello lo\nhe hello\n")

    main(["--root_dir", str(tmp_path),
          "--train_dataset", "train.tsv", "--valid_dataset", "valid.tsv",
          "--subword_model_file", str(codes),
          "--subword_vocab_file", str(vocab)])

    # the dict must list EVERY id up to the max (an off-by-one here once
    # dropped the highest-id piece)
    from audio8_tpu.models.text import BPEVectorizer
    from audio8_tpu.utils import revlut
    vec = BPEVectorizer(str(codes), str(vocab))
    i2w = revlut(vec.vocab)
    dict_lines = (tmp_path / "dict.bpe.txt").read_text().splitlines()
    assert len(dict_lines) == max(i2w.keys()) + 1
    assert dict_lines[max(i2w.keys())] == i2w[max(i2w.keys())]
    out = (tmp_path / "train.bpe").read_text().splitlines()
    assert out[0] == "hel@@ lo lo"
    assert out[1] == "he hel@@ lo"
    assert (tmp_path / "valid.bpe").read_text() == (tmp_path / "train.bpe").read_text()
