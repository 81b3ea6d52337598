"""Odds and ends: 8 kHz conv stack, reduction 'none', dataset BPE targets."""
import numpy as np
import jax
import jax.numpy as jnp

from audio8_tpu.config import AcousticConfig, CONV_FEATURES, PooledConfig, conv_output_length
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2PooledEncoder

SMALL = dict(d_model=32, num_heads=2, num_layers=1, d_ff=64)


def test_8khz_stack():
    cfg = AcousticConfig(num_labels=10, sample_rate=8, **SMALL,
                         timestep_masking=0.0, channel_masking=0.0)
    assert len(cfg.conv_features) == 6
    m = Wav2Vec2AcousticModel(config=cfg)
    x = jnp.zeros((1, 4000))
    params = m.init(jax.random.PRNGKey(0), x)
    lp, _ = m.apply(params, x)
    assert lp.shape[1] == conv_output_length(4000, CONV_FEATURES[8])


def test_pooled_reduction_none():
    cfg = PooledConfig(reduction_type="none", **SMALL,
                       timestep_masking=0.0, channel_masking=0.0)
    m = Wav2Vec2PooledEncoder(config=cfg)
    x = jnp.zeros((2, 4000))
    lens = jnp.asarray([4000, 2000])
    params = m.init(jax.random.PRNGKey(0), x, lens)
    seq, pad = m.apply(params, x, lens)
    assert seq.ndim == 3 and pad.shape == seq.shape[:2]


def test_dataset_bpe_targets(tmp_path):
    """Pre-tokenized .bpe transcripts map pieces to ids without re-BPE
    (data.py:184-193 semantics)."""
    from scipy.io import wavfile
    from audio8_tpu.data.datasets import AudioTextLetterDataset
    from audio8_tpu.models.text import TextVectorizer
    from audio8_tpu.utils import Offsets

    audio_dir = tmp_path / "a"
    audio_dir.mkdir()
    wavfile.write(str(audio_dir / "x.wav"), 16000,
                  np.zeros(8000, np.int16))
    (tmp_path / "t.tsv").write_text(f"{audio_dir}\nx.wav\t8000\n")
    (tmp_path / "t.bpe").write_text("HEL@@ LO\n")
    vocab = {v: i for i, v in enumerate(
        list(Offsets.VALUES) + ["HEL@@", "LO"])}

    class Vec:
        pass

    vec = Vec()
    vec.vocab = vocab
    vec.emit_begin_tok = ["<GO>"]
    vec.emit_end_tok = ["<EOS>"]
    vocab["<GO>"] = Offsets.GO
    vocab["<EOS>"] = Offsets.EOS
    ds = AudioTextLetterDataset(
        str(tmp_path / "t.tsv"), vec, target_tokens_per_batch=20000,
        tgt_type="bpe", is_infinite=False, shuffle=False,
        pad_to_multiple=4000, text_pad_multiple=4)
    batch = next(iter(ds))
    ids = batch["token_ids"][0][: batch["token_lengths"][0]].tolist()
    assert ids == [Offsets.GO, vocab["HEL@@"], vocab["LO"], Offsets.EOS]
