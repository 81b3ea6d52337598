"""Data pipeline tests on tiny synthetic WAV fixtures (SURVEY.md §4c)."""
import os

import numpy as np
import pytest

from audio8_tpu.data.audio import SoundfileAudioReader, AudioResampleReader, read_wav
from audio8_tpu.data.datasets import (
    AudioFileDataset,
    AudioTextLetterDataset,
    BucketingAudioDataset,
    PrefetchLoader,
    batch_by_size,
    find_fit,
)
from audio8_tpu.models.text import TextVectorizer
from audio8_tpu.utils import Offsets


def write_wav(path, n, sr=16000, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    data = (rng.normal(size=n) * 8000).astype(np.int16)
    wavfile.write(path, sr, data)
    return data


@pytest.fixture
def corpus(tmp_path):
    """Tiny manifest + transcripts: 6 wav files of varying lengths."""
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    lengths = [8000, 12000, 16000, 20000, 24000, 32000]
    words = ["CAT", "DOG BIT", "SO IT GOES", "A", "HELLO WORLD", "YES NO"]
    tsv = tmp_path / "train.tsv"
    ltr = tmp_path / "train.ltr"
    with open(tsv, "w") as tf, open(ltr, "w") as lf:
        tf.write(str(audio_dir) + "\n")
        for i, (n, w) in enumerate(zip(lengths, words)):
            name = f"clip{i}.wav"
            write_wav(str(audio_dir / name), n, seed=i)
            tf.write(f"{name}\t{n}\n")
            letters = " ".join("|".join(w.split()).replace("", " ").split()) + " |"
            lf.write(letters + "\n")
    return tmp_path


def letter_vocab():
    letters = sorted(set("ABCDEFGHIJKLMNOPQRSTUVWXYZ|"))
    toks = list(Offsets.VALUES) + letters
    return {t: i for i, t in enumerate(toks)}


def test_read_wav_roundtrip(tmp_path):
    p = str(tmp_path / "x.wav")
    data = write_wav(p, 1000)
    wav, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(wav, data.astype(np.float32) / 32768.0)


def _write_sphere(path, data, sr=16000, coding="pcm", byte_fmt="01",
                  sample_bytes=None):
    """Minimal NIST SPHERE writer for test fixtures."""
    if sample_bytes is None:
        sample_bytes = 1 if "ulaw" in coding else 2
    hdr = (f"NIST_1A\n   1024\nsample_rate -i {sr}\nchannel_count -i 1\n"
           f"sample_n_bytes -i {sample_bytes}\n"
           f"sample_coding -s{len(coding)} {coding}\n"
           f"sample_byte_format -s{len(byte_fmt)} {byte_fmt}\nend_head\n")
    with open(path, "wb") as f:
        f.write(hdr.encode().ljust(1024, b" "))
        f.write(data.tobytes())


def test_read_sphere_pcm(tmp_path):
    from audio8_tpu.data.audio import read_sphere

    rng = np.random.default_rng(0)
    pcm = (rng.normal(size=500) * 8000).astype("<i2")
    p = str(tmp_path / "x.sph")
    _write_sphere(p, pcm)
    wav, sr = read_sphere(p)
    assert sr == 16000
    np.testing.assert_allclose(wav, pcm.astype(np.float32) / 32768.0)

    # big-endian payload
    _write_sphere(p, pcm.astype(">i2"), byte_fmt="10")
    wav_be, _ = read_sphere(p)
    np.testing.assert_allclose(wav_be, wav)

    # shorten-compressed: actionable error
    _write_sphere(p, pcm, coding="pcm,embedded-shorten-v2.00")
    with pytest.raises(ValueError, match="sph2pipe"):
        read_sphere(p)


def test_read_sphere_pcm_widths(tmp_path):
    """1-byte linear PCM decodes as int8 (not garbage int32); unsupported
    widths fail actionably."""
    from audio8_tpu.data.audio import read_sphere

    rng = np.random.default_rng(3)
    p = str(tmp_path / "w.sph")
    pcm8 = (rng.normal(size=300) * 60).astype(np.int8)
    _write_sphere(p, pcm8, sample_bytes=1)
    wav, sr = read_sphere(p)
    assert wav.shape == (300,)
    np.testing.assert_allclose(wav, pcm8.astype(np.float32) / 128.0)

    pcm32 = (rng.normal(size=200) * 2**25).astype("<i4")
    _write_sphere(p, pcm32, sample_bytes=4)
    wav32, _ = read_sphere(p)
    np.testing.assert_allclose(wav32, pcm32.astype(np.float32) / 2**31)

    _write_sphere(p, pcm8, sample_bytes=3)
    with pytest.raises(ValueError, match="sample_n_bytes"):
        read_sphere(p)


def test_read_sphere_ulaw(tmp_path):
    """mu-law roundtrip: encode linear -> ulaw bytes, decoder inverts to
    within one quantization step."""
    from audio8_tpu.data.audio import read_sphere

    def ulaw_encode(x):
        BIAS, CLIP = 0x84, 32635
        x = np.clip(x.astype(np.int32), -CLIP, CLIP)
        sign = np.where(x < 0, 0x80, 0)
        x = np.abs(x) + BIAS
        exp = (np.floor(np.log2(x)) - 7).clip(0, 7).astype(np.int32)
        mant = (x >> (exp + 3)) & 0x0F
        return (~(sign | (exp << 4) | mant)).astype(np.uint8)

    rng = np.random.default_rng(1)
    pcm = (rng.normal(size=400) * 6000).astype(np.int16)
    p = str(tmp_path / "u.sph")
    _write_sphere(p, ulaw_encode(pcm), coding="ulaw")
    wav, sr = read_sphere(p)
    err = np.abs(wav * 32768.0 - pcm)
    # mu-law quantization error grows with magnitude; bound by segment size
    assert np.all(err <= np.maximum(np.abs(pcm) / 16.0, 32.0))


def test_read_aiff(tmp_path):
    import struct

    from audio8_tpu.data.audio import read_aiff

    rng = np.random.default_rng(2)
    pcm = (rng.normal(size=300) * 8000).astype(">i2")
    # 80-bit float for 16000: exponent 16383+13, mantissa 16000<<50
    sr80 = struct.pack(">HQ", 16383 + 13, 16000 << 50)
    comm = struct.pack(">hIh", 1, len(pcm), 16) + sr80
    ssnd = struct.pack(">II", 0, 0) + pcm.tobytes()
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    p = str(tmp_path / "x.aiff")
    with open(p, "wb") as f:
        f.write(b"FORM" + struct.pack(">I", len(body)) + body)
    wav, sr = read_aiff(p)
    assert sr == 16000
    np.testing.assert_allclose(
        wav, pcm.astype(np.int16).astype(np.float32) / 32768.0)


def test_unsupported_format_is_actionable(tmp_path):
    from audio8_tpu.data.audio import read_audio

    p = str(tmp_path / "x.ogg")
    with open(p, "wb") as f:
        f.write(b"OggS\x00\x00")
    with pytest.raises(ValueError, match="soundfile"):
        read_audio(p)
    # reader dispatch goes through read_audio, so the dataset path gets
    # the same actionable error (not a cryptic wavfile failure)
    with pytest.raises(ValueError, match="Ogg"):
        SoundfileAudioReader().read(p)


def test_resample_reader(tmp_path):
    p = str(tmp_path / "x.wav")
    write_wav(p, 1000)
    r = AudioResampleReader(0.5)
    wav = r.read(p)
    assert len(wav) == 500
    assert wav.dtype == np.float32


def test_batch_by_size():
    sizes = [100, 90, 80, 50, 40]
    batches = batch_by_size(list(range(5)), sizes, max_tokens=200, max_sentences=128)
    # greedy: [0] (2*100=200 ok, 3*100>200 at idx2 close)... verify budget
    for b in batches:
        mx = max(sizes[i] for i in b)
        assert len(b) * mx <= 200 or len(b) == 1
    assert sorted(i for b in batches for i in b) == list(range(5))


def test_find_fit():
    assert find_fit(1000, [256, 512, 2048]) == 512
    assert find_fit(100, [256, 512]) == 0
    assert find_fit(5000, [256, 512, 2048]) == 2048


def test_audio_text_dataset(corpus):
    vec = TextVectorizer(letter_vocab())
    ds = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, target_tokens_per_batch=40000,
        is_infinite=False, shuffle=False, pad_to_multiple=4000,
        text_pad_multiple=8,
    )
    batches = list(iter(ds))
    assert batches
    total = sum(len(b["files"]) for b in batches)
    assert total == 6
    for b in batches:
        assert b["signal"].shape[1] % 4000 == 0
        assert b["signal"].dtype == np.float32
        assert b["token_ids"].shape[1] % 8 == 0
        assert (b["signal_lengths"] <= b["signal"].shape[1]).all()
        # padding beyond lengths is zero / PAD
        for i, l in enumerate(b["signal_lengths"]):
            assert np.all(b["signal"][i, l:] == 0.0)
        for i, l in enumerate(b["token_lengths"]):
            assert np.all(b["token_ids"][i, l:] == Offsets.PAD)
    # batches are emitted longest-first (desc sort)
    assert batches[0]["signal_lengths"].max() == 32000


def test_audio_text_dataset_sharding(corpus):
    vec = TextVectorizer(letter_vocab())
    common = dict(target_tokens_per_batch=33000, is_infinite=False, shuffle=False)
    all_files = set()
    for shard in range(2):
        ds = AudioTextLetterDataset(
            str(corpus / "train.tsv"), vec, shard_index=shard, num_shards=2, **common)
        for b in iter(ds):
            all_files.update(b["files"])
    assert len(all_files) == 6


def test_audio_file_dataset_dense_batches(corpus):
    ds = AudioFileDataset(
        str(corpus / "train.tsv"), max_length=20000,
        target_tokens_per_batch=30000, shuffle=False)
    it = iter(ds)
    b = next(it)
    assert b.ndim == 2
    assert b.shape[0] * b.shape[1] >= 16000  # dense, min-cropped
    assert b.dtype == np.float32


def test_bucketing_dataset(corpus):
    buckets = [8000, 16000, 24000]
    ds = BucketingAudioDataset(
        buckets, str(corpus / "train.tsv"), max_length=32000,
        target_tokens_per_batch=24000, shuffle=False)
    it = iter(ds)
    shapes = {next(it).shape[1] for _ in range(6)}
    assert shapes.issubset(set(buckets))


def test_prefetch_loader(corpus):
    vec = TextVectorizer(letter_vocab())
    ds = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, target_tokens_per_batch=40000,
        is_infinite=False, shuffle=False)
    direct = [b["files"] for b in iter(ds)]
    loaded = [b["files"] for b in PrefetchLoader(ds, prefetch=2)]
    assert direct == loaded


def test_prefetch_loader_workers_identical_stream(corpus):
    """num_workers > 1 materializes batches on a thread pool, but the
    emitted stream (order AND content, incl. augmentation randomness)
    is identical to direct iteration: plans are drawn sequentially."""
    def make():
        return AudioTextLetterDataset(
            str(corpus / "train.tsv"), TextVectorizer(letter_vocab()),
            target_tokens_per_batch=33000, is_infinite=False,
            shuffle=True, seed=3, speed_perturb=(0.9, 1.0, 1.1))

    direct = list(iter(make()))
    loader = PrefetchLoader(make(), num_workers=4, prefetch=2)
    loader.num_workers = 4  # bypass the cpu_count clamp: exercise the pool
    parallel = list(loader)
    assert len(direct) == len(parallel)
    for d, p in zip(direct, parallel):
        assert d["files"] == p["files"]
        np.testing.assert_array_equal(d["signal"], p["signal"])
        np.testing.assert_array_equal(d["token_ids"], p["token_ids"])

    # dense pretrain stream too
    def make_dense():
        return AudioFileDataset(
            str(corpus / "train.tsv"), max_length=20000,
            target_tokens_per_batch=30000, shuffle=True, seed=5)

    dense_loader = PrefetchLoader(make_dense(), num_workers=3, prefetch=2)
    dense_loader.num_workers = 3  # bypass the cpu_count clamp
    d_it, p_it = iter(make_dense()), iter(dense_loader)
    for _ in range(5):
        np.testing.assert_array_equal(next(d_it), next(p_it))


def test_tsv_substring_in_directory_name(tmp_path):
    """Transcript resolution swaps the EXTENSION: a path containing 'tsv'
    as a substring (e.g. a tsv_data/ directory) must not be rewritten
    (the reference's str.replace bug, data.py:171 — deliberately fixed)."""
    root = tmp_path / "tsv_data"
    root.mkdir()
    audio_dir = root / "audio"
    audio_dir.mkdir()
    write_wav(str(audio_dir / "a.wav"), 8000)
    with open(root / "train.tsv", "w") as f:
        f.write(str(audio_dir) + "\na.wav\t8000\n")
    with open(root / "train.ltr", "w") as f:
        f.write("C A T |\n")
    ds = AudioTextLetterDataset(
        str(root / "train.tsv"), TextVectorizer(letter_vocab()),
        target_tokens_per_batch=40000, is_infinite=False, shuffle=False)
    batches = list(iter(ds))
    assert len(batches) == 1 and len(batches[0]["files"]) == 1


def test_audio_text_dataset_length_grid(corpus):
    """Geometric audio-length grid bounds the distinct batch shapes."""
    vec = TextVectorizer(letter_vocab())
    grid = [10000, 20000, 40000]
    ds = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, target_tokens_per_batch=40000,
        is_infinite=False, shuffle=False, length_grid=grid,
        text_pad_multiple=8)
    shapes = {b["signal"].shape[1] for b in iter(ds)}
    assert shapes.issubset(set(grid))


def test_lane_aligned_length_inverse_exact():
    """max_input_for_output is the exact, maximal inverse of the conv
    stack's length function for both sample-rate stacks."""
    from audio8_tpu.config import (CONV_FEATURES, conv_output_length,
                                   max_input_for_output)
    for sr in (16, 8):
        cf = CONV_FEATURES[sr]
        for frames in (1, 2, 33, 127, 128, 129, 512, 546, 640, 1000):
            t = max_input_for_output(frames, cf)
            assert conv_output_length(t, cf) == frames
            # maximality: one more full stride must bump the frame count
            stride = 1
            for _, _, s in cf:
                stride *= s
            assert conv_output_length(t + stride, cf) > frames


def test_lane_aligned_length_guards():
    from audio8_tpu.config import (CONV_FEATURES, conv_output_length,
                                   lane_aligned_length)
    cf = CONV_FEATURES[16]
    # the bench case: T'=546 snaps down to exactly 512 (6% crop)
    t = lane_aligned_length(175_000, cf)
    assert conv_output_length(t, cf) == 512
    # T' already aligned: unchanged
    assert lane_aligned_length(t, cf) == t
    # below one tile: unchanged
    assert lane_aligned_length(11_111, cf) == 11_111
    # crop > max_crop (T'=195 -> 128 would drop ~34%): unchanged
    assert lane_aligned_length(62_500, cf) == 62_500
    assert lane_aligned_length(62_500, cf, max_crop=0.5) != 62_500


def test_lane_aligned_grid_keeps_coverage():
    """Guarded snapping preserves every length class (no mid-grid collapse)
    while aligning the large buckets to MXU tiles."""
    from audio8_tpu.cli.pretrain import DEFAULT_BUCKETS
    from audio8_tpu.config import (CONV_FEATURES, conv_output_length,
                                   lane_aligned_grid)
    cf = CONV_FEATURES[16]
    grid = lane_aligned_grid(DEFAULT_BUCKETS, cf)
    # every length class survives: entries whose snap would collide with
    # an earlier entry pass through unchanged instead of collapsing a
    # grid level (which would compound the per-clip crop past the guard)
    assert len(grid) == len(DEFAULT_BUCKETS)
    assert grid == sorted(grid)
    frames = [conv_output_length(g, cf) for g in grid]
    # the big buckets land exactly on tile boundaries
    assert {256, 384, 512, 768}.issubset({f for f in frames})
    # nothing was cropped by more than the guard
    for raw in DEFAULT_BUCKETS:
        f_raw = conv_output_length(raw, cf)
        best = max((f for f in frames if f <= f_raw), default=None)
        assert best is not None and (f_raw - best) / f_raw <= 0.1 + 1e-9


def test_pretrain_cli_lane_align_flag():
    from audio8_tpu.cli.pretrain import DEFAULT_BUCKETS, parse_args
    from audio8_tpu.config import CONV_FEATURES, lane_aligned_grid
    base = ["--manifest_dir", "/tmp"]
    on = parse_args(base)
    assert on.buckets == lane_aligned_grid(DEFAULT_BUCKETS, CONV_FEATURES[16])
    off = parse_args(base + ["--lane_align", "false"])
    assert off.buckets == DEFAULT_BUCKETS


def test_lane_aligned_pad_rules():
    from audio8_tpu.config import (CONV_FEATURES, conv_output_length,
                                   lane_aligned_pad, max_input_for_output)
    cf = CONV_FEATURES[16]
    # data needs T'=127 (one tile) but the 16k-multiple grid rounds to
    # 48000 (T'=149, two tiles): clamp to the boundary's largest preimage
    t = lane_aligned_pad(48_000, 41_000, cf)
    assert t == max_input_for_output(128, cf)
    assert t >= 41_000 and conv_output_length(t, cf) == 128
    # pad target within the same tile set: untouched (cheaper linear term)
    assert lane_aligned_pad(41_359, 41_000, cf) == 41_359
    assert lane_aligned_pad(41_200, 41_000, cf) == 41_200
    # pad target only slightly over, but still a new tile: clamp
    assert lane_aligned_pad(42_000, 41_000, cf) == max_input_for_output(128, cf)
    # data itself crosses the boundary: two tiles are required, keep t_pad
    assert lane_aligned_pad(48_000, 47_000, cf) == 48_000
    # sub-tile shapes never snap up
    assert lane_aligned_pad(16_000, 9_000, cf) == 16_000
    # degenerate: a batch of sub-receptive-field stubs (frames_needed=0)
    # must keep a frame-producing pad, not collapse to 399 samples
    t = lane_aligned_pad(16_000, 300, cf)
    assert t == 16_000 and conv_output_length(t, cf) > 0


def test_dataset_lane_align_pads_to_boundary(corpus):
    """With lane_align on, emitted audio lengths whose frame count would
    overshoot a 128-frame tile boundary clamp to the boundary preimage,
    and no clip is ever cropped."""
    from audio8_tpu.config import CONV_FEATURES, conv_output_length
    vec = TextVectorizer(letter_vocab())
    common = dict(
        target_tokens_per_batch=40_000, shuffle=False, is_infinite=False,
        pad_to_multiple=16_000)
    ds = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, lane_align=True, **common)
    base = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, lane_align=False, **common)
    cf = CONV_FEATURES[16]
    got = list(iter(ds))
    assert got, "no batches"
    for b, raw in zip(got, iter(base)):
        t = b["signal"].shape[1]
        frames = conv_output_length(t, cf)
        # never longer than the unaligned pad, never crops real audio
        assert t <= raw["signal"].shape[1]
        assert t >= int(max(b["signal_lengths"]))
        if frames >= 128:
            # within one tile of what the longest real clip requires
            need = conv_output_length(int(max(b["signal_lengths"])), cf)
            assert frames <= -(-need // 128) * 128
    # the 6-clip corpus max is 32000 samples (T'=99 < 128): the sub-tile
    # batches must be identical to the unaligned pipeline
    assert all(
        a["signal"].shape == b["signal"].shape
        for a, b in zip(got, iter(base)))


def test_lane_aligned_chunk_snaps_up():
    from audio8_tpu.config import (CONV_FEATURES, conv_output_length,
                                   lane_aligned_chunk)
    cf = CONV_FEATURES[16]
    # the serving default: 30s chunk (T'=1499) -> T'=1536 exactly
    t = lane_aligned_chunk(480_000, cf)
    assert conv_output_length(t, cf) == 1536 and t >= 480_000
    # already on a boundary: fixed point
    assert lane_aligned_chunk(t, cf) == t
    # tiny chunks round up to one full tile
    assert conv_output_length(lane_aligned_chunk(16_000, cf), cf) == 128


def test_lane_align_row_shard_shape_agreement(corpus):
    """row_shard multi-host contract: every shard derives the same global
    (B, T) from manifest metadata alone — lane_align must preserve that
    (it only looks at max_audio + the pad target, both metadata)."""
    vec = TextVectorizer(letter_vocab())
    common = dict(
        target_tokens_per_batch=33_000, shuffle=False, is_infinite=False,
        pad_to_multiple=16_000, lane_align=True, num_shards=2,
        batch_multiple=1, row_shard=True, seed=7)
    shards = [
        list(iter(AudioTextLetterDataset(
            str(corpus / "train.tsv"), vec, shard_index=i, **common)))
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1]) > 0
    for a, b in zip(*shards):
        assert a["signal"].shape[1] == b["signal"].shape[1]
        assert a["token_ids"].shape[1] == b["token_ids"].shape[1]
        # row blocks are disjoint
        assert not (set(a["files"]) & set(b["files"]))


def test_speed_perturb_wav_length_and_pitch():
    """speed_perturb_wav at factor f: duration x 1/f and the dominant
    frequency of a pure tone scales by f (it IS a speed change, not a
    tempo-only stretch)."""
    from audio8_tpu.data.audio import speed_perturb_wav

    sr, f0 = 16_000, 440.0
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    for factor in (0.9, 1.1):
        out = speed_perturb_wav(tone, factor)
        assert abs(len(out) - sr / factor) <= 2
        spec = np.abs(np.fft.rfft(out))
        peak_hz = np.argmax(spec) * sr / len(out) / 1  # bin -> Hz at sr
        assert abs(peak_hz - f0 * factor) < 5.0
    # factor 1.0 is the identity
    np.testing.assert_array_equal(speed_perturb_wav(tone, 1.0), tone)


def test_dataset_speed_perturb(corpus):
    """AudioTextLetterDataset(speed_perturb=...): every row fits its
    padded slot at the worst-case stretch, lengths are post-perturb,
    transcripts are untouched, and the same seed reproduces the
    stream."""
    vec = TextVectorizer(letter_vocab())

    def build(seed):
        return AudioTextLetterDataset(
            str(corpus / "train.tsv"), vec, 64_000,
            shuffle=False, is_infinite=False, pad_to_multiple=4000,
            read_workers=1, seed=seed, speed_perturb=(0.5, 1.0, 2.0))

    base = AudioTextLetterDataset(
        str(corpus / "train.tsv"), vec, 64_000,
        shuffle=False, is_infinite=False, pad_to_multiple=4000,
        read_workers=1)
    perturbed = build(7)
    # worst-case stretch = 1/0.5 = 2x scales the pad targets
    got_lengths, got_tokens = [], []
    for b in perturbed:
        assert b["signal"].shape[1] % 4000 == 0
        for i in range(len(b["files"])):
            n = int(b["signal_lengths"][i])
            got_lengths.append(n)
            # the slot fits the draw: no silent crop of a 2x-slowed row
            assert n <= b["signal"].shape[1]
            # content beyond the recorded length is padding
            assert not np.any(b["signal"][i, n:])
            got_tokens.append(b["token_ids"][i].tolist())
    base_lengths = [int(b["signal_lengths"][i]) for b in base
                    for i in range(len(b["files"]))]
    base_tokens = [b["token_ids"][i].tolist() for b in base
                   for i in range(len(b["files"]))]
    # transcripts identical; at least one row actually changed speed
    assert len(got_tokens) == len(base_tokens)
    assert got_tokens == base_tokens
    assert got_lengths != base_lengths
    # ratios are one of the requested factors (inverse on duration)
    for n, n0 in zip(got_lengths, base_lengths):
        assert min(abs(n - n0 * r) for r in (2.0, 1.0, 0.5)) <= 2
    # determinism under the same seed
    again = [int(b["signal_lengths"][i]) for b in build(7)
             for i in range(len(b["files"]))]
    assert again == got_lengths


def test_noise_mixer_snr(tmp_path):
    """NoiseMixer hits the requested SNR: mixing at X dB makes the
    added-noise power 10^(-X/10) of the signal power."""
    from audio8_tpu.data.audio import NoiseMixer

    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    write_wav(str(noise_dir / "n0.wav"), 4000, seed=50)
    mixer = NoiseMixer(str(noise_dir), snr_db=(10.0, 10.0))
    rng = np.random.default_rng(0)
    sig = np.sin(2 * np.pi * 300 * np.arange(16_000) / 16_000).astype(np.float32)
    out = mixer(sig, rng)
    assert out.shape == sig.shape and out.dtype == np.float32
    added = out - sig
    snr = 10 * np.log10(np.mean(sig**2) / np.mean(added**2))
    assert abs(snr - 10.0) < 0.5
    # prob=0 is the identity
    none = NoiseMixer(str(noise_dir), snr_db=(10.0, 10.0), prob=0.0)
    np.testing.assert_array_equal(none(sig, rng), sig)


def test_noise_mixer_manifest_source(tmp_path):
    """NoiseMixer accepts the manifest-TSV source format too, and loops
    short noise clips over long utterances."""
    from audio8_tpu.data.audio import NoiseMixer

    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    write_wav(str(noise_dir / "n0.wav"), 1000, seed=51)
    tsv = tmp_path / "noise.tsv"
    tsv.write_text(f"{noise_dir}\nn0.wav\t1000\n")
    mixer = NoiseMixer(str(tsv), snr_db=(0.0, 0.0))
    sig = np.ones(5000, np.float32)
    out = mixer(sig, np.random.default_rng(1))
    assert out.shape == sig.shape
    assert np.any(out != sig)


def test_dataset_noise_mixer(corpus, tmp_path):
    """Dataset integration: lengths/transcripts unchanged, signals
    perturbed, deterministic under a fixed seed."""
    from audio8_tpu.data.audio import NoiseMixer

    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    write_wav(str(noise_dir / "n0.wav"), 3000, seed=52)
    vec = TextVectorizer(letter_vocab())

    def build(mixer, seed=3):
        return AudioTextLetterDataset(
            str(corpus / "train.tsv"), vec, 64_000,
            shuffle=False, is_infinite=False, pad_to_multiple=4000,
            read_workers=2, seed=seed, noise_mixer=mixer)

    base = [b for b in build(None)]
    mixer = NoiseMixer(str(noise_dir), snr_db=(5.0, 5.0))
    noisy = [b for b in build(mixer)]
    again = [b for b in build(mixer)]
    for b0, b1, b2 in zip(base, noisy, again):
        np.testing.assert_array_equal(b0["signal_lengths"], b1["signal_lengths"])
        np.testing.assert_array_equal(b0["token_ids"], b1["token_ids"])
        assert np.any(b0["signal"] != b1["signal"])
        np.testing.assert_array_equal(b1["signal"], b2["signal"])
        # padding stays silent
        for i in range(b1["signal"].shape[0]):
            n = int(b1["signal_lengths"][i])
            assert not np.any(b1["signal"][i, n:])
