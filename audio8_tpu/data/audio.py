"""Host audio IO.

The reference reads audio with python-soundfile/libsndfile
(/root/reference/audio8/data.py:22-33) and resamples with
``scipy.signal.resample`` (data.py:36-52). soundfile is not a dependency
here: WAV decode uses scipy's C reader with the same float normalization
convention; FLAC decode goes through the native C++ decoder when built
(audio8_tpu/csrc) and raises a clear error otherwise.
"""
from __future__ import annotations

import numpy as np


def _pcm_to_float(data: np.ndarray) -> np.ndarray:
    """Match soundfile's default float conversion: ints scale to [-1, 1)."""
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    if data.dtype == np.int8:
        return data.astype(np.float32) / 128.0
    return data.astype(np.float32)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono-or-multichannel array, sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    return _pcm_to_float(data), sr


def _read_flac(path: str) -> tuple[np.ndarray, int]:
    try:
        from audio8_tpu.csrc import native  # type: ignore

        data, sr, bps = native.read_flac(path)
        scale = float(1 << (bps - 1)) if bps > 1 else 1.0
        return np.asarray(data, np.float32) / scale, sr
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"FLAC decode for {path!r} needs the native extension; build it "
            "with `python -m audio8_tpu.csrc.build`"
        ) from e


_ULAW_BIAS = 0x84


def _ulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> int16 linear PCM (vectorized)."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(sign, -sample, sample).astype(np.int16)


def read_sphere(path: str) -> tuple[np.ndarray, int]:
    """NIST SPHERE (.sph) reader: ASCII header + PCM/mu-law payload.

    Covers TIMIT/Switchboard/Fisher-style files (the reference reads them
    through libsndfile, /root/reference/audio8/data.py:10,27). Uncompressed
    pcm and ulaw only; `shorten`-compressed payloads raise with a pointer
    to `sph2pipe`.
    """
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"NIST_1A"):
            raise ValueError(f"{path!r}: not a NIST SPHERE file")
        header_size = int(f.readline().strip())
        f.seek(0)
        header = f.read(header_size).decode("ascii", "replace")
        fields = {}
        for line in header.splitlines()[2:]:
            parts = line.split(maxsplit=2)
            if len(parts) == 3 and parts[1].startswith("-"):
                fields[parts[0]] = parts[2]
            if line.strip() == "end_head":
                break
        sr = int(fields.get("sample_rate", 16000))
        n_channels = int(fields.get("channel_count", 1))
        sample_bytes = int(fields.get("sample_n_bytes", 2))
        coding = fields.get("sample_coding", "pcm")
        byte_fmt = fields.get("sample_byte_format", "01")
        if "embedded-shorten" in coding or coding.startswith("shorten"):
            raise ValueError(
                f"{path!r}: shorten-compressed SPHERE is not supported; "
                "convert with `sph2pipe -p` first")
        f.seek(header_size)
        raw = f.read()
    if "ulaw" in coding:
        data = _ulaw_decode(np.frombuffer(raw, np.uint8))
    else:
        widths = {1: np.int8, 2: np.int16, 4: np.int32}
        if sample_bytes not in widths:
            raise ValueError(
                f"{path!r}: unsupported SPHERE sample_n_bytes="
                f"{sample_bytes} (supported: 1, 2, 4)")
        dt = np.dtype(widths[sample_bytes])
        dt = dt.newbyteorder("<" if byte_fmt == "01" else ">")
        data = np.frombuffer(raw[: (len(raw) // dt.itemsize) * dt.itemsize],
                             dt)
    if n_channels > 1:
        data = data.reshape(-1, n_channels)
    return _pcm_to_float(np.ascontiguousarray(data).astype(data.dtype.newbyteorder("="))), sr


def _float80_to_int(b: bytes) -> int:
    """IEEE 754 80-bit extended float -> int (AIFF sample rates are small
    integers, so the truncation is exact)."""
    exponent = ((b[0] & 0x7F) << 8) | b[1]
    mantissa = int.from_bytes(b[2:10], "big")
    if exponent == 0 and mantissa == 0:
        return 0
    val = mantissa * 2.0 ** (exponent - 16383 - 63)
    return int(round(-val if b[0] & 0x80 else val))


def read_aiff(path: str) -> tuple[np.ndarray, int]:
    """AIFF/AIFC reader (IFF container, big-endian PCM; 'sowt' = LE)."""
    import struct

    with open(path, "rb") as f:
        form, _, kind = struct.unpack(">4sI4s", f.read(12))
        if form != b"FORM" or kind not in (b"AIFF", b"AIFC"):
            raise ValueError(f"{path!r}: not an AIFF file")
        comm = ssnd = None
        compression = b"NONE"
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = struct.unpack(">4sI", hdr)
            body = f.read(size + (size & 1))[:size]
            if cid == b"COMM":
                n_channels, _, bits = struct.unpack(">hIh", body[:8])
                sr = _float80_to_int(body[8:18])
                if kind == b"AIFC" and len(body) >= 22:
                    compression = body[18:22]
                comm = (n_channels, bits)
            elif cid == b"SSND":
                offset, _ = struct.unpack(">II", body[:8])
                ssnd = body[8 + offset:]
        if comm is None or ssnd is None:
            raise ValueError(f"{path!r}: missing COMM/SSND chunk")
    if compression not in (b"NONE", b"sowt", b"twos"):
        raise ValueError(
            f"{path!r}: compressed AIFC ({compression!r}) is not supported")
    n_channels, bits = comm
    order = "<" if compression == b"sowt" else ">"
    if bits <= 8:
        data = np.frombuffer(ssnd, np.int8).astype(np.int16) * 256
    elif bits <= 16:
        data = np.frombuffer(ssnd, np.dtype(np.int16).newbyteorder(order))
    elif bits <= 24:
        b3 = np.frombuffer(ssnd[: len(ssnd) // 3 * 3], np.uint8)
        b3 = b3.reshape(-1, 3)
        if order == "<":
            b3 = b3[:, ::-1]
        val = ((b3[:, 0].astype(np.int32) << 24)
               | (b3[:, 1].astype(np.int32) << 16)
               | (b3[:, 2].astype(np.int32) << 8)) >> 8
        data = val  # 24-bit in int32; scale below by 2^23
        if n_channels > 1:
            data = data.reshape(-1, n_channels)
        return (data.astype(np.float32) / float(1 << 23)), sr
    else:
        data = np.frombuffer(ssnd, np.dtype(np.int32).newbyteorder(order))
    if n_channels > 1:
        data = data.reshape(-1, n_channels)
    return _pcm_to_float(np.ascontiguousarray(data).astype(data.dtype.newbyteorder("="))), sr


SUPPORTED_FORMATS = (".wav", ".flac", ".sph", ".aif", ".aiff", ".aifc")


def read_audio(path: str) -> tuple[np.ndarray, int]:
    """Format-dispatched decode -> (float32 array, sample_rate).

    WAV/FLAC/SPHERE/AIFF decode natively (in-package); anything else
    falls through to python-soundfile (libsndfile) when installed, and
    otherwise fails with an actionable error instead of the reference's
    behavior of handing every extension to one decoder
    (/root/reference/audio8/data.py:27).
    """
    low = path.lower()
    if low.endswith(".wav"):
        return read_wav(path)
    if low.endswith(".flac"):
        return _read_flac(path)
    if low.endswith(".sph"):
        return read_sphere(path)
    if low.endswith((".aif", ".aiff", ".aifc")):
        return read_aiff(path)
    try:  # optional libsndfile passthrough (Ogg/Vorbis, CAF, ...)
        import soundfile  # type: ignore
    except ImportError:
        raise ValueError(
            f"unsupported audio format for {path!r}: built-in decoders "
            f"cover {', '.join(SUPPORTED_FORMATS)}; install python-"
            "soundfile (libsndfile) for other formats (e.g. Ogg/Vorbis)"
        ) from None
    data, sr = soundfile.read(path, dtype="float32")
    return data, sr


class SoundfileAudioReader:
    """File -> float32 waveform, optional truncation (data.py:22-33)."""

    def transform(self, audio: np.ndarray) -> np.ndarray:
        return audio.astype(np.float32)

    def read(self, file: str, max_length: int = -1) -> np.ndarray:
        wav, _ = read_audio(file)
        if wav.ndim > 1:
            wav = wav[:, 0]
        wav = self.transform(wav)
        if max_length > 0:
            return wav[:max_length]
        return wav


class AudioResampleReader(SoundfileAudioReader):
    """FFT resample by target/input ratio (data.py:36-52)."""

    def __init__(self, sample_factor: float):
        self.sample_factor = sample_factor

    def transform(self, wav: np.ndarray) -> np.ndarray:
        import scipy.signal

        num = int(len(wav) * self.sample_factor)
        return scipy.signal.resample(wav, num).astype(np.float32)


class NoiseMixer:
    """Additive noise augmentation at a random SNR (MUSAN-style; no
    reference equivalent — audio8 ships no augmentation).

    ``source`` is an audio manifest TSV (same format as the dataset
    manifests: directory header + ``file\\tnum_samples`` rows) or a
    directory of WAV/FLAC files. Each call mixes one randomly chosen
    noise clip (looped/cropped to the utterance length) at an SNR drawn
    uniformly from ``snr_db``, with probability ``prob``. Pure
    host-side, length-preserving — composes with speed perturbation and
    the static-shape batching untouched.
    """

    def __init__(self, source: str, snr_db=(5.0, 20.0), prob: float = 1.0):
        import os

        self.snr_db = (float(snr_db[0]), float(snr_db[1]))
        self.prob = float(prob)
        self._reader = SoundfileAudioReader()
        if os.path.isdir(source):
            self.files = sorted(
                os.path.join(source, f) for f in os.listdir(source)
                if f.lower().endswith(SUPPORTED_FORMATS))
        else:
            with open(source) as f:
                directory = f.readline().strip()
                self.files = [os.path.join(directory, ln.split("\t")[0])
                              for ln in f if ln.strip()]
        if not self.files:
            raise ValueError(f"no noise files found in {source!r}")

    def __call__(self, wav: np.ndarray, rng) -> np.ndarray:
        if self.prob < 1.0 and rng.random() > self.prob:
            return wav
        noise = np.asarray(
            self._reader.read(self.files[int(rng.integers(len(self.files)))]),
            np.float32).squeeze()
        if noise.size == 0:
            return wav
        if len(noise) < len(wav):
            reps = -(-len(wav) // len(noise))
            noise = np.tile(noise, reps)
        if len(noise) > len(wav):
            start = int(rng.integers(len(noise) - len(wav) + 1))
            noise = noise[start:start + len(wav)]
        rms_s = float(np.sqrt(np.mean(np.square(wav)))) or 1e-8
        rms_n = float(np.sqrt(np.mean(np.square(noise))))
        if rms_n < 1e-8:
            return wav
        snr = float(rng.uniform(*self.snr_db))
        scale = rms_s / (rms_n * 10.0 ** (snr / 20.0))
        return (wav + scale * noise).astype(np.float32)


def speed_perturb_wav(wav: np.ndarray, factor: float) -> np.ndarray:
    """Play ``wav`` at ``factor``x speed (duration x 1/factor) by
    polyphase resampling at the rational approximation of the factor —
    the Kaldi/fairseq speed-perturbation primitive (no reference
    equivalent; audio8 ships no augmentation). ``resample_poly`` keeps
    the tiny 9/10- and 11/10-style ratios cheap and alias-free where a
    full FFT resample would not be."""
    from fractions import Fraction

    import scipy.signal

    frac = Fraction(factor).limit_denominator(100)
    if frac.numerator == frac.denominator:
        return np.asarray(wav, np.float32)
    out = scipy.signal.resample_poly(
        np.asarray(wav, np.float32), frac.denominator, frac.numerator)
    return out.astype(np.float32)
