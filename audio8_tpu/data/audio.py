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


class SoundfileAudioReader:
    """File -> float32 waveform, optional truncation (data.py:22-33)."""

    def transform(self, audio: np.ndarray) -> np.ndarray:
        return audio.astype(np.float32)

    def read(self, file: str, max_length: int = -1) -> np.ndarray:
        if file.lower().endswith(".flac"):
            wav, _ = _read_flac(file)
        else:
            wav, _ = read_wav(file)
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
                if f.lower().endswith((".wav", ".flac")))
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
