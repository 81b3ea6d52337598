"""Host input-pipeline saturation check (VERDICT r2 item 7).

The pretrain bench consumes 8 x 163,920 samples (81.96 audio-sec) every
~53 ms on the device — the host loader must decode+assemble batches
faster than that or the step rate is a fiction of pre-staged arrays.
This measures the real loader path (AudioFileDataset over WAV files on
disk -> PrefetchLoader) at bench geometry, for several worker counts.

  python -u tools/exp_loader_rate.py [n_utterances]

Prints one JSON line per worker count: batches/sec, audio-sec/sec, and
the margin over the device's consumption rate.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.io import wavfile

DEVICE_AUDIO_SEC_PER_SEC = 82.0 / 0.053  # bench pretrain step consumption


def make_corpus(outdir: str, n: int, seconds: float = 12.0):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        path = os.path.join(outdir, f"u{i}.wav")
        samples = int(16000 * seconds * rng.uniform(0.7, 1.3))
        wavfile.write(path, 16000,
                      (rng.normal(size=samples) * 5000).astype(np.int16))
        paths.append(path)
    with open(os.path.join(outdir, "train.tsv"), "w") as f:
        f.write(outdir + "\n")
        for p in paths:
            f.write(f"{os.path.basename(p)}\t16000\n")
    return os.path.join(outdir, "train.tsv")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    from audio8_tpu.data.datasets import AudioFileDataset, PrefetchLoader

    with tempfile.TemporaryDirectory() as d:
        tsv = make_corpus(d, n)
        for workers in (1, 2, 4, 8):
            ds = AudioFileDataset(tsv, max_length=163_920,
                                  target_tokens_per_batch=163_920 * 8)
            loader = PrefetchLoader(ds, num_workers=workers, prefetch=4)
            if loader.num_workers != workers:
                # the loader clamps to cpu_count; measuring an unclamped
                # pool would report rates real training can't reach
                print(json.dumps({"num_workers": workers,
                                  "clamped_to": loader.num_workers,
                                  "skipped": "exceeds cpu_count"}),
                      flush=True)
                continue
            it = iter(loader)
            for _ in range(3):  # warm the pool + page cache
                next(it)
            n_batches, audio_sec = 20, 0.0
            t0 = time.perf_counter()
            for _ in range(n_batches):
                sig = next(it)
                audio_sec += float(np.prod(np.shape(sig))) / 16000.0
            dt = time.perf_counter() - t0
            rate = audio_sec / dt
            print(json.dumps({
                "num_workers": workers,
                "cpu_count": os.cpu_count(),
                "batches_per_sec": round(n_batches / dt, 2),
                "audio_sec_per_sec": round(rate, 1),
                "device_rate": round(DEVICE_AUDIO_SEC_PER_SEC, 1),
                "headroom_x": round(rate / DEVICE_AUDIO_SEC_PER_SEC, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
