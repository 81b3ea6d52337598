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


def measure_serial_parts(tsv):
    """The thread pool parallelizes ALL of materialize() (decode + pad +
    stack run inside workers, datasets.py PrefetchLoader._parallel_iter);
    the only serial components are batch_plans() on the consumer thread
    and the result hand-off. Measure them alone (Amdahl ceiling for ANY
    worker count — a single number that is valid beyond this 1-core box),
    plus a zero-cost-decode materialize (assembly-only single-thread
    rate: what one worker contributes when decode is free)."""
    from audio8_tpu.data.datasets import AudioFileDataset

    # 1) plans-only: the serial metadata path (AudioFileDataset plans
    #    are (rows, crop_len) tuples; the stream is INFINITE — epoch
    #    loop — so take a fixed count)
    n_plans = 60
    ds = AudioFileDataset(tsv, max_length=163_920,
                          target_tokens_per_batch=163_920 * 8)
    plans, audio_sec = [], 0.0
    t0 = time.perf_counter()
    for rows, t in ds.batch_plans():
        plans.append((rows, t))
        audio_sec += len(rows) * t / 16000.0
        if len(plans) >= n_plans:
            break
    dt_plans = time.perf_counter() - t0
    print(json.dumps({
        "mode": "plans_only_serial",
        "plans_per_sec": round(len(plans) / dt_plans, 1),
        "audio_sec_per_sec": round(audio_sec / dt_plans, 1),
        "note": "Amdahl ceiling: the only non-worker-parallel component",
    }), flush=True)

    # 2) zero-decode materialize: patch the reader to return a cached
    #    waveform so the measured cost is padding/stacking/token assembly
    cached = np.zeros(163_920, np.float32)

    class _ZeroReader:
        def read(self, path, max_len=-1):
            return cached

    ds.reader = _ZeroReader()
    for repeat in range(2):  # second pass is the warm measurement
        t0 = time.perf_counter()
        audio_sec = 0.0
        for plan in plans:
            out = ds.materialize(plan)
            audio_sec += float(np.prod(out.shape)) / 16000.0
        dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": "zero_decode_assembly_1thread",
        "batches_per_sec": round(len(plans) / dt, 2),
        "audio_sec_per_sec": round(audio_sec / dt, 1),
        "note": "per-worker assembly rate when decode cost is zero",
    }), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    from audio8_tpu.data.datasets import AudioFileDataset, PrefetchLoader

    with tempfile.TemporaryDirectory() as d:
        tsv = make_corpus(d, n)
        measure_serial_parts(tsv)
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
            it.close()  # stop the producer before the tempdir vanishes
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
