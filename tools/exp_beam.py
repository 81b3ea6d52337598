"""Measure CTC beam decode throughput: host C++ trie vs on-device scan.

Realistic eval shape (the lane-aligned CTC pipeline's output): B=16,
T'=128 frames, V=32 letters, beams 8/16/32. Host numbers decode the
batch sequentially per row (the ops/beam.py contract); the device path
is one XLA program per batch. Metric: decoded audio-sec per wall second
(each utterance is ~2.57 s at T'=128).

Run: timeout 3500 python -u tools/exp_beam.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B, T, V = 16, 128, 32
AUDIO_SEC = B * T * 320 / 16_000  # stride-320 frames


def log_probs():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, V)).astype(np.float32) * 2.0
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def bench(fn, n=8):
    fn()  # warm/compile
    start = time.perf_counter()
    for _ in range(n):
        fn()
    return AUDIO_SEC * n / (time.perf_counter() - start)


def main():
    from audio8_tpu.ops.beam import PrefixBeamSearch

    vocab = ["<s>", "<pad>", "</s>", "<unk>", "|"] + [
        chr(ord("a") + i) for i in range(V - 5)]
    lp = log_probs()
    lengths = np.full((B,), T, np.int32)
    for beam in (8, 16, 32):
        host = PrefixBeamSearch(vocab, alpha=0.0, beta=1.0, beam=beam)
        dev = PrefixBeamSearch(vocab, alpha=0.0, beta=1.0, beam=beam,
                               device=True)
        backend = "c++" if host._native is not None else "python"
        h = bench(lambda: host.run(lp, lengths))
        d = bench(lambda: dev.run(lp, lengths))
        print(f"beam {beam:3d}: host[{backend}] {h:9.1f}  "
              f"device {d:9.1f}  audio-sec/sec", flush=True)


if __name__ == "__main__":
    main()
