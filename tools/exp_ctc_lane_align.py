"""Does lane-aligning the supervised pad grid help the CTC step?

Supervised batches PAD to a length grid (no cropping — the audio is
transcribed), so the lever is different from pretraining: pad targets
must never push T' across a 128-lane MXU tile boundary that the data
itself didn't require. The default pad_to_multiple=16000 grid does this
all the time: max_audio=41,000 (T'=127, one tile) rounds up to 48,000
(T'=149 -> 256-wide score/AV tiles, ~2x the quadratic FLOPs).

This times bench.py's full CTC fine-tune step at tile-exact vs
overshooting pad targets. Run on an IDLE host:
python -u tools/exp_ctc_lane_align.py
"""
import sys

sys.path.insert(0, ".")

from bench import SAMPLE_RATE, bench_ctc
from audio8_tpu.config import CONV_FEATURES, conv_output_length


def main():
    rows = []
    for b, t in ((16, 48_000),    # round-1 workload: T'=149 -> 256 tiles
                 (16, 41_359),    # T'=128 exactly: one tile, same row count
                 (16, 82_319),    # T'=256 exactly: two tiles, 2x audio/step
                 (8, 82_319)):    # ~same samples/batch budget as 16x41359
        tput = bench_ctc(False, b=b, t=t)
        tp = conv_output_length(t, CONV_FEATURES[16])
        step_ms = b * t / SAMPLE_RATE / tput * 1e3
        rows.append((b, t, tp, step_ms, tput))
        print(f"b={b:2d} t={t:6d} T'={tp:3d}  step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][4]
    for b, t, tp, step_ms, tput in rows[1:]:
        print(f"b={b} T'={tp}: {tput / base - 1:+.1%} vs b=16 T'=149",
              flush=True)


if __name__ == "__main__":
    main()
