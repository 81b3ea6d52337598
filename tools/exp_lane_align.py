"""Lane-aligned clip lengths: does snapping T' to the MXU tile help?

XLA pads matmul tiles to 128 in both free dims, so the attention
score/AV matmuls at T'=546 compute 640x640 tiles — ~37% padding FLOPs.
Cropping the clip so T' lands exactly on a 128 multiple (512) removes
that waste quadratically while shrinking the linear-cost audio only
~6%. This times bench.py's full fused pretrain step (identical model
math; only the static clip length changes — a data-layer knob the
reference also controls freely via bucket cropping,
/root/reference/audio8/data.py:439-480).

Run on an IDLE host: python -u tools/exp_lane_align.py
"""
import sys

sys.path.insert(0, ".")

from bench import SAMPLE_RATE, bench_pretrain
from audio8_tpu.config import CONV_FEATURES, conv_output_length

B = 8


def main():
    rows = []
    for t in (175_000,    # round-1 bench clip: T'=546 -> 640-tile matmuls
              163_920,    # T'=512 = 4*128: zero tile padding
              204_880):   # T'=640 = 5*128: fill the padding with real audio
        tput = bench_pretrain(b=B, t=t)
        tp = conv_output_length(t, CONV_FEATURES[16])
        step_ms = B * t / SAMPLE_RATE / tput * 1e3
        rows.append((t, tp, step_ms, tput))
        print(f"t={t:7d} T'={tp:4d}  step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][3]
    for t, tp, step_ms, tput in rows[1:]:
        print(f"T'={tp}: {tput / base - 1:+.1%} vs T'={rows[0][1]}",
              flush=True)


if __name__ == "__main__":
    main()
