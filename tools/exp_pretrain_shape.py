"""Pretrain batch geometry sweep: how to split the ~1.3M-sample budget?

The reference's pretrain recipe fixes a samples-per-batch budget
(~1.4M, /root/reference/audio8/pretrain.py:44-53) but is free to choose
how the dense min-cropped batch splits it between rows (B) and clip
length (T). On TPU the split matters: longer clips amortize fixed
dispatch overhead and grow the attention matmuls (better MXU feeding)
but the quadratic term grows with T'^2 while audio-sec only grows with
T'. All variants keep T' exactly on the 128-lane tile boundary.

Run on an IDLE host: python -u tools/exp_pretrain_shape.py
"""
import sys

sys.path.insert(0, ".")

from bench import SAMPLE_RATE, bench_pretrain
from audio8_tpu.config import CONV_FEATURES, conv_output_length


def main():
    rows = []
    for b, t in ((8, 163_920),    # current bench shape: T'=512, 1.31M
                 (16, 82_319),    # T'=256, same budget in twice the rows
                 (4, 328_079),    # T'=1024, same budget in longer clips
                 (32, 41_359)):   # T'=128, the CTC-style short-clip split
        tput = bench_pretrain(b=b, t=t)
        tp = conv_output_length(t, CONV_FEATURES[16])
        step_ms = b * t / SAMPLE_RATE / tput * 1e3
        rows.append((b, t, tp, step_ms, tput))
        print(f"b={b:2d} t={t:7d} T'={tp:4d}  step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][4]
    for b, t, tp, step_ms, tput in rows[1:]:
        print(f"b={b} T'={tp}: {tput / base - 1:+.1%} vs b=8 T'=512",
              flush=True)


if __name__ == "__main__":
    main()
