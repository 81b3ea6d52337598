"""What do the non-wav2vec2 encoder topologies cost per train step?

Times bench.py's full CTC fine-tune step (fwd+bwd+AdamW, bf16, the
lane-aligned 16 x 41,359 shape, T'=128) with the topology variants the
model zoo exposes:

- wav2vec2/HuBERT base (baseline: single weight-normed k=128 pos-conv)
- data2vec-audio (5-deep stacked k=19 positional convs, layer-norm
  extractor)
- WavLM (gated relative position bias: shared 320-bucket table + a
  per-layer gate; adds a (B,H,T,T) bias add to every attention)

Run on an IDLE host: python -u tools/exp_family_cost.py
"""
import sys

sys.path.insert(0, ".")

from bench import SAMPLE_RATE, bench_ctc

B, T = 16, 41_359


def main():
    rows = []
    for name, kw in (
        ("wav2vec2/hubert base", {}),
        ("data2vec-audio", dict(extractor_mode="layer", pos_conv_depth=5,
                                conv_pos_kernel=19)),
        ("wavlm", dict(gated_rel_pos=True)),
        ("conformer-rope", dict(extractor_mode="layer", conv_bias=True,
                                encoder_type="conformer",
                                position_embeddings_type="rotary")),
        ("conformer-rel", dict(extractor_mode="layer", conv_bias=True,
                               encoder_type="conformer",
                               position_embeddings_type="relative")),
    ):
        tput = bench_ctc(False, b=B, t=T, **kw)
        step_ms = B * T / SAMPLE_RATE / tput * 1e3
        rows.append((name, step_ms, tput))
        print(f"{name:20s} step {step_ms:6.1f} ms  "
              f"{tput:7.1f} audio-sec/sec/chip", flush=True)
    base = rows[0][2]
    for name, _, tput in rows[1:]:
        print(f"{name}: {tput / base - 1:+.1%} vs wav2vec2 base", flush=True)


if __name__ == "__main__":
    main()
