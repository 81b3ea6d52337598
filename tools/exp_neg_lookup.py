"""InfoNCE negative-lookup formulation: gather vs one-hot contraction.

The round-3 op-level profile (docs/PERF.md) showed the two largest
non-matmul ops in the pretrain step are the negative-similarity gather
(f32[B*M*N] from the (B,M,M) sims, 3.2 ms) and its scatter-add backward
(2.2 ms): TPU lowers a lane-axis take_along_axis to a serialized
per-element fusion. `_select_negatives(mode="onehot")` computes the same
(bit-exact) values as a dense compare-multiply-reduce the VPU streams at
full width (models/wav2vec2.py).

Measures the full pretrain train step (bench geometry) under both modes
via A8T_NEG_LOOKUP, min-of-3 windows (relay-noise methodology of
tools/exp_attn_round3.py).

  nohup python -u tools/exp_neg_lookup.py > /tmp/neg_lookup.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    for mode in ("gather", "onehot"):
        # the env var is captured ONCE at wav2vec2 import (so mutated
        # environments can't silently change compiled programs); for the
        # in-process A/B, override the captured value directly
        import audio8_tpu.models.wav2vec2 as w2v
        w2v._NEG_LOOKUP_ENV = mode
        print(f"--- {mode}", file=sys.stderr, flush=True)
        from exp_attn_round3 import run
        try:
            result = run("base")
        except Exception as e:
            result = {"error": str(e)[:300]}
        result["neg_lookup"] = mode
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
