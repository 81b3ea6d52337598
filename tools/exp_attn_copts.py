"""Terminal-side XLA TPU flag sweep via per-compile compiler_options.

XLA_FLAGS can't carry xla_tpu_* names through the axon relay (the
client-side parser aborts on them), but JAX's ``compiler_options`` ride
CompileOptionsProto.env_option_overrides to the terminal compiler,
which parses and validates them there (verified: a bogus flag fails the
remote compile with HTTP 500). One process, one compile per option set.

  nohup python -u tools/exp_attn_copts.py > /tmp/copts_sweep.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_attn_round3 import run

SETS = [
    ("control", None),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem49", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("vmem96", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs_vmem49", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                    "xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("no_dot_strength", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("fusion_cost_model",
     {"xla_tpu_use_experimental_fusion_cost_model": "true"}),
]


def main():
    for name, copts in SETS:
        print(f"--- {name}", file=sys.stderr, flush=True)
        try:
            result = run("base", copts=copts)
        except Exception as e:
            result = {"set": name, "error": str(e)[:300]}
        result["set"] = name
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
