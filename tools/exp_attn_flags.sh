#!/bin/bash
# Round-3 XLA flag sweep over the pretrain step (VERDICT r2 item 4).
# ONE TPU process at a time (the axon relay queues otherwise): this
# script is the single serial owner of the chip while it runs.
#
#   nohup bash tools/exp_attn_flags.sh > /tmp/attn_sweep.log 2>&1 &
#
# Each config is a fresh process (XLA flags bind at backend init); the
# JSON lines carry the flags, so the log is self-describing. Timeouts
# are generous (45 min) — killing an in-flight TPU client can wedge the
# relay (docs/PERF.md gotchas).
set -u
cd "$(dirname "$0")/.."

run() { # flags variants...
  local flags="$1"; shift
  echo "=== [$flags] $*" >&2
  XLA_FLAGS="$flags" timeout 2700 python -u tools/exp_attn_round3.py "$@"
}

run ""                                               base packed
run "--xla_tpu_enable_latency_hiding_scheduler=true" base
run "--xla_tpu_scoped_vmem_limit_kib=49152"          base
run "--xla_tpu_scoped_vmem_limit_kib=98304"          base
run "--xla_tpu_enable_latency_hiding_scheduler=true --xla_tpu_scoped_vmem_limit_kib=49152" base
echo "sweep done" >&2
