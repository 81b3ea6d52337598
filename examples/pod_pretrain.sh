#!/bin/sh
# Multi-host wav2vec2-base pretraining on a TPU pod slice.
#
# Run this script once per host (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all --command=...`). On Cloud TPU, jax.distributed.initialize()
# auto-discovers the coordinator and process count from the TPU metadata,
# so the JAX_* variables below are only needed off-cloud (see
# tests/test_multihost.py for the explicit-bootstrap form).
#
# What the flags give you (docs/USAGE.md "parallelism" notes):
#   --distributed true   multi-host: every process feeds its row block of
#                        globally-identical batches; XLA inserts the
#                        gradient psums over ICI (the DDP equivalent)
#   --zero1 true         AdamW moments shard over the data axis (ZeRO-1)
#   --tensor_parallel N  optional Megatron-style TP over attention/FFN
#
# Per-chip batch stays the reference recipe (~1.4M samples); the global
# batch scales with the number of chips.

MANIFEST_DIR=${MANIFEST_DIR:-/data/librispeech}
BASEDIR=${BASEDIR:-/checkpoints/w2v2-base}

exec python -m audio8_tpu.cli.pretrain \
    --manifest_dir "$MANIFEST_DIR" \
    --train_manifest_file train.tsv \
    --valid_manifest_file valid.tsv \
    --basedir "$BASEDIR" \
    --bf16 \
    --distributed true \
    --zero1 true \
    --train_steps 400000 \
    --warmup_steps 32000 \
    --lr 5e-4 \
    "$@"
