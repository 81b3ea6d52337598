#!/usr/bin/env bash
# Quickstart: the full framework loop on a synthetic 30-clip corpus —
# manifest -> CTC fine-tune -> eval -> export -> certify -> transcribe.
# Runs in a few minutes on CPU (JAX_PLATFORMS='' python -c ... to force)
# or a single TPU chip; every step is the real CLI, no test fixtures.
#
#   bash examples/quickstart.sh /tmp/a8t-quickstart
set -euo pipefail

# installed wheels expose a8t-* console scripts; from a source tree
# the module paths below are identical ($A8T_TRAIN == python -m
# audio8_tpu.cli.train, $A8T_INSPECT == ...cli.inspect_checkpoint)
A8T_MANIFEST="python -m audio8_tpu.cli.manifest"
A8T_TRAIN="python -m audio8_tpu.cli.train"
A8T_TEST="python -m audio8_tpu.cli.test"
A8T_EXPORT="python -m audio8_tpu.cli.export"
A8T_INSPECT="python -m audio8_tpu.cli.inspect_checkpoint"
A8T_TRANSCRIBE="python -m audio8_tpu.cli.transcribe"

ROOT=${1:-/tmp/a8t-quickstart}
mkdir -p "$ROOT/corpus/audio"

# 1. synthetic corpus: 30 random clips + LibriSpeech-style transcripts
python - "$ROOT" <<'EOF'
import os, sys
import numpy as np
from scipy.io import wavfile

root = sys.argv[1]
audio = os.path.join(root, "corpus", "audio")
rng = np.random.default_rng(0)
words = ["HELLO", "WORLD", "SPEECH", "MODEL", "AUDIO", "TEST"]
with open(os.path.join(audio, "quickstart.trans.txt"), "w") as tf:
    for i in range(30):
        n = int(rng.integers(12_000, 32_000))
        wavfile.write(os.path.join(audio, f"clip{i:02d}.wav"), 16_000,
                      (rng.normal(size=n) * 6000).astype(np.int16))
        text = " ".join(rng.choice(words, size=rng.integers(1, 4)))
        tf.write(f"clip{i:02d} {text}\n")
print("wrote 30 clips")
EOF

# 2. manifests + letter labels + dictionary (reference-compatible formats)
$A8T_MANIFEST --root "$ROOT/corpus" --output "$ROOT/data" \
  --labels librispeech --write_dict --valid_fraction 0.2

# 3. a tiny CTC fine-tune (random init; --restart_from takes a real
#    wav2vec2 checkpoint — fairseq .pt, HF dir, or a8t)
$A8T_TRAIN --root_dir "$ROOT/data" \
  --train_dataset train.tsv --valid_dataset valid.tsv \
  --d_model 64 --num_layers 2 --num_heads 4 --d_ff 128 \
  --train_steps 40 --warmup_steps 4 --steps_per_checkpoint 20 \
  --target_tokens_per_batch 64000 --pad_to_multiple 8000 \
  --unfreeze_enc_after_step 0 --speed_perturb 0.9 1.0 1.1 \
  --basedir "$ROOT/run"

# 4. eval the checkpoint (greedy WER/CER)
$A8T_TEST --root_dir "$ROOT/data" --valid_dataset valid.tsv \
  --basedir "$ROOT/run" --d_model 64 --num_layers 2 --num_heads 4 \
  --d_ff 128 --target_tokens_per_batch 64000

# 5. export a serialized StableHLO artifact, certify it, transcribe with it
$A8T_EXPORT --checkpoint "$ROOT/run/checkpoint-step-40" \
  --dict_file "$ROOT/data/dict.ltr.txt" \
  --output "$ROOT/model.a8x" --seconds 3 \
  --d_model 64 --num_layers 2 --num_heads 4 --d_ff 128
$A8T_TEST --root_dir "$ROOT/data" --valid_dataset valid.tsv \
  --exported "$ROOT/model.a8x" --target_tokens_per_batch 64000
$A8T_INSPECT "$ROOT/run/checkpoint-step-40"
$A8T_TRANSCRIBE --exported "$ROOT/model.a8x" "$ROOT"/corpus/audio/clip00.wav

echo "quickstart complete: run dir $ROOT/run, artifact $ROOT/model.a8x"
echo "serve it:  a8t-serve --exported $ROOT/model.a8x --port 8000"
