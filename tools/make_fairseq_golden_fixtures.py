"""Generate committed fairseq-layout ``.pt`` golden fixtures.

The HF pins (tools/make_golden_fixtures.py) cover ``load_hf_dir``; the
fairseq converter path — the reference's de-facto correctness mechanism
(/root/reference/audio8/wav2vec2.py:39-186,
convert_wav2vec2_checkpoint.py:59-60) — was previously only tested against
the live torch replica, which dies if torch disappears. These fixtures PIN
it: for both source layouts the reference consumes,

- ``pretrained_tiny.pt``: flat pretraining layout (``encoder.layers.N...``
  + quantizer/project_q/final_proj keys),
- ``ctc_tiny.pt``: finetuned layout (``w2v_encoder.w2v_model...`` +
  ``w2v_encoder.proj``),

a REAL ``torch.save`` zip checkpoint (with fairseq-style ``args``/``cfg``
junk in the blob, so readers must skim past it) is committed together with
a fixed input and the torch replica's forward outputs
(``expected.npz``). tests/test_fairseq_golden.py then certifies the full
``load_fairseq_bin`` path — torch-free via models/pt_reader.py — against
the pinned outputs.

Tiny-but-real geometry: 2-block conv stack, d=64/h=4/l=2, vocab 12
(~0.5 MB per file)."""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "fairseq_golden")

FX = ((32, 10, 5), (32, 3, 2))  # (channels, kernel, stride) per block
D, H, L, V = 64, 4, 2, 12


def build_states():
    from audio8_tpu.models.torch_ref import make_fairseq_state

    rng = np.random.default_rng(41)
    pre = make_fairseq_state(rng, d=D, h=H, l=L, fx=FX)
    # quantizer / projection keys present in pretraining checkpoints
    pre["quantizer.vars"] = rng.normal(
        size=(1, 2 * 8, 16)).astype(np.float32) * 0.1
    pre["quantizer.weight_proj.weight"] = rng.normal(
        size=(16, FX[-1][0])).astype(np.float32) * 0.1
    pre["quantizer.weight_proj.bias"] = np.zeros(16, np.float32)
    pre["project_q.weight"] = rng.normal(size=(32, 32)).astype(np.float32) * 0.1
    pre["project_q.bias"] = np.zeros(32, np.float32)
    pre["final_proj.weight"] = rng.normal(size=(32, D)).astype(np.float32) * 0.1
    pre["final_proj.bias"] = np.zeros(32, np.float32)

    rng2 = np.random.default_rng(42)
    ctc = make_fairseq_state(rng2, d=D, h=H, l=L, fx=FX,
                             prefix="w2v_encoder.w2v_model.")
    ctc["w2v_encoder.proj.weight"] = rng2.normal(
        size=(V, D)).astype(np.float32) * 0.1
    ctc["w2v_encoder.proj.bias"] = rng2.normal(
        size=V).astype(np.float32) * 0.1
    return pre, ctc


def main():
    import torch

    from audio8_tpu.models import torch_ref

    os.makedirs(OUT_DIR, exist_ok=True)
    pre, ctc = build_states()
    x = np.random.default_rng(7).normal(size=(2, 4000)).astype(np.float32)

    for name, state in (("pretrained_tiny", pre), ("ctc_tiny", ctc)):
        blob = {
            "model": {k: torch.from_numpy(v) for k, v in state.items()},
            # fairseq-style config payload the torch-free reader must
            # skim past without executing
            "args": argparse.Namespace(arch="wav2vec2", lr=[5e-4],
                                       data="/nonexistent"),
            "cfg": {"task": {"_name": "audio_pretraining"},
                    "model": {"_name": "wav2vec2"}},
            "extra_state": {"epoch": 3, "iterations_in_epoch": 0},
            "optimizer_history": [],
        }
        torch.save(blob, os.path.join(OUT_DIR, f"{name}.pt"))

    feat, h = torch_ref.forward(pre, x, num_heads=H, fx=list(FX))
    lp = torch_ref.ctc_log_probs(ctc, x, num_heads=H, fx=list(FX))
    np.savez_compressed(
        os.path.join(OUT_DIR, "expected.npz"),
        __input__=x, pretrained_features=feat, pretrained_hidden=h,
        ctc_log_probs=lp)

    manifest = {
        "torch_version": torch.__version__,
        "geometry": {"fx": [list(b) for b in FX], "d_model": D,
                     "num_heads": H, "num_layers": L, "num_labels": V},
        "files": {f: os.path.getsize(os.path.join(OUT_DIR, f))
                  for f in sorted(os.listdir(OUT_DIR))
                  if f != "MANIFEST.json"},
    }
    with open(os.path.join(OUT_DIR, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    for f, sz in manifest["files"].items():
        print(f"{f}: {sz / 1e6:.2f} MB")
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
