"""`a8t-export`: checkpoint -> serialized StableHLO inference artifact.

No reference equivalent (audio8 ships no export path; its PyTorch
ecosystem would reach for torch.jit/ONNX): lowers the jitted CTC
acoustic forward through ``jax.export`` into a versioned artifact
directory (see audio8_tpu/export.py for the layout) that
``a8t-transcribe --exported`` / ``a8t-serve --exported`` run WITHOUT
the model code, checkpoint-restore stack, or build flags.

Each exported entry is batch-polymorphic (symbolic B) at a fixed
sample count; long audio is served by windowing on an entry
(ChunkedTranscriber). Entries default to one lane-aligned window per
``--seconds`` value.

  a8t-export --checkpoint ckpt --dict_file dict.ltr.txt \\
      --output model.a8x --seconds 30
  a8t-serve --exported model.a8x --port 8000
"""
from __future__ import annotations

import logging
from argparse import ArgumentParser

import jax
import jax.numpy as jnp

from audio8_tpu.cli.common import add_common_model_args, apply_preset
from audio8_tpu.config import lane_aligned_chunk
from audio8_tpu.export import export_forward, save_artifact
from audio8_tpu.utils import str2bool

logger = logging.getLogger("audio8_tpu.export")


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="a8t checkpoint, fairseq .pt, or HF dir")
    p.add_argument("--dict_file", required=True,
                   help="fairseq dict.ltr.txt or HF vocab.json")
    p.add_argument("--output", required=True, help="artifact directory")
    p.add_argument("--seconds", type=float, nargs="+", default=[30.0],
                   help="exported window length(s); one entry per value")
    p.add_argument("--lane_align", type=str2bool, default=True,
                   help="snap each window UP to the 128-lane MXU tile "
                        "boundary (config.lane_aligned_chunk)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"],
                   help="XLA platforms to lower for")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: post-training weight quantization before "
                        "export (ops/quant.py int8 MXU path)")
    add_common_model_args(p)
    return apply_preset(p.parse_args(argv))


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from audio8_tpu.cli.transcribe import build_acoustic

    cfg, model, params, vocab_list, _ = build_acoustic(args)

    flat, treedef = jax.tree.flatten(params)

    def fn(flat_params, signal, lengths):
        p = jax.tree.unflatten(treedef, flat_params)
        lp, mask = model.apply({"params": p}, signal, lengths)
        return lp, jnp.sum(mask, axis=-1)

    sr = args.target_sample_rate
    sizes = []
    for s in args.seconds:
        t = int(s * sr)
        if args.lane_align:
            t = lane_aligned_chunk(t, cfg.conv_features)
        if t not in sizes:
            sizes.append(t)

    entries = []
    for t in sorted(sizes):
        logger.info("exporting entry t=%d samples (%.2fs) for %s",
                    t, t / sr, args.platforms)
        entries.append({
            "t": t,
            "data": export_forward(fn, flat, t,
                                   platforms=tuple(args.platforms)),
        })

    meta = {
        "kind": "ctc",
        "vocab": vocab_list,
        "conv_features": [list(f) for f in cfg.conv_features],
        "sample_rate": sr,
        "d_model": cfg.d_model,
        "num_layers": cfg.num_layers,
        "quantize": args.quantize,
        "bf16": bool(args.bf16),
        "platforms": list(args.platforms),
        "checkpoint": args.checkpoint,
    }
    save_artifact(args.output, flat, meta, entries)
    logger.info("wrote %s: %d entr%s, %d params", args.output,
                len(entries), "y" if len(entries) == 1 else "ies",
                len(flat))
    return args.output


if __name__ == "__main__":
    main()
