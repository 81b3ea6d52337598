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
    p.add_argument("--dict_file",
                   help="fairseq dict.ltr.txt or HF vocab.json (required "
                        "except for --pooled embedding exports)")
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
    p.add_argument("--pooled", type=str2bool, default=False,
                   help="export a pooled utterance-embedding encoder "
                        "(a8t-embed's surface): entries return (B, D) "
                        "L2-normalized embeddings")
    p.add_argument("--reduction_type", default="mean",
                   choices=["mean", "max", "sha", "sha_max", "sha_mean",
                            "2ha", "2ha_max", "2ha_mean"],
                   help="utterance pooling baked into a --pooled export")
    p.add_argument("--transducer", type=str2bool, default=False,
                   help="export an a8t-train-transducer checkpoint: the "
                        "three streaming-decode callables (encode / "
                        "decode_init / decode_frames) for the resumable "
                        "windowed lattice search (serve.TransducerStreamer)")
    p.add_argument("--pred_layers", type=int, default=2)
    p.add_argument("--pred_dim", type=int, default=512)
    p.add_argument("--pred_embed_dim", type=int, default=256)
    p.add_argument("--d_joint", type=int, default=512)
    p.add_argument("--window_frames", type=int, default=256,
                   help="transducer decode-window frames baked into the "
                        "exported decode_frames entry")
    p.add_argument("--max_decode_len", type=int, default=8_000,
                   help="transducer label budget baked into the artifact")
    p.add_argument("--max_symbols_per_frame", type=int, default=4)
    add_common_model_args(p)
    args = apply_preset(p.parse_args(argv))
    if args.transducer and args.pooled:
        raise SystemExit("--transducer and --pooled are exclusive")
    if (args.transducer or args.pooled) and args.quantize != "none":
        raise SystemExit("--quantize int8 is a CTC-path export option")
    if not args.pooled and not args.dict_file:
        raise SystemExit("--dict_file is required (except with --pooled)")
    return args


def _export_pooled(args):
    """Embedding branch of main(): the pooled utterance encoder
    (a8t-embed's surface) as batch-polymorphic fixed-window entries
    returning (B, D) L2-normalized embeddings."""
    from audio8_tpu.cli.common import resolve_restart, topology_kwargs
    from audio8_tpu.config import PooledConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2PooledEncoder

    cfg = PooledConfig(
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_ff=args.d_ff, dropout=0.0,
        timestep_masking=0.0, channel_masking=0.0, freeze_fx=False,
        reduction_type=args.reduction_type, **topology_kwargs(args))
    model = Wav2Vec2PooledEncoder(
        config=cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16000), jnp.float32),
                      jnp.asarray([16000]))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init,
                                   num_layers=args.num_layers,
                                   **topology_kwargs(args))
    flat, treedef = jax.tree.flatten(params)

    def fn(flat_params, signal, lengths):
        p = jax.tree.unflatten(treedef, flat_params)
        emb = model.apply({"params": p}, signal, lengths, freeze=False)
        emb = emb.astype(jnp.float32)
        return emb * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(emb * emb, -1, keepdims=True), 1e-12))

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
        logger.info("exporting pooled entry t=%d samples (%.2fs) for %s",
                    t, t / sr, args.platforms)
        entries.append({
            "t": t,
            "data": export_forward(fn, flat, t,
                                   platforms=tuple(args.platforms)),
        })
    meta = {
        "kind": "embed",
        "conv_features": [list(f) for f in cfg.conv_features],
        "sample_rate": sr,
        "d_model": cfg.d_model,
        "num_layers": cfg.num_layers,
        "reduction_type": args.reduction_type,
        "bf16": bool(args.bf16),
        "platforms": list(args.platforms),
        "checkpoint": args.checkpoint,
    }
    save_artifact(args.output, flat, meta, entries)
    logger.info("wrote %s: embed artifact, %d entries, %d params",
                args.output, len(entries), len(flat))
    return args.output


def _export_transducer(args):
    """RNN-T branch of main(): serialize the three streaming-decode
    callables at the artifact's fixed shapes (symbolic-batch encoder
    chunk; batch-1 decode window + label budget)."""
    from jax import export as jax_export

    from audio8_tpu.cli.transcribe import load_transducer
    from audio8_tpu.export import (export_callable, param_specs,
                                   save_artifact)
    from audio8_tpu.models.text import read_vocab_list
    from audio8_tpu.models.transducer import Transducer

    if len(args.seconds) != 1:
        raise SystemExit(
            "--transducer exports ONE encoder-chunk window; pass a "
            f"single --seconds value (got {args.seconds})")
    # attrs load_transducer reads but that don't shape the export
    args.beam, args.timestamps = 1, False
    cfg, _, _, model, params = load_transducer(args)
    vocab_list = read_vocab_list(args.dict_file)
    flat, treedef = jax.tree.flatten(params)

    def enc_fn(fp, signal, lengths):
        p = jax.tree.unflatten(treedef, fp)
        enc, frames = model.apply({"params": p}, signal, lengths,
                                  method=Transducer.encode)
        return enc.astype(jnp.float32), frames

    def init_fn(fp):
        p = jax.tree.unflatten(treedef, fp)
        return model.apply({"params": p}, 1, method=Transducer.decode_init)

    def frames_fn(fp, enc, n_frames, tokens, n, pred_out, carry):
        p = jax.tree.unflatten(treedef, fp)
        return model.apply({"params": p}, enc, n_frames, tokens, n,
                           pred_out, carry, args.max_symbols_per_frame,
                           method=Transducer.decode_frames)

    sr = args.target_sample_rate
    t = int(args.seconds[0] * sr)
    if args.lane_align:
        t = lane_aligned_chunk(t, cfg.conv_features)
    plats = tuple(args.platforms)
    pspecs = param_specs(flat)
    (b,) = jax_export.symbolic_shape("b")
    logger.info("exporting transducer entries: chunk t=%d, window=%d, "
                "label budget=%d for %s", t, args.window_frames,
                args.max_decode_len, args.platforms)
    enc_data = export_callable(
        enc_fn, (pspecs, jax.ShapeDtypeStruct((b, t), jnp.float32),
                 jax.ShapeDtypeStruct((b,), jnp.int32)), plats)
    init_data = export_callable(init_fn, (pspecs,), plats)

    enc_shape, _ = jax.eval_shape(
        enc_fn, pspecs, jax.ShapeDtypeStruct((1, t), jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32))
    pred_out_s, carry_s = jax.eval_shape(init_fn, pspecs)
    w, budget = args.window_frames, args.max_decode_len
    frames_data = export_callable(
        frames_fn,
        (pspecs,
         jax.ShapeDtypeStruct((1, w, enc_shape.shape[-1]), jnp.float32),
         jax.ShapeDtypeStruct((1,), jnp.int32),
         jax.ShapeDtypeStruct((1, budget), jnp.int32),
         jax.ShapeDtypeStruct((1,), jnp.int32),
         pred_out_s, carry_s), plats)

    entries = [
        {"role": "encode", "t": t, "name": f"enc_t{t}.shlo",
         "data": enc_data},
        {"role": "decode_init", "name": "dec_init.shlo", "data": init_data},
        {"role": "decode_frames", "name": "dec_frames.shlo",
         "data": frames_data},
    ]
    meta = {
        "kind": "transducer",
        "vocab": vocab_list,
        "conv_features": [list(f) for f in cfg.conv_features],
        "sample_rate": sr,
        "d_model": cfg.d_model,
        "num_layers": cfg.num_layers,
        "window_frames": w,
        "max_output_len": budget,
        "max_symbols_per_frame": args.max_symbols_per_frame,
        "bf16": bool(args.bf16),
        "platforms": list(args.platforms),
        "checkpoint": args.checkpoint,
    }
    save_artifact(args.output, flat, meta, entries)
    logger.info("wrote %s: transducer artifact, %d params", args.output,
                len(flat))
    return args.output


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.pooled:
        return _export_pooled(args)
    if args.transducer:
        return _export_transducer(args)
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
