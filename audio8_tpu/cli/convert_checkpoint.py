"""Offline checkpoint converter -> a8t Orbax checkpoint.

Equivalent of /root/reference/audio8/convert_wav2vec2_checkpoint.py: builds
the matching model, converts the source state dict, RAISES if any source
key is unmapped (convert_wav2vec2_checkpoint.py:59-60), and writes an Orbax
checkpoint. Sources:

- fairseq ``.pt`` (the reference's only source), ``--format fairseq``;
- HuggingFace ``save_pretrained`` directory (Wav2Vec2Model /
  Wav2Vec2ForPreTraining / Wav2Vec2ForCTC), ``--format hf`` — an
  extension beyond the reference (see models/convert_hf.py).

``--format auto`` (default) picks hf for a directory containing
config.json, fairseq otherwise.
"""
from __future__ import annotations

import logging
import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp

from audio8_tpu.cli.common import add_common_model_args, apply_preset
from audio8_tpu.config import AcousticConfig, PretrainConfig
from audio8_tpu.models.convert import load_fairseq_bin, merge_params
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel, Wav2Vec2Model
from audio8_tpu.train.checkpoint import save_checkpoint
from audio8_tpu.utils import str2bool

logger = logging.getLogger("audio8_tpu.convert")


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True,
                        help="fairseq .pt file or HF save_pretrained dir")
    parser.add_argument("--output", required=True, help="output checkpoint base")
    parser.add_argument("--format", choices=["auto", "fairseq", "hf"],
                        default="auto")
    parser.add_argument("--ctc", type=str2bool, default=False,
                        help="fine-tuned CTC checkpoint (vs pretrained)")
    parser.add_argument("--num_labels", type=int, default=32)
    add_common_model_args(parser)
    args = apply_preset(parser.parse_args(argv))
    logging.basicConfig(level=logging.INFO)

    from audio8_tpu.models.convert_hf import is_hf_dir, load_hf_dir

    fmt = args.format
    if fmt == "auto":
        fmt = "hf" if is_hf_dir(args.input) else "fairseq"
    sr = args.target_sample_rate // 1000
    if fmt == "hf":
        params, report = load_hf_dir(args.input, ctc=args.ctc)
        # size/topology facts live in the HF config; trust it over flags
        hf_cfg = report["hf_config"]
        args.num_layers = hf_cfg["num_hidden_layers"]
        args.d_model = hf_cfg["hidden_size"]
        args.num_heads = hf_cfg["num_attention_heads"]
        args.d_ff = hf_cfg["intermediate_size"]
        args.pre_norm = hf_cfg.get("do_stable_layer_norm", False)
        args.extractor_mode = hf_cfg.get("feat_extract_norm", "group")
        args.conv_bias = hf_cfg.get("conv_bias", False)
        if args.ctc:
            args.num_labels = hf_cfg["vocab_size"]
    else:
        params, report = load_fairseq_bin(
            args.input, ctc=args.ctc, num_layers=args.num_layers, sr=sr,
            pre_norm=args.pre_norm, extractor_mode=args.extractor_mode,
            conv_bias=args.conv_bias)
    if report["missing"] or report["unexpected"]:
        raise ValueError(f"Unmapped checkpoint keys: {report}")

    if args.ctc:
        model = Wav2Vec2AcousticModel(config=AcousticConfig(
            num_labels=args.num_labels, sample_rate=sr, d_model=args.d_model,
            num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
            pre_norm=args.pre_norm, extractor_mode=args.extractor_mode,
            conv_bias=args.conv_bias))
        init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))["params"]
    else:
        model = Wav2Vec2Model(config=PretrainConfig(
            sample_rate=sr, d_model=args.d_model, num_heads=args.num_heads,
            num_layers=args.num_layers, d_ff=args.d_ff,
            pre_norm=args.pre_norm, extractor_mode=args.extractor_mode,
            conv_bias=args.conv_bias))
        rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1),
                "gumbel": jax.random.PRNGKey(2)}
        init = model.init(rngs, jnp.zeros((1, 16000)), train=False)["params"]
    merged = merge_params(init, params)
    path = save_checkpoint({"params": merged}, args.output, 0)
    logger.info("Wrote %s", path)


if __name__ == "__main__":
    main()
