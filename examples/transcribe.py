"""Minimal transcription example: checkpoint -> text.

Usage:
  python examples/transcribe.py --checkpoint <a8t-ckpt-or-fairseq.pt> \
      --dict_file dict.ltr.txt audio1.wav audio2.flac

Demonstrates the inference API surface: model construction, checkpoint
resolution (a8t/Orbax or fairseq .pt), batched jit forward, greedy or
beam decoding.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.common import resolve_restart
from audio8_tpu.config import AcousticConfig
from audio8_tpu.data.audio import SoundfileAudioReader
from audio8_tpu.models.text import read_vocab_list
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.ops.ctc import greedy_collapse
from audio8_tpu.ops.metrics import postproc_letters
from audio8_tpu.utils import Offsets, revlut


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("audio", nargs="+")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dict_file", required=True)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--lm")
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--d_model", type=int, default=768)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--d_ff", type=int, default=3072)
    p.add_argument("--chunk_seconds", type=float, default=0.0,
                   help="transcribe arbitrarily long audio through "
                        "fixed-shape overlapped chunks of this many "
                        "seconds (0 = single-shot, reference-style)")
    p.add_argument("--context_seconds", type=float, default=2.0,
                   help="overlap margin per chunk side")
    args = p.parse_args()

    Offsets.remap_fairseq_ctc()
    vocab_list = read_vocab_list(args.dict_file)
    index2vocab = revlut({v: i for i, v in enumerate(vocab_list)})

    cfg = AcousticConfig(
        num_labels=len(vocab_list), d_model=args.d_model,
        num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
        timestep_masking=0.0, channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg, dtype=jnp.bfloat16)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init, ctc=True,
                                   num_layers=args.num_layers)

    decoder = None
    if args.beam > 1 or args.lm:
        from audio8_tpu.ops.beam import PrefixBeamSearch

        decoder = PrefixBeamSearch(vocab_list, alpha=args.alpha,
                                   beta=args.beta, beam=args.beam,
                                   lm_file=args.lm)

    @jax.jit
    def forward(params, signal, lengths):
        lp, mask = model.apply({"params": params}, signal, lengths)
        return lp, jnp.sum(mask, axis=-1)

    reader = SoundfileAudioReader()
    if args.chunk_seconds > 0:
        from audio8_tpu.serve import ChunkedTranscriber

        ct = ChunkedTranscriber(
            lambda s_, l_: forward(params, s_, l_), cfg.conv_features,
            chunk_samples=int(args.chunk_seconds * 16_000),
            context_samples=int(args.context_seconds * 16_000))
        for path in args.audio:
            wav = reader.read(path)
            print(f"{path}\t{ct.transcribe(np.asarray(wav), index2vocab, decoder)}")
        return
    for path in args.audio:
        wav = reader.read(path)
        t_pad = (len(wav) + 15999) // 16000 * 16000
        signal = np.zeros((1, t_pad), np.float32)
        signal[0, : len(wav)] = wav
        lp, frames = forward(params, jnp.asarray(signal),
                             jnp.asarray([len(wav)]))
        n = int(frames[0])
        if decoder is not None:
            chars = decoder.run(np.asarray(lp, np.float32), [n], n_best=1)[0]
        else:
            ids = greedy_collapse(np.argmax(np.asarray(lp[0, :n]), -1), Offsets.GO)
            chars = [index2vocab[i] for i in ids]
        print(f"{path}\t{postproc_letters(chars)}")


if __name__ == "__main__":
    main()
