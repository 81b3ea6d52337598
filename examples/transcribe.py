"""Minimal transcription example: checkpoint -> text.

Transcription is a first-class CLI (`a8t-transcribe`); this example
delegates to it so there is exactly one implementation. See
`audio8_tpu/cli/transcribe.py` for the full flow (checkpoint
resolution incl. fairseq/HF, jitted batched forward, greedy or
prefix-beam(+LM) decoding) and `audio8_tpu/serve.py` for the
long-audio ChunkedTranscriber API used by `--chunk_seconds`.

Usage:
  python examples/transcribe.py --checkpoint <ckpt-or-.pt-or-hf-dir> \
      --dict_file dict.ltr.txt audio1.wav audio2.flac
"""
from audio8_tpu.cli.transcribe import main

if __name__ == "__main__":
    main()
