"""`a8t-build-binary`: compile an ARPA LM to a KenLM binary model.

kenlm ``build_binary`` equivalent for the probing (default) and trie
search types — the artifacts the reference's decode path consumes
through ctcdecode (/root/reference/audio8/ctc.py:22-30). The output
loads via ``audio8_tpu.ops.kenlm_bin.KenLMBinaryLM`` / the native
C++ reader (PrefixBeamSearch routes there automatically). The layouts
follow kenlm's published format-version-5 source, but this environment
has no kenlm build to differential-test against: treat these files as
audio8_tpu-native artifacts. Round-tripping one through real kenlm is
unverified (the probing layout is byte-replicated and most likely
interoperable; the trie layout involves more writer judgment calls —
verify against a kenlm build before relying on cross-tool reads):

  a8t-train-ngram --input train.wrd --output lm.arpa --order 3
  a8t-build-binary lm.arpa lm.bin
  a8t-build-binary lm.arpa lm.trie --trie --quantize   # build_binary trie -q
  a8t-test ... --beam 8 --lm lm.bin --alpha 0.7
"""
from __future__ import annotations

import logging
from argparse import ArgumentParser

from audio8_tpu.ops.kenlm_bin import write_kenlm_binary

logger = logging.getLogger("audio8_tpu.build_binary")


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("arpa", help="input ARPA file (optionally .gz)")
    p.add_argument("output", help="binary model file to write")
    p.add_argument("-p", "--probing_multiplier", type=float, default=None,
                   help="hash-table space multiplier (kenlm -p; >1.0, "
                        "larger = fewer probe collisions, bigger file; "
                        "probing layout only; default 1.5)")
    p.add_argument("--trie", action="store_true",
                   help="write the sorted bit-packed TRIE layout "
                        "(kenlm `build_binary trie`): smaller file, "
                        "binary-search lookups")
    p.add_argument("-q", "--quantize", action="store_true",
                   help="with --trie: store probs/backoffs as quantized "
                        "table indices (kenlm `build_binary trie -q`)")
    p.add_argument("--prob_bits", type=int, default=None,
                   help="quantization bits for probabilities "
                        "(kenlm -q N; default 8, requires --quantize)")
    p.add_argument("--backoff_bits", type=int, default=None,
                   help="quantization bits for backoffs "
                        "(kenlm -b N; default 8, requires --quantize)")
    p.add_argument("--no_vocab_strings", action="store_true",
                   help="omit the trailing id-ordered vocabulary strings")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    args = parse_args(argv)
    # a flag that would be silently ignored is an error, not a no-op:
    # the user must not believe they produced e.g. a 4-bit model
    if args.quantize and not args.trie:
        raise ValueError("--quantize requires --trie (kenlm quantizes "
                         "the trie layout only)")
    if not args.quantize and (args.prob_bits is not None or
                              args.backoff_bits is not None):
        raise ValueError("--prob_bits/--backoff_bits only apply with "
                         "--quantize (they would be silently ignored)")
    if args.trie and args.probing_multiplier is not None:
        raise ValueError("--probing_multiplier applies to the probing "
                         "layout only (it would be silently ignored "
                         "with --trie)")
    multiplier = 1.5 if args.probing_multiplier is None \
        else args.probing_multiplier
    if multiplier <= 1.0:
        raise ValueError("--probing_multiplier must be > 1.0")
    info = write_kenlm_binary(
        args.arpa, args.output,
        probing_multiplier=multiplier,
        write_vocab_strings=not args.no_vocab_strings,
        search="trie" if args.trie else "probing",
        quantize=args.quantize,
        prob_bits=8 if args.prob_bits is None else args.prob_bits,
        backoff_bits=8 if args.backoff_bits is None
        else args.backoff_bits)
    logger.info("wrote %s: %s, order %d, counts %s, %d words",
                args.output,
                "TRIE -q" if args.quantize else
                ("TRIE" if args.trie else "PROBING"),
                info["order"], info["counts"], info["bound"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
