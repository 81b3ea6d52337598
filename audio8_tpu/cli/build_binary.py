"""`a8t-build-binary`: compile an ARPA LM to KenLM PROBING binary.

kenlm ``build_binary`` equivalent for the default (probing) search
type — the artifact the reference's decode path consumes through
ctcdecode (/root/reference/audio8/ctc.py:22-30). The output loads via
``audio8_tpu.ops.kenlm_bin.KenLMBinaryLM`` (PrefixBeamSearch routes
there automatically) and follows kenlm's published format-version-5
layout, so kenlm itself should also accept it:

  a8t-train-ngram --input train.wrd --output lm.arpa --order 3
  a8t-build-binary lm.arpa lm.bin
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
    p.add_argument("-p", "--probing_multiplier", type=float, default=1.5,
                   help="hash-table space multiplier (kenlm -p; >1.0, "
                        "larger = fewer probe collisions, bigger file)")
    p.add_argument("--no_vocab_strings", action="store_true",
                   help="omit the trailing id-ordered vocabulary strings")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    args = parse_args(argv)
    if args.probing_multiplier <= 1.0:
        raise ValueError("--probing_multiplier must be > 1.0")
    info = write_kenlm_binary(
        args.arpa, args.output,
        probing_multiplier=args.probing_multiplier,
        write_vocab_strings=not args.no_vocab_strings)
    logger.info("wrote %s: order %d, counts %s, %d words",
                args.output, info["order"], info["counts"], info["bound"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
