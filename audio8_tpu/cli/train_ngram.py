"""`a8t-train-ngram`: estimate an n-gram LM from transcripts -> ARPA.

Completes the decode-LM pipeline without external tools: the reference's
recipe needs kenlm's ``lmplz`` to build the LM that PrefixBeamSearch
fuses (/root/reference/audio8/ctc.py:22-30 via ctcdecode). This CLI
estimates the same model class (interpolated modified Kneser-Ney,
ops/ngram.py) and writes standard ARPA that ops/lm.ArpaLM, the C++
reader (csrc/arpa_lm.cc) and kenlm itself all consume:

  a8t-train-ngram --input train.wrd --output lm.arpa --order 3
  a8t-test ... --beam 8 --lm lm.arpa --alpha 0.7
"""
from __future__ import annotations

import logging
from argparse import ArgumentParser

from audio8_tpu.ops.ngram import read_sentences, train_kneser_ney

logger = logging.getLogger("audio8_tpu.train_ngram")


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--input", nargs="+", required=True,
                   help="transcript file(s): whitespace-separated words, "
                        "one utterance per line (.wrd format)")
    p.add_argument("--output", required=True, help="ARPA file to write")
    p.add_argument("--order", type=int, default=3)
    p.add_argument("--lowercase", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(levelname)s %(name)s: %(message)s")
    args = parse_args(argv)
    if args.order < 1:
        raise ValueError(f"--order must be >= 1, got {args.order}")
    lm = train_kneser_ney(
        read_sentences(args.input, lowercase=args.lowercase), args.order)
    lm.write_arpa(args.output)
    sizes = {}
    for g in lm.prob:
        sizes[len(g)] = sizes.get(len(g), 0) + 1
    logger.info("wrote %s: %s", args.output,
                ", ".join(f"{sizes[k]} {k}-grams" for k in sorted(sizes)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
