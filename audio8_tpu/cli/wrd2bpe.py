"""Re-tokenize .wrd transcript files to .bpe with a subword model.

Equivalent of /root/reference/audio8/wrd2bpe.py: writes dict.bpe.txt and
sibling .bpe files for the train/valid datasets.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

from audio8_tpu.models.text import BPEVectorizer
from audio8_tpu.utils import revlut


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--root_dir")
    parser.add_argument("--train_dataset", type=str)
    parser.add_argument("--valid_dataset", type=str)
    parser.add_argument("--subword_model_file", required=True)
    parser.add_argument("--subword_vocab_file", required=True)
    parser.add_argument("--emit_begin_tok", type=str, nargs="*", default=[])
    parser.add_argument("--emit_end_tok", type=str, nargs="*", default=[])
    parser.add_argument("--lower", action="store_true")
    parser.add_argument("--split", type=str, default=" ")
    args = parser.parse_args(argv)

    vec = BPEVectorizer(args.subword_model_file, args.subword_vocab_file,
                        args.emit_begin_tok, args.emit_end_tok)
    i2w = revlut(vec.vocab)
    num_vocab = max(i2w.keys())
    with open(os.path.join(args.root_dir, "dict.bpe.txt"), "w") as wf:
        for i in range(num_vocab):
            wf.write(i2w.get(i, "<unused>") + "\n")

    files = [os.path.join(args.root_dir, args.train_dataset),
             os.path.join(args.root_dir, args.valid_dataset)]
    input_files = [f.replace(".tsv", ".wrd") for f in files]
    output_files = [f.replace(".wrd", ".bpe") for f in input_files]
    for inf, outf in zip(input_files, output_files):
        print(outf)
        with open(inf) as rf, open(outf, "w") as wf:
            for line in rf:
                line = line.strip()
                if args.lower:
                    line = line.lower()
                tok = line.split(args.split)
                outline = " ".join(i2w[x] for x in vec.run(tok))
                wf.write(outline + "\n")


if __name__ == "__main__":
    main()
