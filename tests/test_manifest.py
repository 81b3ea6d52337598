"""a8t-manifest: corpus scanning, header-only sample counts, labels."""
import os

import numpy as np
import pytest
from scipy.io import wavfile

from audio8_tpu.cli.manifest import (
    flac_num_samples,
    main,
    wav_num_samples,
    words_to_ltr,
)
from tests.test_native import encode_flac


def test_wav_num_samples(tmp_path):
    x = (np.random.RandomState(0).randn(1234) * 1000).astype(np.int16)
    p = tmp_path / "a.wav"
    wavfile.write(p, 16000, x)
    assert wav_num_samples(str(p)) == 1234


def test_flac_num_samples(tmp_path):
    x = (np.random.RandomState(0).randn(777) * 1000).astype(np.int16)
    p = tmp_path / "a.flac"
    p.write_bytes(encode_flac(x))
    assert flac_num_samples(str(p)) == 777


def test_words_to_ltr_matches_fairseq_format():
    assert words_to_ltr("HELLO WORLD") == "H E L L O | W O R L D |"


def _mini_librispeech(root, utts):
    """LibriSpeech layout: root/spk/chap/{trans.txt, utt.wav}."""
    chap = root / "19" / "198"
    os.makedirs(chap)
    rng = np.random.RandomState(0)
    with open(chap / "19-198.trans.txt", "w") as f:
        for i, (text, n) in enumerate(utts):
            utt = f"19-198-{i:04d}"
            f.write(f"{utt} {text}\n")
            wavfile.write(chap / f"{utt}.wav", 16000,
                          (rng.randn(n) * 1000).astype(np.int16))


def test_main_end_to_end(tmp_path):
    root = tmp_path / "corpus"
    out = tmp_path / "manifests"
    utts = [("HELLO WORLD", 4000), ("A CAT", 5000), ("GOOD DAY", 6000),
            ("THE END", 7000)]
    _mini_librispeech(root, utts)
    main(["--root", str(root), "--output", str(out),
          "--valid_fraction", "0.25", "--labels", "librispeech",
          "--write_dict"])

    train = (out / "train.tsv").read_text().splitlines()
    valid = (out / "valid.tsv").read_text().splitlines()
    assert train[0] == str(root.resolve())
    assert len(train) - 1 + len(valid) - 1 == 4 and len(valid) - 1 == 1
    # rows are relpath\tsamples with header-parsed counts
    rel, n = train[1].split("\t")
    assert rel.endswith(".wav") and int(n) in {4000, 5000, 6000, 7000}

    # labels align row-for-row with the manifest
    ltr = (out / "train.ltr").read_text().splitlines()
    wrd = (out / "train.wrd").read_text().splitlines()
    assert len(ltr) == len(wrd) == len(train) - 1
    for row, words, letters in zip(train[1:], wrd, ltr):
        utt = os.path.splitext(os.path.basename(row.split("\t")[0]))[0]
        want = dict((f"19-198-{i:04d}", t) for i, (t, _) in enumerate(utts))
        assert words == want[utt]
        assert letters == words_to_ltr(words)

    # dict.ltr.txt is read_vocab_list-compatible and covers all letters
    from audio8_tpu.models.text import read_vocab_list

    vocab = read_vocab_list(str(out / "dict.ltr.txt"))
    seen = set(" ".join(l for l in ltr).split())
    assert seen <= set(vocab)

    # and the supervised dataset consumes the output directly
    from audio8_tpu.data.datasets import AudioTextLetterDataset
    from audio8_tpu.models.text import TextVectorizer

    vec = TextVectorizer({v: i for i, v in enumerate(vocab)})
    ds = AudioTextLetterDataset(str(out / "train.tsv"), vec, 32000, 100000,
                                shuffle=False, is_infinite=False)
    batches = list(ds)
    assert sum(b["token_ids"].shape[0] for b in batches) >= 3


def test_missing_transcript_errors(tmp_path):
    root = tmp_path / "corpus"
    out = tmp_path / "manifests"
    _mini_librispeech(root, [("HELLO", 4000)])
    # an audio file with no transcript entry
    wavfile.write(root / "19" / "198" / "19-198-9999.wav", 16000,
                  np.zeros(4000, np.int16))
    with pytest.raises(SystemExit):
        main(["--root", str(root), "--output", str(out),
              "--labels", "librispeech"])
