"""learn_bpe: subword-nmt-semantics merge learning + the a8t-learn-bpe
CLI, closed-loop with SubwordBPE/BPEVectorizer application."""
from collections import Counter

from audio8_tpu.models.text import SubwordBPE, learn_bpe, write_bpe_codes


def test_learn_bpe_classic_example():
    """Sennrich et al.'s worked corpus (low:5 lower:2 newest:6
    widest:3) under subword-nmt's exact tie-break (max by
    (count, pair), i.e. lexicographically LARGEST on ties): the three
    9-count pairs ('e','s')/('s','t')/('t','</w>') resolve to
    ('t','</w>') first, then ('s','t</w>'), then ('e','st</w>')."""
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe(counts, 3)
    assert merges == [("t", "</w>"), ("s", "t</w>"), ("e", "st</w>")]


def test_learn_bpe_frequency_cutoff():
    # every pair occurs once -> min_frequency=2 learns nothing
    assert learn_bpe({"abc": 1, "xyz": 1}, 10, min_frequency=2) == []
    # and with the cutoff at 1 it merges everything it can
    merges = learn_bpe({"abc": 1}, 10, min_frequency=1)
    assert len(merges) == 3  # a+b, ab+c, abc+</w>


def test_learned_codes_apply_and_reconstruct(tmp_path):
    """Codes learned from a corpus segment every corpus word into
    pieces that reconstruct the word, and frequent words collapse to
    a single piece."""
    words = {"hello": 50, "world": 40, "help": 9, "worlds": 3, "old": 2}
    merges = learn_bpe(words, 200, min_frequency=2)
    codes = tmp_path / "codes.bpe"
    write_bpe_codes(str(codes), merges)
    bpe = SubwordBPE(str(codes))
    for w in words:
        pieces = bpe.segment_word(w)
        assert "".join(p[:-2] if p.endswith("@@") else p
                       for p in pieces) == w
    assert bpe.segment_word("hello") == ["hello"]
    assert bpe.segment_word("world") == ["world"]


def test_incremental_stats_match_naive():
    """The incremental pair-count maintenance equals a from-scratch
    recount at every step (differential test of the bookkeeping)."""
    import random

    rng = random.Random(0)
    words = {"".join(rng.choice("abcd") for _ in range(rng.randint(1, 6))):
             rng.randint(1, 9) for _ in range(60)}

    def naive(word_counts, num_merges, min_frequency=2):
        seqs = {w: list(w) + ["</w>"] for w in word_counts}
        merges = []
        for _ in range(num_merges):
            stats = Counter()
            for w, syms in seqs.items():
                for pair in zip(syms, syms[1:]):
                    stats[pair] += word_counts[w]
            if not stats:
                break
            best = max(stats, key=lambda p: (stats[p], p))
            if stats[best] < min_frequency:
                break
            merges.append(best)
            for w, syms in seqs.items():
                out, i = [], 0
                while i < len(syms):
                    if (i < len(syms) - 1
                            and (syms[i], syms[i + 1]) == best):
                        out.append(best[0] + best[1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                seqs[w] = out
        return merges

    assert learn_bpe(dict(words), 40) == naive(dict(words), 40)


def test_cli_end_to_end(tmp_path):
    """a8t-learn-bpe -> codes + vocab; a8t-wrd2bpe consumes the codes;
    BPEVectorizer round-trips with the written vocab."""
    from audio8_tpu.cli.learn_bpe import main as learn_main
    from audio8_tpu.models.text import BPEVectorizer

    wrd = tmp_path / "train.wrd"
    wrd.write_text("the cat sat\nthe cat ran\nthe dog sat\n" * 5)
    codes = tmp_path / "codes.bpe"
    vocab = tmp_path / "vocab.bpe.txt"
    learn_main(["--input", str(wrd), "--output", str(codes),
                "--num_merges", "50", "--write_vocab", str(vocab)])
    assert codes.read_text().startswith("#version: 0.2\n")
    assert vocab.exists() and vocab.read_text().strip()

    vec = BPEVectorizer(str(codes), str(vocab))
    ids = vec.run(["the", "cat", "sat"])
    assert ids.ndim == 1 and len(ids) >= 3
    # frequent whole words in the corpus segment to single known pieces
    assert vec.segment(["the"]) == ["the"]
