"""Native library tests: editdistance, prefix beam search, FLAC decode.

FLAC fixtures are produced by a minimal in-test encoder (bit-exact spec
subset: VERBATIM/CONSTANT/FIXED subframes with rice residuals), since no
system FLAC encoder exists in this environment."""
import numpy as np
import pytest

native = pytest.importorskip("audio8_tpu.csrc.native")


# --------------------------------------------------------------- editdistance

def test_native_edit_distance_matches_python():
    from audio8_tpu.ops.metrics import edit_distance as fast

    def slow(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1] if b else len(a)

    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.integers(0, 5, size=rng.integers(0, 20)).tolist()
        b = rng.integers(0, 5, size=rng.integers(0, 20)).tolist()
        assert native.edit_distance(a, b) == slow(a, b)
    assert native.edit_distance("kitten", "sitting") == 3
    assert native.edit_distance(["HELLO", "WORLD"], ["HELLO", "THERE"]) == 1


# ----------------------------------------------------------------- beam search

def test_native_beam_matches_python_beam():
    from audio8_tpu.ops.beam import _prefix_beam_search_py

    rng = np.random.default_rng(1)
    for trial in range(5):
        t, v = 12, 6
        logits = rng.normal(size=(t, v)) * 2
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        lp = lp.astype(np.float32)
        got = native.prefix_beam_search(lp, blank=0, beam=8, space_idx=-1,
                                        alpha=0.0, beta=0.0, n_best=1)
        want = _prefix_beam_search_py(lp, 0, 8, None, 0.0, 0.0, None)
        assert got[0] == want[0], (trial, got[0], want[0])


def test_native_beam_peaked_equals_greedy():
    from audio8_tpu.ops.ctc import greedy_collapse

    rng = np.random.default_rng(2)
    t, v = 30, 8
    frames = rng.integers(0, v, size=t)
    lp = np.full((t, v), -20.0, np.float32)
    lp[np.arange(t), frames] = -1e-3
    best = native.prefix_beam_search(lp, blank=0, beam=4, space_idx=-1,
                                    alpha=0.0, beta=0.0, n_best=1)[0]
    assert best == greedy_collapse(frames.tolist(), 0)


def test_beam_wrapper_uses_native():
    from audio8_tpu.ops.beam import PrefixBeamSearch
    from audio8_tpu.utils import Offsets

    vocab = list(Offsets.VALUES) + ["A", "B", "|"]
    pbs = PrefixBeamSearch(vocab, beam=4)
    assert pbs._native is not None
    rng = np.random.default_rng(3)
    lp = np.log(np.random.default_rng(0).dirichlet(np.ones(len(vocab)), size=(2, 10)).astype(np.float32))
    out = pbs.run(lp, n_best=1)
    assert len(out) == 2
    assert all(isinstance(x, str) for row in out for x in row)


# ----------------------------------------------------------------------- FLAC


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((int(value) >> i) & 1)

    def write_signed(self, value, n):
        self.write(int(value) & ((1 << n) - 1), n)

    def write_unary(self, q):
        self.bits.extend([0] * q + [1])

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_flac(channels_data, sample_rate=16000, bps=16, block=256,
                subframe="verbatim"):
    """Minimal FLAC encoder (enough for our decoder's supported subset)."""
    data = np.asarray(channels_data)
    if data.ndim == 1:
        data = data[:, None]
    n, ch = data.shape
    w = BitWriter()
    w.write(0x664C6143, 32)  # fLaC
    # STREAMINFO (last block)
    w.write(1, 1)
    w.write(0, 7)
    w.write(34, 24)
    w.write(block, 16)
    w.write(block, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    for _ in range(16):
        w.write(0, 8)

    frame_idx = 0
    for start in range(0, n, block):
        blk = data[start:start + block]
        bs = len(blk)
        w.align()
        w.write(0x3FFE, 14)  # sync
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit at end of header
        w.write(0, 4)  # sample rate: from streaminfo
        w.write(ch - 1, 4)  # independent channels
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        assert frame_idx < 128
        w.write(frame_idx, 8)  # utf8 frame number (single byte)
        w.write(bs - 1, 16)
        w.write(0, 8)  # crc8 (decoder skips)
        for c in range(ch):
            x = blk[:, c].astype(np.int64)
            w.write(0, 1)  # reserved
            if subframe == "constant" and np.all(x == x[0]):
                w.write(0, 6)
                w.write(0, 1)  # no wasted bits
                w.write_signed(x[0], bps)
            elif subframe == "fixed1" and bs > 1:
                w.write(0b001001, 6)  # FIXED order 1
                w.write(0, 1)
                w.write_signed(x[0], bps)  # warmup
                res = x[1:] - x[:-1]
                w.write(0, 2)   # rice method 0
                w.write(0, 4)   # partition order 0
                param = 10
                w.write(param, 4)
                for r in res:
                    u = -2 * r - 1 if r < 0 else 2 * r
                    w.write_unary(int(u) >> param)
                    w.write(int(u) & ((1 << param) - 1), param)
            else:
                w.write(1, 6)  # VERBATIM
                w.write(0, 1)
                for v in x:
                    w.write_signed(v, bps)
        w.align()
        w.write(0, 16)  # crc16 (decoder skips)
        frame_idx += 1
    return w.bytes()


@pytest.mark.parametrize("subframe", ["verbatim", "fixed1"])
def test_flac_roundtrip_mono(tmp_path, subframe):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=1000) * 3000).astype(np.int16)
    p = tmp_path / "x.flac"
    p.write_bytes(encode_flac(x, subframe=subframe))
    data, sr, bps = native.read_flac(str(p))
    assert sr == 16000 and bps == 16
    np.testing.assert_array_equal(data, x.astype(np.int32))


def test_flac_roundtrip_stereo(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(600, 2)) * 3000).astype(np.int16)
    p = tmp_path / "x2.flac"
    p.write_bytes(encode_flac(x))
    data, sr, bps = native.read_flac(str(p))
    assert data.shape == (600, 2)
    np.testing.assert_array_equal(data, x.astype(np.int32))


def test_flac_constant(tmp_path):
    x = np.full(512, 123, np.int16)
    p = tmp_path / "c.flac"
    p.write_bytes(encode_flac(x, subframe="constant"))
    data, _, _ = native.read_flac(str(p))
    np.testing.assert_array_equal(data, x.astype(np.int32))


def test_reader_flac_path(tmp_path):
    from audio8_tpu.data.audio import SoundfileAudioReader

    rng = np.random.default_rng(2)
    x = (rng.normal(size=800) * 8000).astype(np.int16)
    p = tmp_path / "r.flac"
    p.write_bytes(encode_flac(x))
    wav = SoundfileAudioReader().read(str(p))
    assert wav.dtype == np.float32
    np.testing.assert_allclose(wav, x.astype(np.float32) / 32768.0)
