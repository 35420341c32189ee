"""Native runtime library tests: codecs, ring FIFO, GP2021 golden model.

The reference's SIMD library self-tests (simd/simd-test.cpp:171-347
"compare every SSE op against the scalar reference, print PASS/FAIL") are
the model: every native entry point is checked against a NumPy reference;
the GP2021 model additionally cross-checks the JAX engine's uint32 NCO
semantics (SURVEY.md §4.4 cross-implementation strategy).
"""

import threading

import numpy as np
import pytest

from gnsstpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_codec_i8_i16_iq():
    rng = np.random.default_rng(0)
    raw8 = rng.integers(-128, 128, 2 * 5000, dtype=np.int8)
    out = native.decode_i8_iq(raw8)
    assert out.shape == (5000, 2)
    assert np.array_equal(out[:, 0], raw8[0::2].astype(np.float32))
    assert np.array_equal(out[:, 1], raw8[1::2].astype(np.float32))
    raw16 = rng.integers(-2 ** 15, 2 ** 15, 2 * 3000, dtype=np.int16)
    out = native.decode_i16_iq(raw16)
    assert np.array_equal(out[:, 0], raw16[0::2].astype(np.float32))


def test_codec_gn3s_2bit():
    raw = np.arange(16, dtype=np.uint8)
    out = native.decode_gn3s_2bit(raw)
    lut = np.array([-3.0, -1.0, 1.0, 3.0], np.float32)
    assert np.array_equal(out[:, 0], lut[raw & 3])
    assert np.array_equal(out[:, 1], lut[(raw >> 2) & 3])
    # Large buffer exercises the threaded path.
    big = np.random.default_rng(1).integers(0, 256, 1 << 18).astype(
        np.uint8)
    out = native.decode_gn3s_2bit(big)
    assert np.array_equal(out[:, 0], lut[big & 3])


def test_codec_packed_4bit():
    words = np.array([0x0000, 0x8421, 0xFFFF, 0x1234], np.uint16)
    out = native.decode_packed_4bit(words)
    assert out.shape == (16, 2)

    def sm(nib):
        m = 2.0 * (nib & 7) + 1.0
        return -m if nib & 8 else m

    want = [sm((w >> (4 * k)) & 0xF) for w in words for k in range(4)]
    assert np.array_equal(out[:, 0], np.array(want, np.float32))
    assert np.all(out[:, 1] == 0)


def test_ring_fifo_producer_consumer():
    depth, bb = 8, 64
    f = native.RingFifo(depth, bb)
    got = []

    def consumer():
        while True:
            r, blk = f.pop(timeout_ms=2000)
            if r != 1:
                break
            got.append(blk.copy())

    t = threading.Thread(target=consumer)
    t.start()
    blocks = [np.full(bb, i, np.uint8) for i in range(30)]
    for b in blocks:
        assert f.push(b, timeout_ms=2000) == 1
    f.close()
    t.join(timeout=5)
    assert len(got) == 30
    for i, b in enumerate(got):
        assert np.all(b == i)
    s = f.stats()
    assert s["pushed"] == 30 and s["popped"] == 30 and s["overruns"] == 0


def test_ring_fifo_overrun_counts():
    f = native.RingFifo(4, 16)
    blk = np.zeros(16, np.uint8)
    for _ in range(4):
        assert f.push(blk) == 1
    assert f.push(blk) == 0          # full -> dropped, like fifo.cpp
    assert f.stats()["overruns"] == 1


def test_gp2021_nco_phase_matches_jax_nco():
    """The golden model's uint32 carrier NCO must agree bit-for-bit with
    the JAX engine's phase bookkeeping (ops.nco u32 wrap semantics)."""
    from gnsstpu.ops import nco
    from gnsstpu.signals.gps_l1ca import generate_ca_code

    code = generate_ca_code(1)
    ch = native.Gp2021Channel(code)
    fs = 2.048e6
    carr_step = int(nco.freq_to_step_u32(9.548e3 + 4.13e5, fs))
    n = 12345
    iq = np.zeros(2 * n, np.int8)
    ch.run(iq, carr_step, code_step=0, max_dumps=1)
    # u32 phase after n steps == n * step (mod 2^32).
    want = (np.uint64(n) * np.uint64(carr_step)) % np.uint64(2 ** 32)
    assert int(ch.state["carr_phase"][0]) == int(want)


def test_gp2021_correlates_clean_signal():
    """Feed the model a signal built with its own LO/code conventions:
    the prompt accumulator must dominate E/L and scale with the dump
    length (accumulate-and-dump semantics, rtl/accumulator.v)."""
    from gnsstpu.signals.gps_l1ca import generate_ca_code

    code = generate_ca_code(7).astype(np.int8)
    fs = 2.048e6
    code_freq = 1.023e6
    # code NCO step so that 2*1023 half-chip wraps per ms:
    code_step = int(round(2 * code_freq / fs * 2 ** 32)) & 0xFFFFFFFF
    carr_hz = 1.25e5
    carr_step = int(round(carr_hz / fs * 2 ** 32))
    n = 8192
    t = np.arange(n)
    # 8-phase LO replica of the model's own table.
    cos8 = np.array([2, 1, -1, -2, -2, -1, 1, 2])
    sin8 = np.array([1, 2, 2, 1, -1, -2, -2, -1])
    ph = ((t * carr_step) % 2 ** 32) >> 29
    # half-chip index at sample k (taps are read before the NCO step):
    # wraps in the first k additions = floor(k*step/2^32).
    hc = (t * code_step) // 2 ** 32
    cvals = code[((hc % (2 * 1023)) // 2).astype(int)]
    sig_i = cvals * cos8[ph]
    sig_q = cvals * sin8[ph]
    iq = np.empty(2 * n, np.int8)
    iq[0::2] = np.clip(sig_i, -128, 127)
    iq[1::2] = np.clip(sig_q, -128, 127)

    ch = native.Gp2021Channel(code)
    dumps = ch.run(iq, carr_step, code_step, max_dumps=8)
    assert len(dumps) >= 3
    d = dumps[1]          # first full code period
    ie, qe, ip, qp, il, ql = d
    p = np.hypot(float(ip), float(qp))
    e = np.hypot(float(ie), float(qe))
    l = np.hypot(float(il), float(ql))
    assert p > 3000           # ~2048 samples * |LO|^2 ~ 5k scale
    assert p > 1.2 * e and p > 1.2 * l


def test_filesource_packed_formats(tmp_path):
    """FileSource decodes packed front-end formats via the native layer."""
    from gnsstpu.runtime.sources import FileSource

    rng = np.random.default_rng(4)
    # gn3s_2bit
    raw = rng.integers(0, 256, 1000).astype(np.uint8)
    p = tmp_path / "g.bin"
    raw.tofile(p)
    src = FileSource(str(p), fmt="gn3s_2bit")
    assert len(src) == 1000
    got = src.read(10, 100)
    lut = np.array([-3.0, -1.0, 1.0, 3.0], np.float32)
    assert np.array_equal(got[:, 0], lut[raw[10:110] & 3])
    # packed_4bit, unaligned start
    words = rng.integers(0, 1 << 16, 500).astype(np.uint16)
    p2 = tmp_path / "p.bin"
    words.tofile(p2)
    src2 = FileSource(str(p2), fmt="packed_4bit")
    assert len(src2) == 2000
    got = src2.read(7, 33)
    full = native.decode_packed_4bit(words)
    assert np.array_equal(got, full[7:40])
