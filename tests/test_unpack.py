"""Wire-format pack/unpack roundtrips (ops.unpack)."""

import numpy as np
import pytest

from gnsstpu.ops import unpack as up


@pytest.mark.parametrize("fmt", ["iq8", "iq4", "sm2", "iq1"])
def test_roundtrip_quantized_values(fmt):
    rng = np.random.default_rng(3)
    iq = rng.normal(0.0, 2.0, (4096, 2)).astype(np.float32)
    packed = up.pack(iq, fmt)
    assert packed.dtype == np.uint8
    assert packed.shape[0] == up.wire_bytes(fmt, 4096)
    dec = up.unpack_np(packed, fmt)
    assert dec.shape == (4096, 2)
    # The unpacked values must equal the format's own quantization of
    # the input (pack -> unpack is exact on the quantizer output).
    if fmt == "iq8":
        expect = np.clip(np.round(iq), -127, 127)
    elif fmt == "iq4":
        expect = np.clip(np.round(iq), -8, 7)
    elif fmt == "sm2":
        expect = np.where(iq < 0, -1.0, 1.0) * np.where(
            np.abs(iq) >= 1.0, 3.0, 1.0)
    else:
        expect = np.where(iq < 0, -1.0, 1.0)
    np.testing.assert_array_equal(dec, expect.astype(np.float32))


@pytest.mark.parametrize("fmt", ["iq4", "sm2", "iq1"])
def test_quantized_signal_still_correlates(fmt):
    """A packed+unpacked IF signal must still acquire: quantization to
    1-2 bits costs <1 dB, not detection."""
    from gnsstpu.acquisition import acquire
    from gnsstpu.config import AcqConfig, SignalConfig
    from gnsstpu.sim import IFSimulator, SatParams

    sig = SignalConfig(if_freq=0.0, fs=2.048e6, complex_iq=True)
    sat = SatParams(prn=9, doppler_hz=1200.0, code_phase_chips=301.0,
                    cn0_dbhz=45.0)
    sim = IFSimulator(sig, [sat], noise_sigma=1.0, seed=11)
    samples = np.asarray(sim.generate(8))
    packed = up.pack(samples, fmt, scale=1.0)
    dec = up.unpack_np(packed, fmt)
    acq = AcqConfig(doppler_band=4e3, coherent_ms=2, threshold=2.0)
    res = acquire(dec, sig, acq)
    assert 9 in res.detected_prns()
    ref = acquire(samples, sig, acq)
    assert abs(int(res.code_phase[8]) - int(ref.code_phase[8])) <= 1


def test_native_packer_matches_numpy():
    """The native multithreaded wire packers must be bit-identical to
    the NumPy reference (including round-half-to-even on iq8/iq4)."""
    from gnsstpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    iq = rng.normal(0.0, 1.4, (8192, 2)).astype(np.float32)
    # Exercise halfway values for the rounding convention.
    iq[:16, 0] = np.array([0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 3.5, -3.5,
                           4.5, -4.5, 7.5, -8.5, 126.5, -126.5, 127.5,
                           -127.5], np.float32)
    for fmt in ("iq8", "iq4", "sm2", "iq1"):
        nat = native.pack_wire(iq, fmt, 1.0)
        assert nat is not None
        import unittest.mock as mock
        with mock.patch.object(native, "pack_wire",
                               lambda *a, **k: None):
            ref = up.pack(iq, fmt, 1.0)
        np.testing.assert_array_equal(nat, ref, err_msg=fmt)


def test_packed_stream_source_iq8_window():
    """Regression: PackedStreamSource's history-window arithmetic must
    handle samples_per_byte < 1 (iq8 = 2 bytes/sample) — the window term
    H*int(spb) truncated to zero and every read returned zeros."""
    from gnsstpu import native
    from gnsstpu.runtime.sources import PackedStreamSource

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    iq = rng.normal(0, 20.0, (1024, 2)).astype(np.float32)
    packed = up.pack(iq, "iq8")
    blk = 256
    bpb = up.wire_bytes("iq8", blk)
    fifo = native.RingFifo(depth=8, block_bytes=bpb)
    for b in range(4):
        fifo.push(packed[b * bpb:(b + 1) * bpb], timeout_ms=1000)
    fifo.close()
    src = PackedStreamSource(fifo, blk, fmt="iq8", history_blocks=8,
                             timeout_s=2.0)
    got = src.read_packed(0, 1024)
    np.testing.assert_array_equal(got, packed)
    dec = src.read(0, 1024)
    np.testing.assert_array_equal(dec, up.unpack_np(packed, "iq8"))
