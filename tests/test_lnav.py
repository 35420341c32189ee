"""LNAV encode/decode round-trip + frame sync tests.

Models the reference's built-in-checksum philosophy (findPreambles.sci
parity confirm) as executable tests: fixture by construction, decode must
be bit-exact.
"""

import numpy as np
import pytest

from gnsstpu.nav import frame, lnav
from gnsstpu.nav.types import Ephemeris


def make_eph() -> Ephemeris:
    return Ephemeris(
        week=202, accuracy=1, health=0, T_GD=-4.656e-9, IODC=311,
        t_oc=266400.0, a_f2=0.0, a_f1=-3.2e-12, a_f0=2.45e-4,
        IODE_sf2=55, C_rs=-12.8125, deltan=4.2e-9, M_0=1.23456,
        C_uc=-6.7e-7, e=0.0123456, C_us=8.1e-6, sqrtA=5153.712,
        t_oe=266400.0,
        C_ic=-7.45e-8, omega_0=-2.0312, C_is=1.12e-7, i_0=0.96123,
        C_rc=221.5625, omega=-1.87654, omegaDot=-8.1e-9,
        IODE_sf3=55, iDot=4.0e-10,
    )


def test_parity_roundtrip():
    rng = np.random.default_rng(0)
    d29s, d30s = 0, 0
    for _ in range(50):
        data = rng.integers(0, 2, 24).astype(np.int8)
        tx = lnav.encode_word(data, d29s, d30s)
        unit = np.concatenate([[d29s, d30s], tx])
        assert lnav.parity_ok(unit)
        # Any single-bit flip must fail parity.
        k = rng.integers(0, 30)
        bad = unit.copy()
        bad[2 + k] ^= 1
        assert not lnav.parity_ok(bad)
        d29s, d30s = int(tx[28]), int(tx[29])


def test_encode_decode_roundtrip():
    eph = make_eph()
    pm1 = lnav.encode_frames(eph, tow0=44400, n_subframes=5)
    bits01 = ((1 - pm1) / 2).astype(np.int8)
    dec, tow = lnav.decode_subframes(bits01)
    assert dec.valid
    assert tow == 44400 * 6
    for f in ("week", "accuracy", "health", "IODC", "IODE_sf2", "IODE_sf3"):
        assert getattr(dec, f) == getattr(eph, f), f
    # LSB scale per field (semicircle fields scaled by pi); decode of the
    # encoder's quantization must be EXACT — tolerance is float rounding only.
    pi = np.pi
    scales = {
        "T_GD": 2.0 ** -31, "t_oc": 2.0 ** 4, "a_f2": 2.0 ** -55,
        "a_f1": 2.0 ** -43, "a_f0": 2.0 ** -31, "C_rs": 2.0 ** -5,
        "deltan": 2.0 ** -43 * pi, "M_0": 2.0 ** -31 * pi,
        "C_uc": 2.0 ** -29, "e": 2.0 ** -33, "C_us": 2.0 ** -29,
        "sqrtA": 2.0 ** -19, "t_oe": 2.0 ** 4, "C_ic": 2.0 ** -29,
        "omega_0": 2.0 ** -31 * pi, "C_is": 2.0 ** -29,
        "i_0": 2.0 ** -31 * pi, "C_rc": 2.0 ** -5,
        "omega": 2.0 ** -31 * pi, "omegaDot": 2.0 ** -43 * pi,
        "iDot": 2.0 ** -43 * pi,
    }
    for f, lsb in scales.items():
        a, b = getattr(dec, f), getattr(eph, f)
        expected = round(b / lsb) * lsb
        assert a == pytest.approx(expected, rel=1e-12, abs=1e-30), f


def test_frame_sync_on_simulated_prompts():
    eph = make_eph()
    bits = lnav.encode_frames(eph, tow0=1000, n_subframes=6)
    rng = np.random.default_rng(1)
    bit_len = 20
    lead = 137  # ms of a leading partial bit pattern before subframe start
    lead_bits = rng.choice([-1.0, 1.0], size=(lead + bit_len - 1) // bit_len)
    # The encoder's parity chain starts at (D29*, D30*) = (0, 0), so the two
    # bits preceding the first subframe must decode to 0 (i.e. +1).
    lead_bits[-2:] = 1.0
    stream_bits = np.concatenate([lead_bits, bits])
    prompt = np.repeat(stream_bits, bit_len)[
        (len(lead_bits) * bit_len - lead):]
    prompt = prompt * 1000.0 + rng.normal(0, 150.0, len(prompt))
    for pol in (1, -1):
        sync = frame.find_preamble(pol * prompt)
        assert sync.found
        assert sync.first_subframe_ms == lead
        assert sync.polarity == pol
        b01 = frame.bits_from(pol * prompt, sync)
        dec, tow = lnav.decode_subframes(b01, d30_star=sync.d30_star)
        assert dec.valid
        assert tow == 1000 * 6
        assert dec.sqrtA == pytest.approx(eph.sqrtA, abs=1e-3)


def test_decode_from_every_subframe_boundary():
    """Regression: the decoder must seed BOTH D29* and D30* from the
    word preceding the synced subframe — with only D30* carried, the
    first subframe fails parity whenever the true D29* is 1 (~half of
    mid-stream syncs), silently costing 6 s of data."""
    from gnsstpu.nav import frame
    from tests.test_full_chain import BASE_EPH
    from gnsstpu.nav.types import Ephemeris

    eph = Ephemeris(**BASE_EPH)
    syms = lnav.encode_frames(eph, tow0=44400, n_subframes=12)
    bit_len = 1
    covered_d29 = set()
    for sf_start in range(300, 8 * 300, 300):
        ip = syms[sf_start - 2:]        # 2 lookback bits for D29*/D30*
        sync = frame.find_preamble(ip, bit_len)
        assert sync.found
        bits = frame.bits_from(ip, sync, bit_len)
        covered_d29.add(sync.d29_star)
        dec, tow = lnav.decode_subframes(bits, d30_star=sync.d30_star,
                                         d29_star=sync.d29_star)
        assert dec.valid, f"decode failed from subframe offset {sf_start}"
    # The fixture must actually exercise both D29* polarities.
    assert covered_d29 == {0, 1}
