"""PRN code generator correctness (kernel-parity layer of the test pyramid)."""

import numpy as np

from gnsstpu.signals import gps_l1ca
from gnsstpu.signals.registry import get_signal


def _chips_to_octal(chips, n):
    """First n chips (±1, +1=binary 1) as an octal number, ICD convention."""
    bits = (1 + chips[:n]) // 2
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return int(oct(val)[2:])


def test_ca_code_known_first_octal():
    # IS-GPS-200 table 3-I "first 10 chips octal" column (well-known values).
    expected = {1: 1440, 2: 1620, 3: 1710, 4: 1744, 5: 1133, 10: 1504,
                20: 1715, 32: 1712}
    for prn, octal in expected.items():
        code = gps_l1ca.generate_ca_code(prn)
        assert _chips_to_octal(code, 10) == octal, f"PRN {prn}"


def test_ca_code_properties():
    table = gps_l1ca.code_table()
    assert table.shape == (32, 1023)
    assert set(np.unique(table)) == {-1, 1}
    # Balance: Gold codes have 512 ones / 511 zeros (+1 == binary 1).
    assert np.all(table.sum(axis=1) == 1)
    # Cross-correlation of distinct Gold codes is bounded by 65/1023.
    c1, c2 = table[0].astype(np.int64), table[5].astype(np.int64)
    xc = np.fft.ifft(np.fft.fft(c1) * np.conj(np.fft.fft(c2))).real
    assert np.max(np.abs(xc)) <= 65 + 1e-6
    # Autocorrelation peak is 1023.
    ac = np.fft.ifft(np.abs(np.fft.fft(c1)) ** 2).real
    assert abs(ac[0] - 1023) < 1e-6


def test_registry():
    sd = get_signal("gps_l1ca")
    assert sd.code_length == 1023
    assert sd.num_prn == 32
    assert abs(sd.aid_div - 1540.0) < 1e-9
    np.testing.assert_array_equal(sd.code_fn(7), gps_l1ca.generate_ca_code(7))
