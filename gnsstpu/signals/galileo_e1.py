"""Galileo E1 Open Service signal: E1B primary codes, BOC(1,1) subcarrier.

Reference: GALILEO/E1 Scilab receiver. The E1B/E1C primary codes are
*memory codes* (no generator polynomial exists): the reference ships them
as a hex text table loaded by GALILEO/E1/include/readE1Bcode.sci and
resampled by makeE1BCodesTable.sci — 4092 chips @ 1.023 Mcps, 4 ms
period. The BOC(1,1) subcarrier ("meandr" in the reference,
initSettings.sci keys meandrFreqBasis = 2.046 MHz / meandrLength = 8184)
flips sign every half chip.

This module does NOT embed the ICD code tables. Codes come from either:
  1. a user-registered code file (`load_codes(path)`) holding one hex
     string per PRN in the reference's format, or
  2. a deterministic synthetic fallback — seeded pseudo-random ±1
     sequences with the same length/balance statistics. Simulator,
     acquisition, tracking, and decode all pull codes through the same
     registry, so closed-loop operation is self-consistent either way;
     processing *recorded* Galileo IF data requires loading real codes.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

CODE_FREQ = 1.023e6          # primary-code chip rate [Hz]
CODE_LENGTH = 4092           # chips per 4 ms period
SUB_FREQ = 2.046e6           # BOC(1,1) subcarrier ("meandr") rate [Hz]
SUB_LENGTH = 8184            # meandr half-chips per period
NUM_PRN = 50
CARRIER_HZ = 1575.42e6

# E1C secondary code CS25_1 (ICD table, 25 chips over 100 ms), as ±1
# with 0 -> +1, 1 -> -1. Hex 0x380AD90 (25 bits: 0011100000001010110110010).
_CS25_BITS = np.array([int(b) for b in f"{0x380AD90:025b}"], np.int8)
CS25 = (1 - 2 * _CS25_BITS).astype(np.int8)

_user_codes: Optional[np.ndarray] = None


def load_codes(path: str) -> None:
    """Load real E1B primary codes from a hex table file.

    Format (the reference's galileo-primary-code.txt layout): one line per
    PRN, each a 1023-hex-digit string; bit k of the string (MSB first) is
    chip k, 0 -> +1, 1 -> -1.
    """
    global _user_codes
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip().rstrip(",")
            if not line:
                continue
            h = line.split()[-1].strip('"')
            bits = np.array(
                [int(b) for b in bin(int(h, 16))[2:].zfill(4 * len(h))],
                np.int8)[-CODE_LENGTH:]
            rows.append((1 - 2 * bits).astype(np.int8))
    if not rows:
        raise ValueError(f"no codes found in {path}")
    _user_codes = np.stack(rows)
    primary_code.cache_clear()
    composite_code.cache_clear()


@functools.lru_cache(maxsize=None)
def primary_code(prn: int) -> np.ndarray:
    """±1 int8 [4092] E1B primary code for PRN 1..50.

    Real memory code if load_codes() was called; otherwise the synthetic
    deterministic fallback (documented in the module docstring).
    """
    if not 1 <= prn <= NUM_PRN:
        raise ValueError(f"E1 PRN must be 1..{NUM_PRN}, got {prn}")
    if _user_codes is not None:
        return _user_codes[prn - 1]
    # Deterministic synthetic memory code: seeded Philox stream, balanced
    # like the real codes (|sum| small), fixed per PRN forever.
    rng = np.random.default_rng(np.random.SeedSequence([0xE1B, prn]))
    return rng.choice(np.array([-1, 1], np.int8), CODE_LENGTH)


def subcarrier() -> np.ndarray:
    """±1 int8 [8184] BOC(1,1) meandr: +1 on even half-chips.

    Matches the reference's meandr = ones; meandr(2:2:$) = -1
    (tracking.sci:164)."""
    m = np.ones(SUB_LENGTH, np.int8)
    m[1::2] = -1
    return m


@functools.lru_cache(maxsize=None)
def composite_code(prn: int) -> np.ndarray:
    """±1 int8 [8184] BOC(1,1)-modulated E1B code at the half-chip rate.

    composite[k] = code[k // 2] * meandr[k]. This is the matched replica
    used by acquisition and the signal simulator; the double-estimator
    tracker (tracking.boc) keeps code and subcarrier separate.
    """
    return (np.repeat(primary_code(prn), 2) * subcarrier()).astype(np.int8)
