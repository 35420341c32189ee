"""Wire-format sample packing/unpacking (host pack, device unpack).

GNSS front ends ship 1-4 bit samples (the reference's GN3S streams 2-bit
sign/mag, objects/gps_source.cpp:692 LUT {-3,-1,+1,+3}; the custom
MAX2769 front end packs 4-bit samples, FRONT_END_SOURCE/CPLD/
data_packer.vhd) — quantization this coarse costs well under 1 dB of
C/N0. On this framework's deployment shape the host->device link is the
scarce resource (the samples cross a network/PCIe hop to the TPU), so
the wire format is carried ALL THE WAY to the device and unpacked there
by the first stage of the jit program: a 2-bit wire moves 4x fewer bytes
per epoch than int8 and 16x fewer than f32.

Formats (bits per complex I/Q sample pair):
  'iq8'  16 — interleaved signed int8 I,Q (the debug/high-rate format)
  'iq4'   8 — two's-complement nibbles, I low, Q high
  'sm2'   4 — sign/mag 2-bit per component, 2 sample pairs per byte,
              values {-3,-1,+1,+3} (GN3S-compatible mapping)
  'iq1'   2 — sign only, 4 sample pairs per byte, values {-1,+1}

All host packers take float/int [N, 2] arrays (I, Q columns); device
unpackers are pure jnp and jit-inline into the tracking program.
"""

from __future__ import annotations

import numpy as np

#: bytes per complex sample pair, as (numerator, denominator)
WIRE_FORMATS = {"iq8": (2, 1), "iq4": (1, 1), "sm2": (1, 2),
                "iq1": (1, 4)}


def wire_bytes(fmt: str, n_samples: int) -> int:
    """Packed byte count for n_samples I/Q pairs."""
    num, den = WIRE_FORMATS[fmt]
    if n_samples % den:
        raise ValueError(f"{fmt}: sample count {n_samples} not a "
                         f"multiple of {den}")
    return n_samples * num // den


def samples_per_byte(fmt: str) -> float:
    num, den = WIRE_FORMATS[fmt]
    return den / num


def align(fmt: str) -> int:
    """Sample-index alignment required for a packed read."""
    return WIRE_FORMATS[fmt][1]


# --------------------------------------------------------------------------
# Host-side pack (producers, tests, simulators)
# --------------------------------------------------------------------------


def pack(iq: np.ndarray, fmt: str, scale: float = 1.0) -> np.ndarray:
    """Quantize float [N, 2] I/Q to the wire format; returns uint8 bytes.

    scale multiplies the input before quantization; for noise-dominated
    GNSS IF samples with std sigma, scale ~ 1/sigma puts the sm2
    mag threshold at ~1 sigma (near-optimal 2-bit quantizer).

    Uses the native multithreaded packer when the library is available
    (a live producer packs at the radio rate); NumPy otherwise —
    bit-identical outputs either way (tests pin this).
    """
    n = np.asarray(iq).shape[0]
    if fmt in ("sm2", "iq1"):
        den = {"sm2": 2, "iq1": 4}[fmt]
        if n % den:
            raise ValueError(f"{fmt} needs a multiple-of-{den} count")
    if fmt in WIRE_FORMATS:
        from gnsstpu import native

        out = native.pack_wire(np.asarray(iq, np.float32), fmt,
                               float(scale))
        if out is not None:
            return out
    x = np.asarray(iq, np.float32) * np.float32(scale)
    if fmt == "iq8":
        return np.clip(np.round(x), -127, 127).astype(np.int8).reshape(
            -1).view(np.uint8)
    if fmt == "iq4":
        q = np.clip(np.round(x), -8, 7).astype(np.int8)
        lo = (q[:, 0] & 0x0F).astype(np.uint8)
        hi = ((q[:, 1] & 0x0F) << 4).astype(np.uint8)
        return lo | hi
    if fmt == "sm2":
        if n % 2:
            raise ValueError("sm2 needs an even sample count")
        sign = (x < 0).astype(np.uint8)                   # 1 = negative
        mag = (np.abs(x) >= 1.0).astype(np.uint8)          # |q| in {1, 3}
        nib = (sign[:, 0] | (mag[:, 0] << 1)
               | (sign[:, 1] << 2) | (mag[:, 1] << 3))     # [N]
        return (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    if fmt == "iq1":
        if n % 4:
            raise ValueError("iq1 needs a multiple-of-4 sample count")
        bits = (x < 0).astype(np.uint8)                    # 1 = negative
        b = (bits[:, 0] | (bits[:, 1] << 1)).reshape(-1, 4)  # 2 bits/pair
        return (b[:, 0] | (b[:, 1] << 2) | (b[:, 2] << 4)
                | (b[:, 3] << 6)).astype(np.uint8)
    raise ValueError(f"unknown wire format {fmt!r}")


def unpack_np(packed: np.ndarray, fmt: str) -> np.ndarray:
    """Host-side unpack (fine-Doppler windows, tests): f32 [N, 2]."""
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(unpack(np.asarray(packed, np.uint8), fmt))


# --------------------------------------------------------------------------
# Device-side unpack (jit-inlined)
# --------------------------------------------------------------------------


def unpack(packed, fmt: str):
    """uint8 wire bytes -> f32 [N, 2] on device; jit-traceable."""
    import jax.numpy as jnp

    p = packed.astype(jnp.int32)
    if fmt == "iq8":
        # int8 pairs arrive as a uint8 view; undo two's complement.
        v = jnp.where(p >= 128, p - 256, p).astype(jnp.float32)
        return v.reshape(-1, 2)
    if fmt == "iq4":
        i = p & 0x0F
        q = (p >> 4) & 0x0F
        i = jnp.where(i >= 8, i - 16, i)
        q = jnp.where(q >= 8, q - 16, q)
        return jnp.stack([i, q], axis=1).astype(jnp.float32)
    if fmt == "sm2":
        nib = jnp.stack([p & 0x0F, (p >> 4) & 0x0F], axis=1).reshape(-1)
        i = (1 + 2 * ((nib >> 1) & 1)) * (1 - 2 * (nib & 1))
        q = (1 + 2 * ((nib >> 3) & 1)) * (1 - 2 * ((nib >> 2) & 1))
        return jnp.stack([i, q], axis=1).astype(jnp.float32)
    if fmt == "iq1":
        two = jnp.stack([p & 3, (p >> 2) & 3, (p >> 4) & 3,
                         (p >> 6) & 3], axis=1).reshape(-1)
        i = 1 - 2 * (two & 1)
        q = 1 - 2 * ((two >> 1) & 1)
        return jnp.stack([i, q], axis=1).astype(jnp.float32)
    raise ValueError(f"unknown wire format {fmt!r}")
