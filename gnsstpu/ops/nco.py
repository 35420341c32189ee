"""Integer numerically-controlled oscillators (NCOs).

The reference's hardware-style correlators accumulate carrier/code phase in
32-bit integer registers (osgnss correlator.c 32-bit carrier/code NCOs;
namuru rtl/carrier_nco.v, rtl/code_nco.v). We keep exactly that idea on TPU:
phase lives in uint32 "cycles/2^32" units, advanced by an integer step per
sample. uint32 multiply-accumulate wraps mod 2^32, which *is* the phase wrap —
bit-exact, branch-free, and fp32-noise-free over arbitrarily long runs.

Float carrier frequencies are always split as (base + delta): the large base
step is quantized once on the host in float64; only the small loop-filter
delta is converted on device, so fp32 never rounds a multi-MHz value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi
# Phase LSB in cycles: 2^-32.
_PHASE_SCALE = np.float32(TWO_PI / 4294967296.0)


def freq_to_step_u32(freq_hz: float, fs: float) -> np.uint32:
    """Host-side: exact uint32 NCO step for a static frequency."""
    cycles_per_sample = float(freq_hz) / float(fs) % 1.0
    return np.uint32(np.round(cycles_per_sample * 4294967296.0))


def delta_freq_to_step_i32(delta_hz, fs: float):
    """Device-side: signed NCO step for a small frequency delta (traced f32).

    Valid for |delta_hz| << fs; fp32 rounding here is ~1e-3 Hz at |delta|<8kHz.
    """
    return jnp.round(delta_hz * (4294967296.0 / fs)).astype(jnp.int32)


def carrier_ramp_u32(phase_u32, step_u32, n: int):
    """Phase ramp: phase_u32 + k*step for k=0..n-1, uint32 wrap semantics.

    Returns (phases [n] uint32, final_phase scalar uint32 = phase + n*step).
    """
    k = jnp.arange(n, dtype=jnp.uint32)
    phases = phase_u32 + k * step_u32
    final = phase_u32 + jnp.uint32(n) * step_u32
    return phases, final


def phase_u32_to_angle(phase_u32):
    """uint32 phase → radians in [0, 2π) as float32."""
    return phase_u32.astype(jnp.float32) * _PHASE_SCALE


def lo_iq(phase_u32):
    """Local oscillator (cos, sin) planes from integer phase (split-complex
    form of the reference's carrsig = exp(i·trigarg), tracking.sci:276;
    no complex dtype — see gnsstpu.ops.iq)."""
    ang = phase_u32_to_angle(phase_u32)
    return jnp.cos(ang), jnp.sin(ang)


def lo_iq_factored(phase_u32, step_u32, n: int, b: int = 64):
    """(cos, sin) of the ramp phase + k*step, k < n, via angle-sum
    factorization k = a*b + r:

        e^{i(phi + k s)} = e^{i(phi + a(bs))} * e^{i(r s)}

    costs 2*(ceil(n/b) + b) transcendentals + one outer product instead of
    2*n transcendentals — the dominant VPU cost of carrier wipeoff at TPU
    block sizes. Exact: both partial angles come from wrapped uint32 phase
    (the trig identity holds exactly; only f32 rounding ~1e-7 remains).

    Returns (lo_cos [n], lo_sin [n]) f32.
    """
    a_n = -(-n // b)
    ka = phase_u32 + jnp.arange(a_n, dtype=jnp.uint32) * (
        jnp.uint32(b) * step_u32)
    kr = jnp.arange(b, dtype=jnp.uint32) * step_u32
    aa = phase_u32_to_angle(ka)
    ar = phase_u32_to_angle(kr)
    ca, sa = jnp.cos(aa), jnp.sin(aa)
    cr, sr = jnp.cos(ar), jnp.sin(ar)
    lo_c = (ca[:, None] * cr[None, :] - sa[:, None] * sr[None, :])
    lo_s = (sa[:, None] * cr[None, :] + ca[:, None] * sr[None, :])
    return (lo_c.reshape(-1)[:n], lo_s.reshape(-1)[:n])
