"""Multi-satellite IF signal generator.

Generalization of the reference's GLONASS L3 simulator
(GNSS_SOFTWARE_SIMULATORS/SCILAB/GLONASS/L3/glonass_l3_generator.sce:1-191 —
per-SV code/overlay synthesis with Doppler and Doppler-rate phase evolution)
to any registered signal, with nav-bit modulation and calibrated noise.

Precision strategy (TPU-first): all long-horizon phase bookkeeping (carrier
cycles, absolute chip count) is done **vectorized on the host in float64**
at 1 ms block granularity; the device then synthesizes each block from f32
local ramps (worst-case intra-block error ~6e-5 chip / 1e-4 cycle, far below
simulation noise floors). This keeps device shapes static and avoids f64 on
TPU while guaranteeing no phase drift over arbitrarily long runs.

Truth signal model per satellite (complex IF):
    s(t) = A * d(t - tau) * c(t - tau) * exp(+i*(2*pi*(f_if + fd)*t
             + pi*fd_rate*t^2 + phi0))
with code rate scaled by carrier Doppler: f_code_eff = f_code*(1 + fd_t/f_c)
(code/carrier coherence, as a real front end sees).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gnsstpu.config import SignalConfig
from gnsstpu.signals.registry import get_signal


@dataclasses.dataclass
class SatParams:
    """Truth parameters for one simulated satellite."""

    prn: int
    doppler_hz: float = 0.0          # carrier Doppler at t=0
    doppler_rate: float = 0.0        # [Hz/s]
    # FDMA carrier offset from cfg.if_freq [Hz] (not Doppler: does NOT
    # scale the code rate). GLONASS: k * L1_IF_step.
    if_offset_hz: float = 0.0
    code_phase_chips: float = 0.0    # initial code delay tau in chips (>=0)
    carrier_phase: float = 0.0       # [rad]
    cn0_dbhz: float = 45.0           # carrier-to-noise density (vs sigma=1)
    nav_bits: Optional[np.ndarray] = None  # +-1 bits, one per bit period


class IFSimulator:
    """Streaming block-based IF sample generator."""

    def __init__(self, cfg: SignalConfig, sats: Sequence[SatParams],
                 noise_sigma: float = 1.0, seed: int = 0):
        self.cfg = cfg
        self.sats = list(sats)
        self.noise_sigma = float(noise_sigma)
        self.seed = seed
        self.sd = get_signal(cfg.signal)
        bs = cfg.fs * 1e-3
        if abs(bs - round(bs)) > 1e-9:
            raise ValueError("fs must be an integer multiple of 1 kHz")
        self.block_samples = int(round(bs))
        # Amplitude from C/N0: A^2/(2*sigma^2/fs ... ) — with complex noise of
        # per-sample variance sigma^2 (sigma^2/2 per I/Q), noise density
        # N0 = sigma^2 / fs, carrier power C = A^2. C/N0 = A^2 fs / sigma^2.
        self._amps = np.array(
            [np.sqrt(10 ** (s.cn0_dbhz / 10) / cfg.fs) * noise_sigma
             for s in self.sats], np.float64)
        codes = [self.sd.code_fn(s.prn) for s in self.sats]
        self._codes = np.stack(codes).astype(np.float32)       # [S, L]
        maxbits = max(
            (len(s.nav_bits) if s.nav_bits is not None else 1)
            for s in self.sats)
        bits = np.ones((len(self.sats), maxbits), np.float32)
        for i, s in enumerate(self.sats):
            if s.nav_bits is not None:
                b = np.asarray(s.nav_bits, np.float32)
                bits[i, :len(b)] = b
                if len(b) < maxbits:
                    bits[i, len(b):] = np.resize(b, maxbits - len(b))
        self._bits = bits                                       # [S, NB]

    # ---- host-side f64 per-block phase bookkeeping ----

    def _block_params(self, ms0: int, n_ms: int):
        """Per (sv, block) start phases, in f64 on host.

        Returns dict of [S, n_ms] f32/i32 arrays for the device kernel.
        """
        cfg, sd = self.cfg, self.sd
        t_b = (ms0 + np.arange(n_ms, dtype=np.float64)) * 1e-3   # [n_ms]
        out = {}
        S = len(self.sats)
        carr_frac = np.empty((S, n_ms))
        fc_cyc = np.empty((S, n_ms))
        rate_cyc = np.empty((S, n_ms))
        chip_in_per = np.empty((S, n_ms))
        per_count = np.empty((S, n_ms), np.int64)
        dchip = np.empty((S, n_ms))
        for i, s in enumerate(self.sats):
            f_carr = sd.carrier_freq(s.prn)
            f_if = cfg.if_freq + s.if_offset_hz
            fd_t = s.doppler_hz + s.doppler_rate * t_b
            # Carrier phase in cycles at block start (f64, exact integral).
            phase_cyc = ((f_if + s.doppler_hz) * t_b
                         + 0.5 * s.doppler_rate * t_b ** 2
                         + s.carrier_phase / (2 * np.pi))
            carr_frac[i] = np.mod(phase_cyc, 1.0)
            fc_cyc[i] = (f_if + fd_t) / cfg.fs
            rate_cyc[i] = s.doppler_rate / (cfg.fs * cfg.fs)
            # Absolute chip phase at block start (integral of chip rate).
            code_scale = 1.0 + (s.doppler_hz + 0.5 * s.doppler_rate * t_b) \
                / f_carr
            chips = (cfg.code_freq * t_b * code_scale
                     - s.code_phase_chips)
            per = np.floor(chips / cfg.code_length)
            per_count[i] = per.astype(np.int64)
            chip_in_per[i] = chips - per * cfg.code_length
            dchip[i] = cfg.code_freq * (1.0 + fd_t / f_carr) / cfg.fs
        out["carr_frac"] = carr_frac.astype(np.float32)
        out["fc_cyc"] = fc_cyc.astype(np.float32)
        out["rate_cyc"] = rate_cyc.astype(np.float32)
        out["chip_in_per"] = chip_in_per.astype(np.float32)
        out["per_count"] = per_count.astype(np.int32)
        out["dchip"] = dchip.astype(np.float32)
        return out

    # ---- device block synthesis ----

    @functools.cached_property
    def _synth(self):
        cfg = self.cfg
        L = cfg.code_length
        bit_len = self.sd.bit_len_codes
        n_bs = self.block_samples

        def one_block(codes, bits, amps, carr_frac, fc_cyc, rate_cyc,
                      chip_in_per, per_count, dchip):
            # All leading dims: [S]; synthesize one block for all sats & sum.
            k = jnp.arange(n_bs, dtype=jnp.float32)

            def per_sv(code, bvec, amp, cf, fc, rc, cip, pc, dc):
                ang = (2.0 * jnp.float32(np.pi)) * (
                    cf + k * fc + (k * k) * (0.5 * rc))
                ph = cip + k * dc                       # chips, [0, ~2L)
                wrap = jnp.floor(ph / L).astype(jnp.int32)
                chip = (ph - wrap.astype(jnp.float32) * L).astype(jnp.int32)
                chip = jnp.clip(chip, 0, L - 1)
                cvals = jnp.take(code, chip)
                bidx = (pc + wrap) // bit_len
                bvals = jnp.take(bvec, jnp.clip(bidx, 0, bvec.shape[0] - 1))
                env = amp * cvals * bvals
                return env * jnp.cos(ang), env * jnp.sin(ang)

            si, sq = jax.vmap(per_sv)(codes, bits, amps, carr_frac, fc_cyc,
                                      rate_cyc, chip_in_per, per_count,
                                      dchip)
            return jnp.sum(si, axis=0), jnp.sum(sq, axis=0)

        block_fn = jax.vmap(one_block, in_axes=(None, None, None, 1, 1, 1,
                                                1, 1, 1))

        @jax.jit
        def synth(codes, bits, amps, p, noise_key, sigma):
            si, sq = block_fn(codes, bits, amps, p["carr_frac"], p["fc_cyc"],
                              p["rate_cyc"], p["chip_in_per"],
                              p["per_count"], p["dchip"])    # [n_ms, n_bs]
            nsig = sigma * np.float32(np.sqrt(0.5))
            ni = nsig * jax.random.normal(noise_key, si.shape)
            nq = nsig * jax.random.normal(
                jax.random.fold_in(noise_key, 1), sq.shape)
            return jnp.stack(
                [(si + ni).reshape(-1), (sq + nq).reshape(-1)], axis=-1)

        return synth

    def generate(self, n_ms: int, ms0: int = 0) -> np.ndarray:
        """Generate n_ms milliseconds starting at ms0: f32 [n_ms*fs/1e3, 2]
        (iq32 planes, see gnsstpu.ops.iq)."""
        p = self._block_params(ms0, n_ms)
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), ms0)
        out = self._synth(
            jnp.asarray(self._codes), jnp.asarray(self._bits),
            jnp.asarray(self._amps, jnp.float32), p, key,
            jnp.float32(self.noise_sigma))
        return np.asarray(out)
