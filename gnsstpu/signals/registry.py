"""Signal registry: maps signal names to code generators and metadata.

The registry is the framework's equivalent of the reference's per-receiver
directory layout (GPS/L1, GLONASS/L1..L3, GALILEO/E1, COMPASS/B1 under
POSTPROCESSING_SCILAB_RECEIVERS) — one entry per supported signal.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class SignalDef:
    name: str
    # Carrier frequency of PRN/channel k [Hz] (callable for FDMA).
    carrier_freq: Callable[[int], float]
    code_freq: float
    code_length: int
    # code_fn(prn) -> ±1 int8 [code_length]
    code_fn: Callable[[int], np.ndarray]
    num_prn: int
    # Data bit (or meander/secondary-code) period in code periods.
    bit_len_codes: int
    # Secondary (overlay) code, ±1 int8, or None.
    secondary: Optional[np.ndarray] = None
    # Carrier-aiding divisor f_carrier / f_code.
    @property
    def aid_div(self) -> float:
        return self.carrier_freq(0) / self.code_freq


_REGISTRY: Dict[str, SignalDef] = {}


def register(sd: SignalDef) -> SignalDef:
    _REGISTRY[sd.name] = sd
    return sd


def get_signal(name: str) -> SignalDef:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown signal {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def _register_builtin() -> None:
    from gnsstpu.signals import gps_l1ca

    register(
        SignalDef(
            name="gps_l1ca",
            carrier_freq=lambda prn: 1575.42e6,
            code_freq=1.023e6,
            code_length=1023,
            code_fn=gps_l1ca.generate_ca_code,
            num_prn=32,
            bit_len_codes=20,  # 50 bps LNAV over 1 ms codes
        )
    )


_register_builtin()
