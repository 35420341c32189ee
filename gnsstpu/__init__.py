"""gnsstpu — a TPU-native GNSS software-receiver framework.

A from-scratch JAX/XLA/Pallas implementation of the full GNSS receiver signal
chain provided by the reference ecosystem `mbavaro/gnss-sdr.ru` (the archived
code.google.com/p/gnsssdr project): FFT-based parallel code-phase acquisition,
DLL/PLL/FLL tracking channels with carrier/code NCOs and early/prompt/late
correlators, nav-message demodulation and decode, and least-squares PVT — for
GPS L1 C/A, GLONASS L1/L2 FDMA and L3 CDMA, Galileo E1 BOC, and BeiDou B1.

Architecture (TPU-first, not a port):
  * device = batched signal kernels (acquisition grids, correlator blocks)
    expressed as jit/scan/vmap programs and Pallas kernels;
  * host   = tiny scalar control programs (nav decode, PVT, channel manager);
  * scale  = jax.sharding Mesh over (channel, doppler, time) axes with XLA
    collectives — no thread/pipe fabric.
"""

__version__ = "0.1.0"

from gnsstpu.config import (  # noqa: F401
    SignalConfig,
    AcqConfig,
    TrackConfig,
    NavConfig,
    ReceiverConfig,
)
