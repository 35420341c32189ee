"""Device compute ops (XLA + Pallas): the framework's correlator substrate.

This layer replaces every correlator engine in the reference with batched
device kernels:
  * the Scilab vectorized per-block correlation (GPS/L1/tracking.sci:244-289),
  * the C software GP2021 (osgnss correlator.c:148-316),
  * the SSE assembly library (realtime simd/sse.cpp),
  * the namuru FPGA RTL (rtl/tracking_channel.v).

Ops are pure functions over (samples, state) designed for vmap over channels
and scan over code-period blocks.
"""
