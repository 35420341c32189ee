"""ctypes bindings for the native runtime library (native/).

The runtime-side native components (SURVEY.md §2 ★ items): sample-format
codecs (GN3S 2-bit LUT, CPLD 4-bit packing, int8/int16 I/Q), the blocking
ring FIFO (objects/fifo.cpp equivalent), and the GP2021-style integer
correlator golden model (correlator.c / namuru RTL equivalent, used as the
cross-implementation test oracle).

The library is built on first use with the repo's `native/Makefile` (g++,
no external deps). Every entry point has a NumPy fallback so the package
works without a compiler; `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgnsstpu_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64, i32, u32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint32
        p = ctypes.POINTER
        lib.decode_i8_iq.argtypes = [p(ctypes.c_int8), p(ctypes.c_float),
                                     i64, i32]
        lib.decode_i16_iq.argtypes = [p(ctypes.c_int16), p(ctypes.c_float),
                                      i64, i32]
        lib.decode_gn3s_2bit.argtypes = [p(ctypes.c_uint8),
                                         p(ctypes.c_float), i64, i32]
        lib.decode_packed_4bit.argtypes = [p(ctypes.c_uint16),
                                           p(ctypes.c_float), i64, i32]
        for nm in ("pack_iq8", "pack_iq4", "pack_sm2", "pack_iq1"):
            fn = getattr(lib, nm)
            fn.argtypes = [p(ctypes.c_float), p(ctypes.c_uint8), i64,
                           ctypes.c_float, i32]
        lib.fifo_create.restype = ctypes.c_void_p
        lib.fifo_create.argtypes = [i64, i64]
        lib.fifo_destroy.argtypes = [ctypes.c_void_p]
        lib.fifo_close.argtypes = [ctypes.c_void_p]
        lib.fifo_push.restype = i32
        lib.fifo_push.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8)]
        lib.fifo_push_wait.restype = i32
        lib.fifo_push_wait.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8),
                                       i64]
        lib.fifo_pop.restype = i32
        lib.fifo_pop.argtypes = [ctypes.c_void_p, p(ctypes.c_uint8), i64]
        lib.fifo_stats.argtypes = [ctypes.c_void_p, p(i64)]
        lib.gp2021_run.restype = i32
        lib.gp2021_run.argtypes = [ctypes.c_void_p, p(ctypes.c_int8), i32,
                                   p(ctypes.c_int8), i64, u32, u32, i32,
                                   p(i64), i32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pack_wire(iq: np.ndarray, fmt: str, scale: float) -> Optional[np.ndarray]:
    """Native wire-format packer (ops.unpack formats); None if the native
    library is unavailable (callers fall back to the NumPy packer)."""
    lib = _load()
    if lib is None:
        return None
    iq = np.ascontiguousarray(iq, np.float32)
    n = iq.shape[0]
    nbytes = {"iq8": 2 * n, "iq4": n, "sm2": n // 2, "iq1": n // 4}[fmt]
    out = np.empty(nbytes, np.uint8)
    getattr(lib, f"pack_{fmt}")(
        iq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, ctypes.c_float(scale), _threads())
    return out


def _threads() -> int:
    return min(8, os.cpu_count() or 1)


# ---- sample codecs (native with NumPy fallback) ----

_LUT2 = np.array([-3.0, -1.0, 1.0, 3.0], np.float32)


def decode_i8_iq(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw, np.int8)
    n = raw.size // 2
    out = np.empty((n, 2), np.float32)
    lib = _load()
    if lib is not None:
        lib.decode_i8_iq(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, _threads())
    else:
        out[:, 0] = raw[: 2 * n : 2]
        out[:, 1] = raw[1: 2 * n: 2]
    return out


def decode_i16_iq(raw: np.ndarray) -> np.ndarray:
    raw = np.ascontiguousarray(raw, np.int16)
    n = raw.size // 2
    out = np.empty((n, 2), np.float32)
    lib = _load()
    if lib is not None:
        lib.decode_i16_iq(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, _threads())
    else:
        out[:, 0] = raw[: 2 * n: 2]
        out[:, 1] = raw[1: 2 * n: 2]
    return out


def decode_gn3s_2bit(raw: np.ndarray) -> np.ndarray:
    """One complex sample per byte: I = bits 1:0, Q = bits 3:2, LUT
    {-3,-1,+1,+3} (gps_source.cpp:692)."""
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.size
    out = np.empty((n, 2), np.float32)
    lib = _load()
    if lib is not None:
        lib.decode_gn3s_2bit(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n, _threads())
    else:
        out[:, 0] = _LUT2[raw & 3]
        out[:, 1] = _LUT2[(raw >> 2) & 3]
    return out


def decode_packed_4bit(raw: np.ndarray) -> np.ndarray:
    """CPLD packing (data_packer.vhd): LE 16-bit words of 4 x 4-bit
    sign/mag real samples; sample k in bits [4k+3:4k]."""
    raw = np.ascontiguousarray(raw, np.uint16)
    n = raw.size * 4
    out = np.empty((n, 2), np.float32)
    lib = _load()
    if lib is not None:
        lib.decode_packed_4bit(
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            raw.size, _threads())
    else:
        nib = np.empty(n, np.uint16)
        for k in range(4):
            nib[k::4] = (raw >> (4 * k)) & 0xF
        mag = 2.0 * (nib & 7) + 1.0
        out[:, 0] = np.where(nib & 8, -mag, mag).astype(np.float32)
        out[:, 1] = 0.0
    return out


# ---- ring FIFO ----

class RingFifo:
    """Blocking ring of fixed-size byte blocks (objects/fifo.cpp:53-187
    equivalent). Requires the native library."""

    def __init__(self, depth: int, block_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.fifo_create(depth, block_bytes)
        self.block_bytes = block_bytes

    def push(self, block: np.ndarray, timeout_ms: int = -1) -> int:
        buf = np.ascontiguousarray(block, np.uint8)
        assert buf.nbytes == self.block_bytes
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if timeout_ms < 0:
            return self._lib.fifo_push(self._h, ptr)
        return self._lib.fifo_push_wait(self._h, ptr, timeout_ms)

    def pop(self, timeout_ms: int = 1000):
        out = np.empty(self.block_bytes, np.uint8)
        r = self._lib.fifo_pop(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            timeout_ms)
        return r, out

    def stats(self) -> dict:
        s = np.zeros(4, np.int64)
        self._lib.fifo_stats(
            self._h, s.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return {"count": int(s[0]), "pushed": int(s[1]),
                "popped": int(s[2]), "overruns": int(s[3])}

    def close(self) -> None:
        self._lib.fifo_close(self._h)

    def __del__(self):
        try:
            self._lib.fifo_destroy(self._h)
        except Exception:
            pass


# ---- GP2021 golden model ----

class Gp2021Channel:
    """Sample-serial integer correlator channel (test oracle)."""

    _STATE_DTYPE = np.dtype([
        ("carr_phase", np.uint32), ("code_phase", np.uint32),
        ("half_chip", np.int32), ("acc", np.int64, 6),
        ("epoch_ms", np.int32)], align=True)

    def __init__(self, code: np.ndarray, epochs_per_bit: int = 20):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.code = np.ascontiguousarray(code, np.int8)
        self.epochs_per_bit = epochs_per_bit
        self.state = np.zeros(1, self._STATE_DTYPE)

    def run(self, iq_int8: np.ndarray, carr_step: int, code_step: int,
            max_dumps: int = 64):
        iq = np.ascontiguousarray(iq_int8, np.int8)
        n = iq.size // 2
        dumps = np.zeros(6 * max_dumps, np.int64)
        got = self._lib.gp2021_run(
            self.state.ctypes.data_as(ctypes.c_void_p),
            self.code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            len(self.code),
            iq.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            n, ctypes.c_uint32(carr_step & 0xFFFFFFFF),
            ctypes.c_uint32(code_step & 0xFFFFFFFF),
            self.epochs_per_bit,
            dumps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_dumps)
        return dumps[: 6 * got].reshape(got, 6)
