"""Sample sources: the host feed into the device pipeline.

Replaces the reference's GPS_Source / FIFO fabric
(objects/gps_source.cpp:135-944, objects/fifo.cpp) and the Scilab
mopen/mget file reads (postProcessing.sce:60, tracking.sci:224) with a
simple random-access read(start, count) protocol; the tracking driver
prefetches chunk windows to the device.
"""

from __future__ import annotations

import os
from typing import Protocol

import numpy as np



class SampleSource(Protocol):
    def read(self, start: int, count: int) -> np.ndarray:
        """Return iq32 f32 [count, 2] samples; zero-pad past the end."""
        ...

    def __len__(self) -> int: ...


class ArraySource:
    """In-memory source over an iq32 [N, 2] (or complex, converted) array."""

    def __init__(self, samples: np.ndarray):
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            from gnsstpu.ops.iq import complex_to_iq
            samples = complex_to_iq(samples)
        self.samples = np.asarray(samples, np.float32).reshape(-1, 2)

    def read(self, start: int, count: int) -> np.ndarray:
        out = np.zeros((count, 2), np.float32)
        lo = max(start, 0)
        hi = min(start + count, len(self.samples))
        if hi > lo:
            out[lo - start: hi - start] = self.samples[lo:hi]
        return out

    def __len__(self) -> int:
        return len(self.samples)


class _PackedReadMixin:
    """Decoded f32 read() on top of a read_packed() implementation
    (host-side consumers: fine-Doppler refinement, host-path
    acquisition). Honors the SampleSource contract: samples outside
    [0, len(self)) are ZERO — packed zero BYTES decode to DC (+1,+1)
    sign/mag levels, so the out-of-range span is zeroed explicitly."""

    def read(self, start: int, count: int) -> np.ndarray:
        from gnsstpu.ops import unpack as up

        a = up.align(self._fmt)
        s0 = start - start % a
        n = count + (start - s0)
        n += (-n) % a
        dec = up.unpack_np(self.read_packed(s0, n), self._fmt)
        out = np.array(dec[start - s0: start - s0 + count])
        src_len = len(self)
        lo = max(0, -start)
        hi = max(0, min(count, src_len - start))
        out[:lo] = 0.0
        out[hi:] = 0.0
        return out


class PackedArraySource(_PackedReadMixin):
    """In-memory packed wire-format source (ops.unpack formats).

    The pipelined ChannelManager detects `wire_format` + `read_packed`
    and ships the PACKED bytes to the device, unpacking there — on a
    bandwidth-limited host->device link this cuts sample traffic 2-8x
    vs int8 (a real 2-bit front end's wire format, reference GN3S
    gps_source.cpp:692). read() still serves decoded f32 for host-side
    consumers (fine-Doppler refinement, host-path acquisition).
    """

    def __init__(self, samples_iq: np.ndarray, fmt: str = "sm2",
                 scale: float = 1.0):
        from gnsstpu.ops import unpack as up

        self.wire_format = fmt
        self._fmt = fmt
        n = len(samples_iq)
        n -= n % up.align(fmt)
        self.packed = up.pack(np.asarray(samples_iq)[:n], fmt, scale)
        self._n = n
        self._spb = up.samples_per_byte(fmt)

    def read_packed(self, start: int, count: int) -> np.ndarray:
        """Packed bytes covering samples [start, start+count); both must
        be aligned to the format's samples-per-byte."""
        from gnsstpu.ops import unpack as up

        a = up.align(self._fmt)
        if start % a or count % a:
            raise ValueError(f"unaligned packed read ({start}, {count})")
        b0 = int(start / self._spb)
        nb = int(count / self._spb)
        out = np.zeros(nb, np.uint8)
        seg = self.packed[max(b0, 0): b0 + nb]
        out[max(-b0, 0): max(-b0, 0) + len(seg)] = seg
        return out


    def __len__(self) -> int:
        return self._n


class DevicePackedArraySource(_PackedReadMixin):
    """Packed wire-format source resident in device HBM.

    The whole packed byte stream is uploaded once; read_packed() serves
    device slices, so the ChannelManager's superepoch feed pays ZERO
    per-chunk host->device transfer. Two uses: (1) replaying a recorded
    signal from HBM at full device rate, (2) benchmarking the receiver
    pipeline decoupled from the host link (the figure a PCIe-attached
    host approaches, where upload is ~free). Host-side consumers (cold
    acquisition, fine-Doppler refinement) read a retained host copy.
    """

    def __init__(self, samples_iq: np.ndarray, fmt: str = "sm2",
                 scale: float = 1.0,
                 tail_pad_samples: int = 1 << 24):
        import jax

        from gnsstpu.ops import unpack as up

        self.wire_format = fmt
        self._fmt = fmt
        n = len(samples_iq)
        n -= n % up.align(fmt)
        self.packed = up.pack(np.asarray(samples_iq)[:n], fmt, scale)
        self._spb = up.samples_per_byte(fmt)
        # Zero-byte tail pad: reads past end-of-data return zero BYTES
        # (the same convention as PackedArraySource.read_packed — a
        # clamped dynamic_slice would return shifted stale samples).
        self._pad_b = int(tail_pad_samples / self._spb)
        self.packed_dev = jax.device_put(np.concatenate(
            [self.packed, np.zeros(self._pad_b, np.uint8)]))
        self._n = n

    def read_packed(self, start: int, count: int):
        """Device uint8 slice covering samples [start, start+count);
        up to tail_pad_samples past the end serve zero bytes."""
        import jax

        from gnsstpu.ops import unpack as up

        a = up.align(self._fmt)
        if start % a or count % a:
            raise ValueError(f"unaligned packed read ({start}, {count})")
        b0 = int(start / self._spb)       # negative for start < 0
        nb = int(count / self._spb)
        if b0 + nb > len(self.packed) + self._pad_b:
            raise ValueError(
                f"read past the device buffer's tail pad "
                f"({start}+{count} vs {self._n}+pad)")
        if b0 < 0:
            # Pre-start reads serve zero bytes, front-aligned (a
            # clamped slice would return SHIFTED samples — the exact
            # failure the tail pad exists to prevent, on the other
            # side).
            import jax.numpy as jnp
            nb_avail = max(nb + b0, 0)
            seg = jax.lax.dynamic_slice_in_dim(self.packed_dev, 0,
                                               nb_avail)
            return jnp.concatenate(
                [jnp.zeros(nb - nb_avail, jnp.uint8), seg])
        return jax.lax.dynamic_slice_in_dim(self.packed_dev, b0, nb)

    def read(self, start: int, count: int) -> np.ndarray:
        # Deliberately NOT the _PackedReadMixin path: that would route
        # through read_packed (a DEVICE array -> transfer back); host
        # consumers decode the retained host copy instead.
        from gnsstpu.ops import unpack as up

        out = np.zeros((count, 2), np.float32)
        if start < 0:
            lead = min(-start, count)
            if count > lead:
                out[lead:] = self.read(0, count - lead)
            return out
        a = up.align(self._fmt)
        s0 = start - start % a
        n = count + (start - s0)
        n += (-n) % a
        b0 = int(s0 / self._spb)
        seg = self.packed[b0: b0 + int(n / self._spb)]
        dec = up.unpack_np(seg, self._fmt)
        got = dec[start - s0: start - s0 + count]
        out[: len(got)] = got
        return out

    def __len__(self) -> int:
        return self._n


class FileSource:
    """Raw IF sample file source.

    Formats (reference initSettings.sci fileType / defines.h; packed
    front-end formats decoded by the native codec library,
    gnsstpu.native):
      'i8_iq'       — interleaved signed 8-bit I,Q pairs (fileType 2)
      'i8'          — signed 8-bit real samples (fileType 1)
      'i16_iq'      — interleaved signed 16-bit I,Q
      'c64'         — raw complex64
      'gn3s_2bit'   — 1 byte/sample: I bits 1:0, Q bits 3:2, LUT
                      {-3,-1,+1,+3} (gps_source.cpp:692)
      'packed_4bit' — CPLD-packed real: LE u16 words of 4 x 4-bit
                      sign/mag samples (data_packer.vhd)
    """

    _ITEM = {"i8_iq": (np.int8, 2), "i8": (np.int8, 1),
             "i16_iq": (np.int16, 2), "c64": (np.complex64, 1),
             "gn3s_2bit": (np.uint8, 1), "packed_4bit": (np.uint16, 1)}

    def __init__(self, path: str, fmt: str = "i8_iq", skip_samples: int = 0):
        if fmt not in self._ITEM:
            raise ValueError(f"unknown format {fmt!r}")
        self.path = path
        self.fmt = fmt
        self.skip = skip_samples
        dtype, per = self._ITEM[fmt]
        self._dtype, self._per = dtype, per
        if fmt == "packed_4bit":
            size = os.path.getsize(path)
            self._n = size // 2 * 4 - skip_samples
        else:
            self._bytes_per_sample = np.dtype(dtype).itemsize * per
            self._n = (os.path.getsize(path) // self._bytes_per_sample
                       - skip_samples)

    def read(self, start: int, count: int) -> np.ndarray:
        from gnsstpu import native

        start += self.skip
        out = np.zeros((count, 2), np.float32)
        if self.fmt == "packed_4bit":
            w0, w1 = start // 4, -(-(start + count) // 4)
            raw = np.fromfile(self.path, dtype=np.uint16,
                              count=w1 - w0, offset=2 * w0)
            dec = native.decode_packed_4bit(raw)
            got = dec[start - 4 * w0: start - 4 * w0 + count]
            out[: len(got)] = got
            return out
        raw = np.fromfile(
            self.path, dtype=self._dtype,
            count=count * self._per,
            offset=start * self._bytes_per_sample)
        n = len(raw) // self._per
        if self.fmt == "c64":
            out[:n, 0] = raw[:n].real
            out[:n, 1] = raw[:n].imag
        elif self.fmt == "gn3s_2bit":
            out[:n] = native.decode_gn3s_2bit(raw[:n])
        elif self.fmt == "i8_iq":
            out[:n] = native.decode_i8_iq(raw[: 2 * n])
        elif self.fmt == "i16_iq":
            out[:n] = native.decode_i16_iq(raw[: 2 * n])
        else:
            out[:n, 0] = raw[:n]
        return out

    def __len__(self) -> int:
        return self._n


class SimSource:
    """Streaming source over an IFSimulator with block caching."""

    def __init__(self, sim, n_ms: int):
        self.sim = sim
        self.n_ms = n_ms
        self.block = sim.block_samples
        self._cache_ms0 = -1
        self._cache = None
        self._cache_len_ms = 0

    def read(self, start: int, count: int) -> np.ndarray:
        ms0 = max(start // self.block, 0)
        ms1 = min((start + count - 1) // self.block + 1, self.n_ms)
        if ms1 <= ms0:
            # Entirely outside [0, n_ms): zero-pad per the protocol
            # (a negative gen_len would otherwise reach the simulator).
            return np.zeros((count, 2), np.float32)
        if not (self._cache_ms0 <= ms0 and
                ms1 <= self._cache_ms0 + self._cache_len_ms):
            gen_ms0 = ms0
            gen_len = max(ms1 - ms0, min(self.n_ms - ms0, 256))
            self._cache = self.sim.generate(gen_len, gen_ms0)
            self._cache_ms0 = gen_ms0
            self._cache_len_ms = gen_len
        off = start - self._cache_ms0 * self.block
        out = np.zeros((count, 2), np.float32)
        avail = self._cache[max(off, 0): off + count]
        out[max(-off, 0): max(-off, 0) + len(avail)] = avail
        return out

    def __len__(self) -> int:
        return self.n_ms * self.block


class StreamSource:
    """Live streaming source: a producer thread feeds the native ring
    FIFO; reads are served from a rolling history window.

    This is the framework's FIFO/GPS_Source fabric (reference
    objects/fifo.cpp:53-187 4000-deep ms_packet ring between the radio
    thread and the correlator; objects/gps_source.cpp:135 Read): the
    producer (USB radio, socket, growing file) pushes decoded 1 ms f32
    blocks; the consumer (ChannelManager / tracking driver) keeps its
    random-access read(start, count) protocol against a bounded history,
    BLOCKING until the stream has produced up to start+count.

    Semantics:
      * reads past the producer's current position block (up to
        timeout_s, then TimeoutError — the Patience-watchdog stall
        signal, objects/patience.cpp:80-104);
      * reads older than the history window return zeros (data fell off
        the ring — the real-time receiver's equivalent of an overrun);
      * producer end-of-stream (FIFO closed and drained) zero-fills, so
        epoch loops terminate via their end-of-data checks.

    stats() surfaces FIFO depth/overrun counters for telemetry
    (doxygen.h:113 "FIFO: 999 9801..." display).
    """

    def __init__(self, fifo, block_samples: int, history_blocks: int = 512,
                 timeout_s: float = 10.0):
        self.fifo = fifo
        self.block = int(block_samples)
        self.hist_blocks = int(history_blocks)
        self.timeout_s = timeout_s
        self._hist = np.zeros((self.hist_blocks * self.block, 2),
                              np.float32)
        self._end = 0            # absolute samples consumed from the FIFO
        self._eos = False
        self._restart_factory = None
        self.restarts = 0

    def set_restart(self, factory) -> "StreamSource":
        """Arm Patience-style recovery: factory() must stop/replace the
        producer and return a STARTED producer feeding this source's
        FIFO (reference patience.cpp:80-104 Stop -> ResetSource ->
        Start). The ChannelManager calls restart() on a stall instead
        of raising."""
        self._restart_factory = factory
        return self

    @property
    def can_restart(self) -> bool:
        return self._restart_factory is not None

    def restart(self) -> None:
        self._eos = False
        self.restarts += 1
        self._restart_factory()

    def position(self) -> int:
        """Absolute sample position of the stream head (produced)."""
        return self._end

    def _pump_until(self, need_end: int) -> None:
        import time as _time

        deadline = _time.monotonic() + self.timeout_s
        H = len(self._hist)
        while self._end < need_end and not self._eos:
            r, buf = self.fifo.pop(timeout_ms=200)
            if r == 1:
                deadline = _time.monotonic() + self.timeout_s
                blk = buf.view(np.float32).reshape(self.block, 2)
                # H is a whole number of blocks and _end advances in
                # whole blocks, so a block never straddles the wrap.
                pos = self._end % H
                self._hist[pos: pos + self.block] = blk
                self._end += self.block
            elif r == -1:
                self._eos = True
            elif _time.monotonic() > deadline:
                raise TimeoutError(
                    f"stream stalled: no samples for {self.timeout_s}s "
                    f"(at {self._end}, need {need_end})")

    def read(self, start: int, count: int) -> np.ndarray:
        self._pump_until(start + count)
        out = np.zeros((count, 2), np.float32)
        H = len(self._hist)
        lo = max(start, self._end - H, 0)
        hi = min(start + count, self._end)
        if hi > lo:
            # The ring wraps at most once over a <=H-long window: two
            # contiguous memcpy slices instead of a per-sample modulo
            # gather (this is the hot per-superepoch feed path).
            p0 = lo % H
            n1 = min(hi - lo, H - p0)
            out[lo - start: lo - start + n1] = self._hist[p0: p0 + n1]
            if n1 < hi - lo:
                out[lo - start + n1: hi - start] = \
                    self._hist[: hi - lo - n1]
        return out

    def stats(self) -> dict:
        s = dict(self.fifo.stats())
        s["consumed_samples"] = self._end
        return s

    def __len__(self) -> int:
        return 1 << 62


def decode_samples(raw: bytes, fmt: str) -> np.ndarray:
    """Decode a raw byte buffer in a FileSource wire format to f32
    [n, 2] (whole samples only; callers keep their own byte residue)."""
    from gnsstpu import native

    if fmt == "i8_iq":
        n = len(raw) // 2
        return native.decode_i8_iq(np.frombuffer(raw, np.int8,
                                                 count=2 * n))
    if fmt == "i16_iq":
        n = len(raw) // 4
        return native.decode_i16_iq(np.frombuffer(raw, np.int16,
                                                  count=2 * n))
    if fmt == "gn3s_2bit":
        return native.decode_gn3s_2bit(np.frombuffer(raw, np.uint8))
    if fmt == "c64":
        n = len(raw) // 8
        c = np.frombuffer(raw, np.complex64, count=n)
        out = np.empty((n, 2), np.float32)
        out[:, 0], out[:, 1] = c.real, c.imag
        return out
    if fmt == "i8":
        v = np.frombuffer(raw, np.int8).astype(np.float32)
        out = np.zeros((len(v), 2), np.float32)
        out[:, 0] = v
        return out
    if fmt == "packed_4bit":
        nw = len(raw) // 2
        return native.decode_packed_4bit(
            np.frombuffer(raw, np.uint16, count=nw))
    raise ValueError(f"unknown format {fmt!r}")


def _format_bytes_per_sample(fmt: str) -> int:
    try:
        return {"i8_iq": 2, "i8": 1, "i16_iq": 4, "c64": 8,
                "gn3s_2bit": 1}[fmt]
    except KeyError:
        raise ValueError(f"unknown format {fmt!r}") from None


def _format_block_bytes(fmt: str, n_samples: int) -> int:
    """Wire bytes for n_samples in a FileSource format (packed_4bit is
    sub-byte: 4 x 4-bit samples per LE u16 word)."""
    if fmt == "packed_4bit":
        if n_samples % 4:
            raise ValueError("packed_4bit needs sample counts % 4 == 0")
        return n_samples // 2
    return n_samples * _format_bytes_per_sample(fmt)


class _NetProducerMixin:
    """Transport-independent half of the network producers: the
    byte-continuous framing loop (residue -> decode/raw blocks -> FIFO)
    and the lifecycle plumbing, shared by the UDP and TCP transports
    so framing/decode fixes cannot drift between them."""

    def start(self):
        self.thread.start()
        return self

    def stop(self) -> None:
        self._stop = True
        if self.thread.ident is None:
            # Never started: _run's finally can't release the
            # resources, so the consumer would hang to timeout and the
            # bound socket would leak.
            self.fifo.close()
            try:
                self.sock.close()
            except OSError:
                pass

    def _feed(self, residue: bytes, data: bytes) -> bytes:
        """Consume whole blocks from residue+data; returns the new
        residue. raw=True pushes wire bytes untouched (device unpack);
        else decodes to f32 blocks. Non-blocking push counts overruns
        (a live radio must never stall the receive loop)."""
        residue += data
        blk_bytes = self._blk_bytes
        while len(residue) >= blk_bytes:
            if self.raw:
                blk = np.frombuffer(residue[:blk_bytes], np.uint8)
            else:
                blk = decode_samples(
                    residue[:blk_bytes], self.fmt).astype(
                        np.float32).view(np.uint8).reshape(-1)
            residue = residue[blk_bytes:]
            if self.fifo.push(blk, timeout_ms=-1) != 1:
                self.overruns += 1
        return residue


class SocketStreamProducer(_NetProducerMixin):
    """UDP datagram receiver -> sample decode -> ring FIFO.

    Completes the GPS_Source role for a NETWORKED front end (the
    reference reads its radios over USB in a dedicated thread,
    objects/gps_source.cpp:135 Read; a modern deployment ships IF
    samples over the network instead). Datagrams carry raw wire-format
    bytes (any FileSource format); sample framing is byte-continuous
    across datagrams. Pushes 1 ms f32 blocks NON-blocking, counting
    overruns in the FIFO (a live radio must never stall the network
    receive loop — same policy as the reference's FIFO overwrite).

    Bind with port=0 for an ephemeral port; .port tells the sender
    where to aim. stop() (or a zero-length datagram) ends the stream
    and closes the FIFO.
    """

    def __init__(self, fifo, block_samples: int, fmt: str = "i8_iq",
                 host: str = "127.0.0.1", port: int = 0,
                 timeout_s: float = 10.0, raw: bool = False):
        import socket
        import threading

        self.fifo = fifo
        self.block = int(block_samples)
        self.fmt = fmt
        # raw=True: datagrams carry an ops.unpack wire format and the
        # producer pushes the BYTES untouched (PackedStreamSource serves
        # them; the device unpacks). raw=False decodes to f32 blocks.
        self.raw = raw
        if raw:
            from gnsstpu.ops import unpack as up
            self._blk_bytes = up.wire_bytes(fmt, self.block)
        else:
            self._blk_bytes = _format_block_bytes(fmt, self.block)
        self.timeout_s = timeout_s
        self._stop = False
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, port))
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self.overruns = 0
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        import socket
        import time as _time

        residue = b""
        deadline = _time.monotonic() + self.timeout_s
        try:
            while not self._stop:
                try:
                    data, _ = self.sock.recvfrom(65536)
                except socket.timeout:
                    if _time.monotonic() > deadline:
                        break
                    continue
                if not data:          # zero-length datagram = EOS
                    break
                deadline = _time.monotonic() + self.timeout_s
                residue = self._feed(residue, data)
        finally:
            self.fifo.close()
            self.sock.close()


class TcpStreamProducer(_NetProducerMixin):
    """TCP byte-stream receiver -> sample decode -> ring FIFO.

    The connection-oriented sibling of SocketStreamProducer (reference
    GPS_Source role over a network transport): listens on host:port
    (port=0 = ephemeral, .port tells the sender where to aim), accepts
    ONE sender, and streams its bytes — any FileSource wire format, or
    raw=True for ops.unpack packed formats pushed untouched (device
    unpack). Sample framing is byte-continuous; the stream ends when
    the peer closes (FIFO closed -> consumers see end-of-stream).
    """

    def __init__(self, fifo, block_samples: int, fmt: str = "i8_iq",
                 host: str = "127.0.0.1", port: int = 0,
                 timeout_s: float = 10.0, raw: bool = False):
        import socket
        import threading

        self.fifo = fifo
        self.block = int(block_samples)
        self.fmt = fmt
        self.raw = raw
        if raw:
            from gnsstpu.ops import unpack as up
            self._blk_bytes = up.wire_bytes(fmt, self.block)
        else:
            self._blk_bytes = _format_block_bytes(fmt, self.block)
        self.timeout_s = timeout_s
        self._stop = False
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(1)
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self.overruns = 0
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        import socket
        import time as _time

        conn = None
        deadline = _time.monotonic() + self.timeout_s
        try:
            while not self._stop and conn is None:
                try:
                    conn, _ = self.sock.accept()
                except socket.timeout:
                    if _time.monotonic() > deadline:
                        return
            if conn is None:
                return
            conn.settimeout(0.2)
            residue = b""
            deadline = _time.monotonic() + self.timeout_s
            while not self._stop:
                try:
                    data = conn.recv(65536)
                except socket.timeout:
                    if _time.monotonic() > deadline:
                        break
                    continue
                if not data:          # peer closed = end of stream
                    break
                deadline = _time.monotonic() + self.timeout_s
                residue = self._feed(residue, data)
        finally:
            if conn is not None:
                conn.close()
            self.fifo.close()
            self.sock.close()


class PackedStreamSource(_PackedReadMixin):
    """Live streaming source that keeps samples in WIRE FORMAT end to
    end: the producer pushes raw packed bytes (1-4 bit formats,
    ops.unpack) into the ring FIFO, the history window stores bytes, and
    the pipelined ChannelManager ships them to the device untouched
    (device-side unpack). The f32 read() path decodes on demand for
    host-side consumers (acquisition refinement).

    This composes the two halves of the live design: the FIFO fabric
    (reference objects/fifo.cpp) and the packed host->device wire — a
    2-bit radio's bytes cross the host exactly once.
    """

    def __init__(self, fifo, block_samples: int, fmt: str = "sm2",
                 history_blocks: int = 1024, timeout_s: float = 10.0):
        from gnsstpu.ops import unpack as up

        self.fifo = fifo
        self.wire_format = fmt
        self._fmt = fmt
        self.block = int(block_samples)
        if self.block % up.align(fmt):
            raise ValueError(f"block_samples must align to {fmt}")
        self._bpb = up.wire_bytes(fmt, self.block)   # bytes per block
        self._spb = up.samples_per_byte(fmt)
        self.hist_blocks = int(history_blocks)
        self.timeout_s = timeout_s
        self._hist = np.zeros(self.hist_blocks * self._bpb, np.uint8)
        self._end = 0            # absolute SAMPLES consumed from the FIFO
        self._eos = False
        self._restart_factory = None
        self.restarts = 0

    set_restart = StreamSource.set_restart
    can_restart = StreamSource.can_restart
    restart = StreamSource.restart
    position = StreamSource.position

    def _pump_until(self, need_end_samples: int) -> None:
        import time as _time

        deadline = _time.monotonic() + self.timeout_s
        H = len(self._hist)
        while self._end < need_end_samples and not self._eos:
            r, buf = self.fifo.pop(timeout_ms=200)
            if r == 1:
                deadline = _time.monotonic() + self.timeout_s
                # H is a whole number of byte-blocks and _end advances
                # in whole blocks: a block never straddles the wrap.
                pos = int(self._end / self._spb) % H
                self._hist[pos: pos + self._bpb] = buf
                self._end += self.block
            elif r == -1:
                self._eos = True
            elif _time.monotonic() > deadline:
                raise TimeoutError(
                    f"stream stalled: no samples for {self.timeout_s}s "
                    f"(at {self._end}, need {need_end_samples})")

    def read_packed(self, start: int, count: int) -> np.ndarray:
        from gnsstpu.ops import unpack as up

        a = up.align(self._fmt)
        if start % a or count % a:
            raise ValueError(f"unaligned packed read ({start}, {count})")
        self._pump_until(start + count)
        H = len(self._hist)
        out = np.zeros(int(count / self._spb), np.uint8)
        lo = max(start, self._end - int(H * self._spb), 0)
        hi = min(start + count, self._end)
        if hi > lo:
            b0 = int(lo / self._spb)
            b1 = int(hi / self._spb)
            o0 = b0 - int(start / self._spb)
            p0 = b0 % H
            n1 = min(b1 - b0, H - p0)
            out[o0: o0 + n1] = self._hist[p0: p0 + n1]
            if n1 < b1 - b0:
                out[o0 + n1: o0 + (b1 - b0)] = \
                    self._hist[: b1 - b0 - n1]
        return out


    def ended_at(self, pos: int) -> bool:
        """True once the producer closed the FIFO and `pos` is past the
        last produced sample (packed bytes have no zero-fill sentinel)."""
        return self._eos and pos >= self._end

    def stats(self) -> dict:
        s = dict(self.fifo.stats())
        s["consumed_samples"] = self._end
        return s

    def __len__(self) -> int:
        return 1 << 62


class FileStreamProducer:
    """Producer thread: file/pipe reader + sample-format decode feeding a
    RingFifo with 1 ms f32 blocks (the GPS_Source read thread,
    objects/gps_source.cpp:135; decode via the native codec library).

    realtime_fs throttles production to the given sample rate (a live
    radio's pace) — 0 streams as fast as the file reads.

    fs_in/fs_out arm decimate-on-ingest (the reference's
    Resample_USRP_V1 role, objects/gps_source.cpp:436,566: the radio
    delivers 8.1838/16 Msps, the receiver runs at 2.048 Msps): the
    producer thread polyphase-resamples each block to the receiver
    rate before pushing, so the FIFO and everything downstream see
    fs_out samples.
    """

    def __init__(self, path: str, fifo, block_samples: int,
                 fmt: str = "i8_iq", realtime_fs: float = 0.0,
                 skip_samples: int = 0, fs_in: float = 0.0,
                 fs_out: float = 0.0, resample_mode: str = "polyphase"):
        import threading

        self.src = FileSource(path, fmt=fmt, skip_samples=skip_samples)
        if fs_in and fs_out and fs_in != fs_out:
            from gnsstpu.ops.resample import ResampledSource
            self.src = ResampledSource(self.src, fs_in, fs_out,
                                       mode=resample_mode)
        self.fifo = fifo
        self.block = int(block_samples)
        self.realtime_fs = realtime_fs
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> "FileStreamProducer":
        self.thread.start()
        return self

    def stop(self) -> None:
        self._stop = True
        if self.thread.ident is None:
            self.fifo.close()      # never started: close here

    def _run(self) -> None:
        import time as _time

        pos = 0
        n = len(self.src)
        t0 = _time.monotonic()
        while not self._stop and pos < n:
            blk = self.src.read(pos, self.block)
            # Blocking push, retried for as long as it takes: offline
            # file replay is LOSSLESS — a consumer stall longer than
            # one push timeout (first-superepoch compile, a long PVT
            # solve) must NOT silently truncate the stream. stop()
            # still interrupts between attempts. A live radio uses the
            # non-blocking push + overrun counting instead (the
            # network producers).
            wire = (blk.astype(np.float32).view(np.uint8).reshape(-1))
            pushed = False
            while not self._stop:
                rc = self.fifo.push(wire, timeout_ms=1000)
                if rc == 1:
                    pushed = True
                    break
                if rc == -1:
                    # FIFO closed by the consumer/teardown: permanent —
                    # push returns -1 WITHOUT waiting, so retrying here
                    # would busy-spin the daemon thread. Only 0
                    # (timeout, consumer merely slow) is retried.
                    break
            if not pushed:
                break
            pos += self.block
            if self.realtime_fs > 0:
                target = t0 + pos / self.realtime_fs
                dt = target - _time.monotonic()
                if dt > 0:
                    _time.sleep(dt)
        self.fifo.close()
