"""TPU-native entropy stage: lane-interleaved order-0 rANS.

The reference pins every compressed part to zstd (segment.h:252-254,
collection_v3.cpp:163/192/246) because that is the fast general coder on
a CPU. The TPU-native archive profile ("tpu-rans") replaces that stage
with a coder whose hot loop is built from the operations a TPU is good
at: hundreds of independent rANS lanes advance in lockstep, one symbol
per lane per step, with all table lookups expressible as compare+reduce
or tiny one-hot contractions (no data-dependent gathers except the
per-lane byte-stream cursor). This module holds

- the BITSTREAM definition (shared, byte-exact, between the host and
  device implementations),
- the host (numpy) implementation, vectorized across lanes — the
  fallback when no accelerator is attached, and the spec the device
  kernel (ops/device_rans.py) is tested against byte-for-byte.

Coder parameters: 32-bit state per lane, 8-bit renormalization,
PROB_BITS=12 quantized frequencies, RANS_L=2^23. State invariants keep
x in [2^23, 2^31): the encode renorm emits at most 2 bytes per symbol
and the decode renorm reads at most 2 (bounded unrolls on device).
Symbols are interleaved across lanes (position p belongs to lane
p % n_lanes), so lane lengths differ by at most one and the (t, lane)
active mask is a pure function of (n, n_lanes) — no per-lane metadata.

Blob layout (little-endian, LEB128 varints):

    magic 0xA9 | flags u8 | varint n
    [flags bit7 set -> raw payload follows, nothing else]
    256 varints: quantized symbol frequencies (sum = 4096)
    n_lanes varints: per-lane byte-stream lengths
    n_lanes u32: final encoder states
    concatenated per-lane byte streams (decode order)

flags bits 0-3: log2(n_lanes). bit 7: raw escape (rANS would expand).
"""

from __future__ import annotations

import numpy as np

MAGIC = 0xA9
PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 23
_RAW_FLAG = 0x80

# lane-count policy: pure function of n so decode derives nothing from it
# (it is still recorded in flags for forward compatibility)
_LANE_TIERS = ((1 << 16, 1024), (1 << 13, 256), (1 << 10, 64), (64, 8))


def lanes_for(n: int) -> int:
    for lo, lanes in _LANE_TIERS:
        if n >= lo:
            return lanes
    return 1


# ---------------------------------------------------------------------------
# varints (LEB128; local to the blob format)
# ---------------------------------------------------------------------------


def _put_varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _get_varint(buf, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not (b & 0x80):
            return v, pos
        shift += 7


# ---------------------------------------------------------------------------
# frequency quantization (host-side for BOTH implementations: the table is
# tiny and integer-deterministic, so device kernels take it as an input)
# ---------------------------------------------------------------------------


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """256 symbol counts -> quantized frequencies summing to PROB_SCALE,
    every present symbol >= 1. Integer arithmetic only; ties break toward
    the lower symbol, so the table is a pure function of the counts."""
    counts = counts.astype(np.uint64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(256, dtype=np.uint32)
    q = (counts * PROB_SCALE // total).astype(np.int64)
    rem = (counts * PROB_SCALE % total).astype(np.int64)
    q[(counts > 0) & (q == 0)] = 1
    diff = PROB_SCALE - int(q.sum())
    if diff > 0:
        # give +1 to the largest remainders (present symbols only)
        order = np.lexsort((np.arange(256), -rem))
        order = order[counts[order] > 0]
        for i in range(diff):
            q[order[i % len(order)]] += 1
    elif diff < 0:
        # take -1 from the smallest remainders with q > 1, repeatedly
        order = np.lexsort((np.arange(256), rem))
        while diff < 0:
            for s in order:
                if q[s] > 1:
                    q[s] -= 1
                    diff += 1
                    if diff == 0:
                        break
    return q.astype(np.uint32)


def _tables(freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cum = np.zeros(257, dtype=np.uint32)
    np.cumsum(freqs, out=cum[1:])
    return freqs.astype(np.uint32), cum


# ---------------------------------------------------------------------------
# host encode
# ---------------------------------------------------------------------------


def compress(data: bytes, level: int = 0) -> bytes:
    """Compress ``data`` into one rANS blob. ``level`` is accepted for
    zstd-signature compatibility and ignored (rANS has no level).
    Dispatches to the native (C++) coder when available — all
    implementations (numpy / C++ / device) emit byte-identical blobs."""
    lib = _native()
    if lib is not None:
        import ctypes

        n = len(data)
        cap = n + 4096
        out = np.empty(cap, dtype=np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        buf = np.frombuffer(bytes(data), dtype=np.uint8) if n else np.empty(
            0, dtype=np.uint8
        )
        m = lib.rans_compress(
            buf.ctypes.data_as(u8p), n, out.ctypes.data_as(u8p), cap
        )
        if m < 0:
            out = np.empty(-m, dtype=np.uint8)
            m = lib.rans_compress(
                buf.ctypes.data_as(u8p), n, out.ctypes.data_as(u8p), -m
            )
        return out[:m].tobytes()
    return compress_np(data, level)


def compress_np(data: bytes, level: int = 0) -> bytes:
    """Pure-numpy reference implementation (the bitstream spec)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    header = bytearray([MAGIC, 0])
    _put_varint(header, n)
    if n == 0:
        return bytes(header)

    counts = np.bincount(arr, minlength=256)
    freqs = quantize_freqs(counts)
    streams, states = _encode_lanes(arr, freqs)
    return assemble_blob(data, freqs, streams, states)


def assemble_blob(
    data: bytes, freqs: np.ndarray, streams: list[bytes], states
) -> bytes:
    """Shared blob assembly (header + tables + lane streams + raw-escape
    decision) for the numpy and device encoders — one place owns the
    format so the byte-identical-blobs invariant cannot drift."""
    n = len(data)
    L = lanes_for(n)
    out = bytearray([MAGIC, int(L.bit_length() - 1)])
    _put_varint(out, n)
    for f in freqs:
        _put_varint(out, int(f))
    for s in streams:
        _put_varint(out, len(s))
    for x in states:
        out += int(x).to_bytes(4, "little")
    for s in streams:
        out += s
    if len(out) >= n + 2 + _varint_len(n):
        raw = bytearray([MAGIC, _RAW_FLAG])
        _put_varint(raw, n)
        raw += data
        return bytes(raw)
    return bytes(out)


def _varint_len(v: int) -> int:
    n = 1
    while v >= 0x80:
        v >>= 7
        n += 1
    return n


def _encode_lanes(arr: np.ndarray, freqs: np.ndarray):
    """Vectorized across lanes; returns (per-lane byte streams in decode
    order, per-lane final states)."""
    n = len(arr)
    L = lanes_for(n)
    steps = (n + L - 1) // L
    F, C = _tables(freqs)
    lane = np.arange(L)

    # emission buffers: worst case ~1.5 B/symbol + slack
    cap = 2 * steps + 8
    buf = np.empty((L, cap), dtype=np.uint8)
    cur = np.zeros(L, dtype=np.int64)
    x = np.full(L, RANS_L, dtype=np.uint64)

    sym_f = F.astype(np.uint64)
    sym_c = C.astype(np.uint64)
    xmax_base = np.uint64((RANS_L >> PROB_BITS) << 8)

    padded = np.zeros(steps * L, dtype=np.uint8)
    padded[:n] = arr
    grid = padded.reshape(steps, L)

    for t in range(steps - 1, -1, -1):
        active = (t * L + lane) < n
        s = grid[t]
        # padded lanes may carry an absent symbol (f=0): neutralize them
        f = np.where(active, sym_f[s], np.uint64(1))
        c = sym_c[s]
        x_max = xmax_base * f
        for _ in range(2):  # encode renorm emits at most 2 bytes
            emit = active & (x >= x_max)
            if emit.any():
                idx = np.flatnonzero(emit)
                buf[idx, cur[idx]] = (x[idx] & np.uint64(0xFF)).astype(
                    np.uint8
                )
                cur[idx] += 1
                x[idx] >>= np.uint64(8)
            else:
                break
        nx = ((x // f) << np.uint64(PROB_BITS)) + (x % f) + c
        x = np.where(active, nx, x)

    streams = [buf[j, : cur[j]][::-1].tobytes() for j in range(L)]
    return streams, x.astype(np.uint32)


# ---------------------------------------------------------------------------
# host decode
# ---------------------------------------------------------------------------


def parse_header(blob) -> tuple:
    """-> (n, flags, freqs|None, lane_lens|None, states|None, payload_off).
    For raw-escape blobs freqs is None and payload_off points at the raw
    bytes."""
    buf = memoryview(blob)
    if len(buf) < 2 or buf[0] != MAGIC:
        raise ValueError("not an agc-tpu rANS blob")
    flags = buf[1]
    n, pos = _get_varint(buf, 2)
    if n == 0:
        return n, flags, None, None, None, pos
    if flags & _RAW_FLAG:
        return n, flags, None, None, None, pos
    freqs = np.empty(256, dtype=np.uint32)
    for i in range(256):
        freqs[i], pos = _get_varint(buf, pos)
    L = lanes_for(n)
    lane_lens = np.empty(L, dtype=np.int64)
    for j in range(L):
        lane_lens[j], pos = _get_varint(buf, pos)
    states = np.frombuffer(buf, dtype="<u4", count=L, offset=pos).astype(
        np.uint64
    )
    pos += 4 * L
    return n, flags, freqs, lane_lens, states, pos


def decompress(blob, expected_size: int | None = None) -> bytes:
    """Decode one rANS blob (trailing bytes beyond the blob are ignored,
    mirroring zstd_decompress_tolerant's contract). Dispatches to the
    native (C++) decoder when available."""
    lib = _native()
    if lib is not None:
        import ctypes

        u8p = ctypes.POINTER(ctypes.c_uint8)
        raw = np.frombuffer(bytes(blob), dtype=np.uint8)
        cap = expected_size if expected_size else max(64, 4 * len(raw))
        while True:
            out = np.empty(cap, dtype=np.uint8)
            m = lib.rans_decompress(
                raw.ctypes.data_as(u8p), len(raw),
                out.ctypes.data_as(u8p), cap,
            )
            if m == -(1 << 63):  # INT64_MIN: corrupt blob
                raise ValueError("corrupt rANS blob")
            if m < 0:
                if expected_size and -m != expected_size:
                    # size header disagrees with the part metadata
                    raise ValueError("corrupt rANS blob")
                if -m > (64 << 30):  # damaged header, not a real size
                    raise ValueError("corrupt rANS blob")
                cap = -m
                continue
            if expected_size is not None and expected_size and m != expected_size:
                raise ValueError("rANS blob size mismatch")
            return out[:m].tobytes()
    try:
        return decompress_np(blob, expected_size)
    except ValueError:
        raise
    except Exception as e:  # hostile blobs: truncated varints, bad freqs
        raise ValueError("corrupt rANS blob") from e


def _native():
    from ..native import get_lib

    lib = get_lib()
    return lib if lib is not None and hasattr(lib, "rans_compress") else None


def decompress_np(blob, expected_size: int | None = None) -> bytes:
    """Pure-numpy reference decoder (the bitstream spec)."""
    n, flags, freqs, lane_lens, states, pos = parse_header(blob)
    if n == 0:
        return b""
    # same hostile-size policy as the native wrapper above: a size header
    # disagreeing with part metadata, or an absurd size, is corruption —
    # never an allocation attempt
    if (expected_size is not None and expected_size and n != expected_size) or (
        n > (64 << 30)
    ):
        raise ValueError("corrupt rANS blob")
    buf = memoryview(blob)
    if flags & _RAW_FLAG:
        return bytes(buf[pos : pos + n])

    L = lanes_for(n)
    steps = (n + L - 1) // L
    offs = np.zeros(L + 1, dtype=np.int64)
    np.cumsum(lane_lens, out=offs[1:])
    total_bytes = int(offs[-1])
    flat = np.frombuffer(buf, dtype=np.uint8, count=total_bytes, offset=pos)

    # row-major per-lane byte matrix (padded); cursor = per-lane index
    max_len = int(lane_lens.max()) if L else 0
    mat = np.zeros((L, max_len + 2), dtype=np.uint8)
    for j in range(L):
        mat[j, : lane_lens[j]] = flat[offs[j] : offs[j + 1]]

    F, C = _tables(freqs)
    cum = C[:257].astype(np.uint64)
    sym_f = F.astype(np.uint64)
    lane = np.arange(L)
    x = states.copy()
    cur = np.zeros(L, dtype=np.int64)
    out = np.zeros(steps * L, dtype=np.uint8)
    mask = np.uint64(PROB_SCALE - 1)

    for t in range(steps):
        active = (t * L + lane) < n
        slot = x & mask
        s = (np.searchsorted(cum, slot, side="right") - 1).astype(np.int64)
        out[t * L : (t + 1) * L] = s
        f = sym_f[s]
        c = cum[s]
        nx = f * (x >> np.uint64(PROB_BITS)) + slot - c
        x = np.where(active, nx, x)
        for _ in range(2):  # decode renorm reads at most 2 bytes
            need = active & (x < np.uint64(RANS_L))
            if need.any():
                idx = np.flatnonzero(need)
                x[idx] = (x[idx] << np.uint64(8)) | mat[
                    idx, cur[idx]
                ].astype(np.uint64)
                cur[idx] += 1
            else:
                break

    res = out[:n].tobytes()
    if expected_size is not None and expected_size and len(res) != expected_size:
        raise ValueError("rANS blob size mismatch")
    return res


def is_rans_blob(data) -> bool:
    return len(data) >= 2 and data[0] == MAGIC


# ---------------------------------------------------------------------------
# batched part compression (the production device dispatch)
# ---------------------------------------------------------------------------


def _device_batch_enabled(total_bytes: int) -> bool:
    """Route a part batch to the device encoder? Blobs are byte-identical
    either way, so this is purely a perf decision — and the measurement
    is one-sided on current hardware: the native host coder does a
    realistic 4.9 MB part mix (282 tuples-packed refs + delta packs) in
    0.05 s, while the batched device encoder takes 7.7 s through a
    remote-tunneled v5e (per-(lane-tier, steps-bucket) dispatches at
    ~25 ms RTT each, plus the 2-bytes-per-symbol emission download at
    ~50 MB/s down). Even perfectly coalesced, the downloads alone
    exceed the host coder's total time. auto therefore means HOST;
    AGC_TPU_RANS_DEVICE=1 forces the device leg (byte-identity and
    scaling tests, PCIe-attached parts-fleet deployments where the
    link economics flip)."""
    import os

    force = os.environ.get("AGC_TPU_RANS_DEVICE")
    if force is not None:
        return force not in ("0", "")
    return False


def compress_parts(payloads: list[bytes]) -> list[bytes]:
    """Compress many parts at once: one batched device dispatch when it
    pays (see _device_batch_enabled), else the host coder per part."""
    if _device_batch_enabled(sum(len(p) for p in payloads)):
        from ..ops.device_rans import encode_batch

        return encode_batch(payloads)
    return [compress(p) for p in payloads]


class EntropyBatcher:
    """Deferred-part sink for the tpu-rans profile: SegmentWriters queue
    (stream, payload, marker, original) tuples instead of compressing
    inline; flush() entropy-codes the whole queue in batched device
    dispatches and lands the parts on the archive writer in queue order
    (streams only ever receive parts from one producer, so per-stream
    part order is preserved). The raw-escape decision (store the original
    when compression does not pay; reference segment.h:218-255) happens
    here, after compressed sizes are known."""

    def __init__(self, writer):
        import threading

        self._writer = writer
        self._q: list[tuple[str, bytes, int, bytes]] = []
        self._lock = threading.Lock()

    def defer(self, stream: str, payload: bytes, marker: int, original: bytes) -> None:
        with self._lock:
            self._q.append((stream, payload, marker, original))

    def pending(self) -> int:
        with self._lock:
            return len(self._q)

    def flush(self) -> None:
        with self._lock:
            q, self._q = self._q, []
        if not q:
            return
        blobs = compress_parts([payload for (_, payload, _, _) in q])
        for (stream, _, marker, original), blob in zip(q, blobs):
            z = blob + bytes([marker])
            if len(z) < len(original):
                self._writer.add_part_buffered(stream, z, len(original))
            else:
                self._writer.add_part_buffered(stream, original, 0)
