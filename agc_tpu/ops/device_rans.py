"""Device (XLA) implementation of the lane-interleaved rANS coder.

Byte-exact with the host spec in ``core/entropy.py`` — same state
machine, same lane interleave, same blob assembly. The device runs the
per-symbol lockstep loop over all lanes as one ``lax.scan``:

- **encode**: scans the (steps, L) symbol grid in reverse. Each step
  emits at most 2 renorm bytes per lane, returned as scan outputs
  ``(bytes[steps, L, 2], counts[steps, L])`` — the kernel performs NO
  scatters; the ragged per-lane streams are packed (and reversed into
  decode order) by the caller with two numpy masks. Table lookups are
  ``take`` into the 256-entry frequency/cumulative tables (VMEM-resident
  on TPU).
- **decode**: scans forward; the symbol is recovered gather-free as
  ``sum(cum <= slot)`` (a (L,256) compare + row reduce, VPU-friendly);
  the only data-dependent access is the per-lane byte-stream cursor
  (``take_along_axis`` on the (L, max_len) byte matrix).

All state arithmetic is uint32 (x in [2^23, 2^31), products bounded by
2^31), so nothing needs the emulated 64-bit path on TPU.

The frequency table is always quantized on the HOST
(entropy.quantize_freqs): it is 256 integers and its construction is
branchy; both implementations consume the identical table, which is what
makes their bitstreams byte-equal.
"""

from __future__ import annotations

import numpy as np

from ..core import entropy as E


def _jx():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _bucket(v: int) -> int:
    """Pow2 bucket for jit-cache keys: steps/max_len are data-dependent,
    so unbucketed shapes would recompile per part length (a cold TPU
    compile costs minutes vs ~ms of kernel time) — same convention as
    ops/kmers.py's pow2 padding."""
    return max(8, 1 << max(0, int(v - 1)).bit_length())


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


@__import__("functools").lru_cache(maxsize=64)
def _encode_fn(steps: int, L: int):
    jax, jnp = _jx()

    def body(grid_rev, freqs, cum):
        def step(carry, sym_row):
            x = carry
            active = sym_row < 256  # padded grid slots carry 256
            s = jnp.where(active, sym_row, 0).astype(jnp.int32)
            f = jnp.where(active, jnp.take(freqs, s), jnp.uint32(1))
            c = jnp.take(cum, s)
            x_max = jnp.uint32((E.RANS_L >> E.PROB_BITS) << 8) * f
            b = jnp.zeros((L, 2), dtype=jnp.uint8)
            cnt = jnp.zeros((L,), dtype=jnp.int32)
            for i in range(2):  # encode renorm emits at most 2 bytes
                emit = active & (x >= x_max)
                b = b.at[:, i].set(
                    jnp.where(emit, (x & 0xFF).astype(jnp.uint8), 0)
                )
                cnt = cnt + emit.astype(jnp.int32)
                x = jnp.where(emit, x >> 8, x)
            nx = ((x // f) << E.PROB_BITS) + (x % f) + c
            x = jnp.where(active, nx, x)
            return x, (b, cnt)

        x0 = jnp.full((L,), E.RANS_L, dtype=jnp.uint32)
        x, (bts, cnts) = jax.lax.scan(step, x0, grid_rev)
        return x, bts, cnts

    return jax.jit(body)


def compress_device(data: bytes, level: int = 0) -> bytes:
    """Device-path twin of entropy.compress (identical blobs)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    header = bytearray([E.MAGIC, 0])
    E._put_varint(header, n)
    if n == 0:
        return bytes(header)

    counts = np.bincount(arr, minlength=256)
    freqs = E.quantize_freqs(counts)
    F, C = E._tables(freqs)

    L = E.lanes_for(n)
    steps = _bucket((n + L - 1) // L)  # padded rows are inactive slots
    grid = np.full(steps * L, 256, dtype=np.int32)  # 256 = padded slot
    grid[:n] = arr
    grid = grid.reshape(steps, L)[::-1]  # reversed for the encode scan

    fn = _encode_fn(steps, L)
    x, bts, cnts = fn(
        np.ascontiguousarray(grid),
        F.astype(np.uint32),
        C[:256].astype(np.uint32),
    )
    x = np.asarray(x)
    bts = np.asarray(bts)  # (steps, L, 2) in reversed-step order
    cnts = np.asarray(cnts)

    # ragged pack: per lane, bytes in emission order then reversed.
    # the scan ran t = steps-1 .. 0, so scan-order IS emission order.
    streams = []
    for j in range(L):
        cj = cnts[:, j]
        bj = bts[:, j, :]
        mask = np.arange(2)[None, :] < cj[:, None]
        streams.append(bj[mask][::-1].tobytes())
    return E.assemble_blob(data, freqs, streams, x)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@__import__("functools").lru_cache(maxsize=64)
def _decode_fn(steps: int, L: int, max_len: int):
    jax, jnp = _jx()

    def body(mat, states, active_grid, freqs, cum):
        # cum: (257,) u32; symbol via gather-free rank: sum(cum[1:] <= slot)
        cum_in = cum[1:257][None, :]  # (1, 256)

        def step(carry, active):
            x, cur = carry
            slot = x & jnp.uint32(E.PROB_SCALE - 1)
            s = jnp.sum(
                (cum_in <= slot[:, None]).astype(jnp.int32), axis=1
            )
            f = jnp.take(freqs, s)
            c = jnp.take(cum, s)
            nx = f * (x >> E.PROB_BITS) + slot - c
            x = jnp.where(active, nx, x)
            for _ in range(2):  # decode renorm reads at most 2 bytes
                need = active & (x < jnp.uint32(E.RANS_L))
                byte = jnp.take_along_axis(
                    mat, jnp.minimum(cur, max_len)[:, None], axis=1
                )[:, 0].astype(jnp.uint32)
                x = jnp.where(need, (x << 8) | byte, x)
                cur = cur + need.astype(jnp.int32)
            return (x, cur), s.astype(jnp.uint8)

        cur0 = jnp.zeros((L,), dtype=jnp.int32)
        (_, _), syms = jax.lax.scan(step, (states, cur0), active_grid)
        return syms  # (steps, L)

    return jax.jit(body)


def decompress_device(blob, expected_size: int | None = None) -> bytes:
    """Device-path twin of entropy.decompress."""
    n, flags, freqs, lane_lens, states, pos = E.parse_header(blob)
    if n == 0:
        return b""
    # same hostile-size policy as entropy.decompress/decompress_np: a
    # size header disagreeing with part metadata, or an absurd size, is
    # corruption - never a work-array allocation
    if (expected_size is not None and expected_size and n != expected_size) or (
        n > (64 << 30)
    ):
        raise ValueError("corrupt rANS blob")
    buf = memoryview(blob)
    if flags & E._RAW_FLAG:
        raw = bytes(buf[pos : pos + n])
        if len(raw) != n:  # truncated raw-escape payload
            raise ValueError("corrupt rANS blob")
        return raw

    L = E.lanes_for(n)
    steps = _bucket((n + L - 1) // L)  # rows past n are inactive
    offs = np.zeros(L + 1, dtype=np.int64)
    np.cumsum(lane_lens, out=offs[1:])
    flat = np.frombuffer(
        buf, dtype=np.uint8, count=int(offs[-1]), offset=pos
    )
    max_len = _bucket(int(lane_lens.max()) if L else 0)
    mat = np.zeros((L, max_len + 1), dtype=np.uint8)
    for j in range(L):
        mat[j, : lane_lens[j]] = flat[offs[j] : offs[j + 1]]

    F, C = E._tables(freqs)
    active = np.arange(steps * L).reshape(steps, L) < n
    fn = _decode_fn(steps, L, max_len)
    syms = np.asarray(
        fn(
            mat,
            states.astype(np.uint32),
            active,
            F.astype(np.uint32),
            C.astype(np.uint32),
        )
    )
    res = syms.reshape(steps * L)[:n].tobytes()
    if expected_size is not None and expected_size and len(res) != expected_size:
        raise ValueError("rANS blob size mismatch")
    return res
