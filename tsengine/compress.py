"""Gorilla XOR value compression + delta-of-delta timestamp compression
(BASELINE.json north_rule), implemented from the public Gorilla paper
(Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database", VLDB 2015, §4.1-4.2) as pandas/Arrow kernels driven by
``applyInPandas`` over per-series sorted batches — Spark sees one vectorized
UDF per block, never per-row Python.

Timestamp encoding (§4.1): store first_ts in the block header; every
subsequent point as a delta-of-delta D with the paper's variable codes,
extended with a 64-bit escape for arbitrary gaps.  The previous delta is
implicitly 0 at block start, so the FIRST delta is just the first D through
the same coder — no fixed-width header field, meaning a 60 s grid costs 9
bits (not 32) for its first step and a multi-century gap still roundtrips
exactly via the escape (the paper's 14-bit aligned first delta assumes
block-aligned wall-clock windows this engine doesn't impose):

    D == 0                  -> '0'
    -63 <= D <= 64          -> '10'   + 7 bits (value stored as D + 63)
    -255 <= D <= 256        -> '110'  + 9 bits (D + 255)
    -2047 <= D <= 2048      -> '1110' + 12 bits (D + 2047)
    else                    -> '1111' + 64 bits (two's complement)

Value encoding (§4.2): first value raw in the header; each next value XORed
with the previous:

    xor == 0                          -> '0'
    leading/meaningful window reusable -> '10' + meaningful bits
    else                              -> '11' + 6b leading + 6b length
                                              + meaningful bits

Bit packing is numpy-vectorized: per-element (code, bitlength) pairs are
computed columnwise, then scattered into one bit array with cumsum offsets —
no per-element Python in the hot loop for encode.  Decode is inherently
sequential (variable-length prefix codes) and runs as a tight per-block
loop inside the same Arrow batch.
"""

from __future__ import annotations

import numpy as np

# Persisted block wire-format version.  v1 (round 1) stored the first
# timestamp delta in a fixed 32-bit header field; v2 routes it through the
# DoD bucket coder (module docstring).  The layouts are NOT cross-decodable,
# so every block row carries ``fmt`` and the decoder rejects unknown
# versions instead of decoding silently wrong.
BLOCK_FORMAT_VERSION = 2


# ------------------------------------------------------------------ bit helpers
def _pack_codes(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Scatter (code, bitlength<=64) pairs into a packed big-endian bitstream.

    Byte-splice strategy: each code is positioned inside a 9-byte window
    starting at its start byte (64 bits + up to 7 bits of misalignment spans
    at most 9 bytes), split into 9 per-column byte planes, and accumulated
    with ``np.bincount``.  Bits of distinct codes never overlap, so within a
    byte the contributions are disjoint and OR == ADD — bincount (a fast C
    histogram) is a valid bitwise-OR scatter.  Memory traffic is a few tens
    of bytes per code instead of ~50 bytes per BIT for the previous
    repeat/arange explosion — the difference between a memory-bandwidth-bound
    kernel (stops scaling past ~8 workers on one socket) and a compute-bound
    one.
    """
    total = int(lengths.sum())
    if total == 0:
        return b""
    nbytes = (total + 7) // 8
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    bytestart = (starts >> 3).astype(np.int64)
    bitoff = (starts & 7).astype(np.int64)
    # shift of the code's LSB inside the 72-bit window anchored at bytestart
    sh = 72 - bitoff - lengths  # in [1, 71]
    codes = codes.astype(np.uint64)
    ge8 = sh >= 8
    sh_hi = np.where(ge8, sh - 8, 0).astype(np.uint64)     # code << (sh-8)
    sh_lo = np.where(ge8, 0, 8 - sh).astype(np.uint64)     # code >> (8-sh)
    hi64 = np.where(ge8, codes << sh_hi, codes >> sh_lo)   # top 8 window bytes
    # mask the shift into [0,63]: np.where evaluates BOTH branches, and a
    # uint64 shift by >=64 (sh reaches 71 on ge8 lanes) is platform-defined
    lob = np.where(ge8, np.uint64(0), codes << (sh.astype(np.uint64) & np.uint64(63)))
    lob = (lob & np.uint64(0xFF)).astype(np.uint8)          # 9th window byte

    # 9 byte planes: big-endian bytes of hi64, then lob; one bincount scatter
    planes = np.concatenate(
        [hi64.reshape(-1, 1).view(np.uint8)[:, ::-1], lob.reshape(-1, 1)], axis=1
    )  # (n, 9)
    idx = bytestart.reshape(-1, 1) + np.arange(9, dtype=np.int64)
    flat_v = planes.reshape(-1)
    nz = flat_v != 0
    buf = np.bincount(
        idx.reshape(-1)[nz], weights=flat_v[nz].astype(np.float64),
        minlength=nbytes + 9,
    )
    return buf[:nbytes].astype(np.uint8).tobytes()


class _BitReader:
    """Accumulator-based reader: O(1) small-int ops per take()."""

    __slots__ = ("data", "acc", "nbits", "bytepos")

    def __init__(self, data: bytes):
        self.data = data
        self.acc = 0
        self.nbits = 0
        self.bytepos = 0

    def take(self, n: int) -> int:
        acc, nbits, pos, d = self.acc, self.nbits, self.bytepos, self.data
        while nbits < n:
            acc = (acc << 8) | d[pos]
            pos += 1
            nbits += 8
        nbits -= n
        v = acc >> nbits
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits
        self.bytepos = pos
        return v


# ------------------------------------------------------------------ timestamps
_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 epochs (sorted).  Excludes the header
    (first_ts, n) which the caller stores in the block struct."""
    ts = np.asarray(ts, dtype=np.int64)
    if len(ts) <= 1:
        return b""
    deltas = np.diff(ts)
    # implicit previous delta 0 at block start: the first delta is encoded
    # through the same bucket coder as every later delta-of-delta
    dod = np.concatenate(([deltas[0]], np.diff(deltas)))  # len n-1

    codes_list = []
    lens_list = []

    if len(dod):
        zero = dod == 0
        b7 = (~zero) & (dod >= -63) & (dod <= 64)
        b9 = (~zero) & (~b7) & (dod >= -255) & (dod <= 256)
        b12 = (~zero) & (~b7) & (~b9) & (dod >= -2047) & (dod <= 2048)
        b64 = ~(zero | b7 | b9 | b12)

        codes = np.zeros(len(dod), dtype=_U64)
        lens = np.zeros(len(dod), dtype=np.int64)
        codes[zero] = 0
        lens[zero] = 1
        codes[b7] = (_U64(0b10) << _U64(7)) | (dod[b7] + 63).astype(_U64)
        lens[b7] = 9
        codes[b9] = (_U64(0b110) << _U64(9)) | (dod[b9] + 255).astype(_U64)
        lens[b9] = 12
        codes[b12] = (_U64(0b1110) << _U64(12)) | (dod[b12] + 2047).astype(_U64)
        lens[b12] = 16
        # 64-bit escape needs 68 bits > 64: emit as two codes (prefix, payload)
        if b64.any():
            # interleave: build combined arrays with extra entries
            idx = np.where(b64)[0]
            codes[b64] = _U64(0b1111)
            lens[b64] = 4
            payload = dod[b64].astype(np.int64).view(np.uint64)
            # splice payload codes right after their prefixes
            order = np.argsort(
                np.concatenate([np.arange(len(dod)) * 2, idx * 2 + 1]), kind="stable"
            )
            codes = np.concatenate([codes, payload])[order]
            lens = np.concatenate([lens, np.full(len(idx), 64, dtype=np.int64)])[order]
        codes_list.append(codes)
        lens_list.append(lens)

    return _pack_codes(np.concatenate(codes_list), np.concatenate(lens_list))


def decode_timestamps(data: bytes, first_ts: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    out[0] = first_ts
    if n == 1:
        return out
    r = _BitReader(data)
    delta = 0  # implicit previous delta at block start
    for i in range(1, n):
        if r.take(1) == 0:
            dod = 0
        elif r.take(1) == 0:
            dod = r.take(7) - 63
        elif r.take(1) == 0:
            dod = r.take(9) - 255
        elif r.take(1) == 0:
            dod = r.take(12) - 2047
        else:
            dod = r.take(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ------------------------------------------------------------------ values
def encode_values(vals: np.ndarray) -> bytes:
    """Gorilla XOR-encode float64 values (first value in the header).

    Fully VECTORIZED encoder: each non-zero xor is emitted as the paper's
    '11' form — a 14-bit header ('11' + 6b leading + 6b length) plus an
    mbits payload — as two <=64-bit codes spliced per element, packed with
    the same cumsum scatter as the timestamps.  (The paper's '10'
    previous-window-reuse form is an encoder OPTION with a sequential
    dependency; the decoder below handles both, and always-'11' keeps the
    encoder loop-free.  Cost: <=12 extra bits per changed value.)
    """
    v = np.asarray(vals, dtype=np.float64).view(np.uint64)
    if len(v) <= 1:
        return b""
    xor = v[1:] ^ v[:-1]
    n = len(xor)

    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)
    zero = xor == 0
    nz = ~zero

    mbits = np.where(nz, 64 - lz - tz, 0)
    # per-element primary code: '0' for zero-xor, else the 14-bit header
    header = (_U64(0b11) << _U64(12)) | (lz.astype(_U64) << _U64(6)) | (
        (mbits & 63).astype(_U64)
    )
    codes = np.where(zero, _U64(0), header.astype(np.uint64))
    lens = np.where(zero, 1, 14).astype(np.int64)

    if nz.any():
        idx = np.where(nz)[0]
        payload = (xor[nz] >> tz[nz].astype(_U64)).astype(_U64)
        plens = mbits[nz].astype(np.int64)
        order = np.argsort(
            np.concatenate([np.arange(n) * 2, idx * 2 + 1]), kind="stable"
        )
        codes = np.concatenate([codes, payload])[order]
        lens = np.concatenate([lens, plens])[order]

    return _pack_codes(codes, lens)


def decode_values(data: bytes, first_val: float, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.float64)
    out[0] = first_val
    if n == 1:
        return out
    r = _BitReader(data)
    prev = int(np.array([first_val], dtype=np.float64).view(np.uint64)[0])
    l, t = 0, 0
    for i in range(1, n):
        if r.take(1) == 0:
            cur = prev
        else:
            if r.take(1) == 0:
                mbits = 64 - l - t
                frag = r.take(mbits)
            else:
                l = r.take(6)
                mbits = r.take(6)
                if mbits == 0:
                    mbits = 64
                t = 64 - l - mbits
                frag = r.take(mbits)
            cur = prev ^ (frag << t)
        out[i] = np.array([cur], dtype=np.uint64).view(np.float64)[0]
        prev = cur
    return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    out = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    xf = x[nz]
    # bit_length via successive halving
    bl = np.zeros(len(xf), dtype=np.int64)
    cur = xf.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        cur[mask] >>= np.uint64(shift)
    out[nz] = 63 - bl
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64)."""
    out = np.full(len(x), 64, dtype=np.int64)
    nz = x != 0
    xf = x[nz]
    iso = xf & (~xf + np.uint64(1))  # lowest set bit
    cz = _clz64(iso)
    out[nz] = 63 - cz[np.arange(len(cz))]
    return out


# ------------------------------------------------------------------ batch API
def _pack_streams(codes, lengths, owner, n_series):
    """Pack (code, bitlen<=64) pairs belonging to ``n_series`` independent
    byte-aligned streams (``owner`` maps each code to its stream; codes are
    in stream order and streams are contiguous) with ONE bincount scatter.
    Returns a list of per-stream bytes.

    This is the batch generalization of :func:`_pack_codes`: per-code global
    bit positions offset each stream to its own byte range, so thousands of
    series in an Arrow batch are packed by a single set of numpy passes
    instead of ~40 numpy calls per series.
    """
    if len(codes) == 0:
        return [b""] * n_series
    lengths = lengths.astype(np.int64)
    series_bits = np.bincount(owner, weights=lengths, minlength=n_series).astype(
        np.int64
    )
    series_bytes = (series_bits + 7) >> 3
    byte_off = np.concatenate(([0], np.cumsum(series_bytes)[:-1]))
    total_bytes = int(series_bytes.sum())

    csum = np.concatenate(([0], np.cumsum(lengths)))
    first_code = np.searchsorted(owner, np.arange(n_series), side="left")
    base = csum[first_code]  # bit-cumsum at each stream's first code
    within = csum[:-1] - base[owner]
    starts = byte_off[owner] * 8 + within

    bytestart = (starts >> 3).astype(np.int64)
    bitoff = (starts & 7).astype(np.int64)
    sh = 72 - bitoff - lengths
    codes = codes.astype(np.uint64)
    ge8 = sh >= 8
    sh_hi = np.where(ge8, sh - 8, 0).astype(np.uint64)
    sh_lo = np.where(ge8, 0, 8 - sh).astype(np.uint64)
    hi64 = np.where(ge8, codes << sh_hi, codes >> sh_lo)
    # mask the shift into [0,63]: np.where evaluates BOTH branches, and a
    # uint64 shift by >=64 (sh reaches 71 on ge8 lanes) is platform-defined
    lob = np.where(ge8, np.uint64(0), codes << (sh.astype(np.uint64) & np.uint64(63)))
    lob = (lob & np.uint64(0xFF)).astype(np.uint8)
    planes = np.concatenate(
        [hi64.reshape(-1, 1).view(np.uint8)[:, ::-1], lob.reshape(-1, 1)], axis=1
    )
    idx = bytestart.reshape(-1, 1) + np.arange(9, dtype=np.int64)
    flat_v = planes.reshape(-1)
    nz = flat_v != 0
    buf = np.bincount(
        idx.reshape(-1)[nz], weights=flat_v[nz].astype(np.float64),
        minlength=total_bytes + 9,
    ).astype(np.uint8)
    raw = buf.tobytes()
    return [
        raw[byte_off[s]: byte_off[s] + series_bytes[s]] for s in range(n_series)
    ]


def _splice_payload(codes, lens, keys, esc_idx, payload, plens, owner):
    """Append escape payload codes right after their prefix codes by global
    sort key (position*2 for prefixes, +1 for payloads)."""
    if len(esc_idx) == 0:
        order = np.argsort(keys, kind="stable")
        return codes[order], lens[order], owner[order]
    codes = np.concatenate([codes, payload])
    lens = np.concatenate([lens, plens])
    keys = np.concatenate([keys, keys[esc_idx] + 1])
    owner = np.concatenate([owner, owner[esc_idx]])
    order = np.argsort(keys, kind="stable")
    return codes[order], lens[order], owner[order]


def encode_blocks_batch(ts: np.ndarray, vals: np.ndarray, bounds: np.ndarray):
    """Encode MANY series at once: ``bounds`` delimits contiguous series in
    ``ts``/``vals`` (len S+1).  Returns (ns, first_ts, first_val, ts_blocks,
    val_blocks) where the first three are arrays of length S and the last
    two are lists of bytes.  Batch-wide vectorization: deltas, dod
    classification, XOR classification and bit packing are each ONE numpy
    pass over the whole batch with series boundaries masked out.
    """
    ts = np.asarray(ts, dtype=np.int64)
    v = np.asarray(vals, dtype=np.float64).view(np.uint64)
    bounds = np.asarray(bounds, dtype=np.int64)
    S = len(bounds) - 1
    los, his = bounds[:-1], bounds[1:]
    ns = his - los
    owner_i = np.repeat(np.arange(S), ns)  # series of each global row

    # ---------------- timestamps ----------------
    if len(ts) > 1:
        d = np.diff(ts)
        same_d = owner_i[1:] == owner_i[:-1]  # delta stays within one series
    else:
        d = np.zeros(0, dtype=np.int64)
        same_d = np.zeros(0, dtype=bool)

    # every intra-series delta d[j] becomes one bucket code at row j+1:
    # dod = d[j] - d[j-1] when d[j-1] is in the same series, else d[j] - 0
    # (implicit zero previous delta at each series start)
    j = np.where(same_d)[0]
    prev_ok = np.zeros(len(j), dtype=bool)
    if len(j):
        prev_ok = (j >= 1) & same_d[np.maximum(j - 1, 0)]
    dod = d[j] - np.where(prev_ok, d[np.maximum(j - 1, 0)], 0)
    dod_owner = owner_i[j]
    zero = dod == 0
    b7 = (~zero) & (dod >= -63) & (dod <= 64)
    b9 = (~zero) & (~b7) & (dod >= -255) & (dod <= 256)
    b12 = (~zero) & (~b7) & (~b9) & (dod >= -2047) & (dod <= 2048)
    b64 = ~(zero | b7 | b9 | b12)
    dcodes = np.zeros(len(dod), dtype=_U64)
    dlens = np.ones(len(dod), dtype=np.int64)
    dcodes[b7] = (_U64(0b10) << _U64(7)) | (dod[b7] + 63).astype(_U64)
    dlens[b7] = 9
    dcodes[b9] = (_U64(0b110) << _U64(9)) | (dod[b9] + 255).astype(_U64)
    dlens[b9] = 12
    dcodes[b12] = (_U64(0b1110) << _U64(12)) | (dod[b12] + 2047).astype(_U64)
    dlens[b12] = 16
    dcodes[b64] = _U64(0b1111)
    dlens[b64] = 4
    dkeys = (j + 1) * 2  # code for delta d[j] is stamped on row j+1

    esc = np.where(b64)[0]
    t_codes, t_lens, t_owner = _splice_payload(
        dcodes, dlens, dkeys, esc,
        dod[b64].astype(np.int64).view(np.uint64),
        np.full(int(b64.sum()), 64, dtype=np.int64), dod_owner,
    )
    ts_blocks = _pack_streams(t_codes, t_lens, t_owner, S)

    # ---------------- values ----------------
    if len(v) > 1:
        x = v[1:] ^ v[:-1]
        k = np.where(same_d)[0]  # xor index k encodes row k+1
    else:
        x = np.zeros(0, dtype=np.uint64)
        k = np.zeros(0, dtype=np.int64)
    xor = x[k]
    x_owner = owner_i[k]
    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)
    zero = xor == 0
    nz = ~zero
    mbits = np.where(nz, 64 - lz - tz, 0)
    header = (
        (_U64(0b11) << _U64(12))
        | (lz.astype(_U64) << _U64(6))
        | (mbits & 63).astype(_U64)
    )
    vcodes = np.where(zero, _U64(0), header.astype(np.uint64))
    vlens = np.where(zero, 1, 14).astype(np.int64)
    vkeys = (k + 1) * 2
    esc = np.where(nz)[0]
    tz_nz = tz[nz].astype(_U64)
    vcodes, vlens, v_owner = _splice_payload(
        vcodes, vlens, vkeys, esc, (xor[nz] >> tz_nz).astype(_U64),
        mbits[nz].astype(np.int64), x_owner,
    )
    val_blocks = _pack_streams(vcodes, vlens, v_owner, S)

    first_ts = ts[los] if len(ts) else np.zeros(0, dtype=np.int64)
    first_val = (
        v[los].view(np.float64) if len(v) else np.zeros(0, dtype=np.float64)
    )
    return ns, first_ts, first_val, ts_blocks, val_blocks


# ------------------------------------------------------------ batch decoding
def _gather_windows(buf: np.ndarray, bitpos: np.ndarray) -> np.ndarray:
    """Vectorized unaligned bit-window read: for each bit position, load the
    9-byte window covering bits [pos, pos+64+7) and return the 64 bits
    starting at ``pos`` as uint64 (one value per element).  ``buf`` must be
    padded with >=9 trailing zero bytes so end-of-stream reads stay in
    bounds."""
    i = (bitpos >> np.uint64(3)).astype(np.int64)
    o = (bitpos & np.uint64(7)).astype(np.uint64)
    b = buf[i[:, None] + np.arange(9, dtype=np.int64)]  # (k, 9) uint8
    hi = np.ascontiguousarray(b[:, :8]).view(">u8")[:, 0].astype(np.uint64)
    lo = b[:, 8].astype(np.uint64)
    # big-endian 72-bit window shifted so window bit ``o`` becomes the MSB;
    # o=0 degenerates correctly (hi<<0, lo>>8 == 0)
    return (hi << o) | (lo >> (np.uint64(8) - o))


def _take_bits(shifted: np.ndarray, width: np.ndarray) -> np.ndarray:
    """Top ``width`` bits of each shifted window (width in [0, 64]); shift
    counts are masked into range so width==64 and width==0 are both
    defined."""
    w = width.astype(np.uint64)
    out = shifted >> ((np.uint64(64) - w) & np.uint64(63))
    return np.where(w > 0, out, np.uint64(0))


def _concat_streams(blocks: list) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-stream byte blocks into one padded uint8 buffer.
    Returns (buf, per-stream starting BIT position)."""
    lens = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=len(blocks))
    byte_off = np.concatenate(([0], np.cumsum(lens)[:-1]))
    buf = np.frombuffer(b"".join(blocks) + b"\x00" * 9, dtype=np.uint8)
    return buf, (byte_off * 8).astype(np.uint64)


def decode_blocks_batch(
    ns: np.ndarray,
    first_ts: np.ndarray,
    first_val: np.ndarray,
    ts_blocks: list,
    val_blocks: list,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY blocks at once, lock-step across streams: iteration ``i``
    decodes point ``i`` of every stream that still has one, as a handful of
    numpy passes (two :func:`_gather_windows` reads + mask arithmetic).
    Python-level iteration count is max(ns), not sum(ns) — the batch-side
    dual of :func:`encode_blocks_batch`, and the fix for the per-point
    decode loop the round-1 bench flagged as the engine's slowest path.

    Returns (timestamps, values) concatenated in input stream order
    (lengths = ``ns``).
    """
    ns = np.asarray(ns, dtype=np.int64)
    S = len(ns)
    total = int(ns.sum())
    ts_out = np.empty(total, dtype=np.int64)
    val_out = np.empty(total, dtype=np.float64)
    if total == 0:
        return ts_out, val_out
    off_orig = np.concatenate(([0], np.cumsum(ns)[:-1]))
    # sorted-descending stream order makes "streams still active at i" a
    # prefix slice, so per-iteration state access is views, not boolean masks
    order = np.argsort(-ns, kind="stable")
    ns_s = ns[order]
    off_s = off_orig[order]
    max_n = int(ns_s[0])

    def active(i: int) -> int:
        return int(np.searchsorted(-ns_s, -i, side="left"))

    # ---------------- timestamps ----------------
    tbuf, tpos0 = _concat_streams([ts_blocks[s] for s in order])
    pos = tpos0.copy()
    delta = np.zeros(S, dtype=np.int64)
    prev = first_ts[order].astype(np.int64).copy()
    k0 = active(0)
    ts_out[off_s[:k0]] = prev[:k0]
    for i in range(1, max_n):
        k = active(i)
        win = _gather_windows(tbuf, pos[:k])
        c4 = (win >> np.uint64(60)).astype(np.int64)  # top 4 control bits
        cls0 = c4 < 8
        cls1 = (c4 >> 2) == 0b10
        cls2 = (c4 >> 1) == 0b110
        cls3 = c4 == 0b1110
        cls4 = c4 == 0b1111
        ctrl = np.select([cls0, cls1, cls2, cls3], [1, 2, 3, 4], default=4)
        plen = np.select([cls0, cls1, cls2, cls3], [0, 7, 9, 12], default=64)
        # small payloads (<=12 bits) come out of the same 64-bit window:
        # drop the control bits, take the top plen bits
        small = _take_bits(win << ctrl.astype(np.uint64), np.where(cls4, 0, plen)).astype(np.int64)
        dod = np.zeros(k, dtype=np.int64)
        dod[cls1] = small[cls1] - 63
        dod[cls2] = small[cls2] - 255
        dod[cls3] = small[cls3] - 2047
        if cls4.any():  # 64-bit escape: second gather just past the prefix
            p4 = pos[:k][cls4] + np.uint64(4)
            dod[cls4] = _gather_windows(tbuf, p4).view(np.int64)
        delta[:k] += dod
        prev[:k] += delta[:k]
        ts_out[off_s[:k] + i] = prev[:k]
        pos[:k] += (ctrl + plen).astype(np.uint64)

    # ---------------- values ----------------
    vbuf, vpos0 = _concat_streams([val_blocks[s] for s in order])
    pos = vpos0.copy()
    prevb = first_val[order].astype(np.float64).view(np.uint64).copy()
    lead = np.zeros(S, dtype=np.int64)
    trail = np.zeros(S, dtype=np.int64)
    val_out[off_s[:k0]] = prevb[:k0].view(np.float64)
    for i in range(1, max_n):
        k = active(i)
        win = _gather_windows(vbuf, pos[:k])
        b0 = (win >> np.uint64(63)).astype(np.int64)
        b1 = (win >> np.uint64(62)).astype(np.int64) & 1
        is_same = b0 == 0
        is_reuse = (b0 == 1) & (b1 == 0)  # '10': previous meaningful window
        is_new = (b0 == 1) & (b1 == 1)  # '11': explicit 6b lead + 6b len
        m_old = 64 - lead[:k] - trail[:k]  # width under reuse (OLD state)
        hdr = ((win >> np.uint64(50)) & np.uint64(0xFFF)).astype(np.int64)
        new_l = hdr >> 6
        new_m = hdr & 63
        new_m = np.where(new_m == 0, 64, new_m)
        new_t = 64 - new_l - new_m
        pre = np.select([is_same, is_reuse], [1, 2], default=14)
        pw = np.select([is_same, is_reuse], [0, m_old], default=new_m)
        pay = _take_bits(_gather_windows(vbuf, pos[:k] + pre.astype(np.uint64)), pw)
        t_eff = np.select([is_reuse], [trail[:k]], default=new_t)
        t_eff = np.where(pw > 0, t_eff, 0).astype(np.uint64)
        cur = np.where(is_same, prevb[:k], prevb[:k] ^ (pay << t_eff))
        val_out[off_s[:k] + i] = cur.view(np.float64)
        prevb[:k] = cur
        lead[:k] = np.where(is_new, new_l, lead[:k])
        trail[:k] = np.where(is_new, new_t, trail[:k])
        pos[:k] += (pre + pw).astype(np.uint64)

    return ts_out, val_out


# ------------------------------------------------------------------ blocks
def encode_block(ts: np.ndarray, vals: np.ndarray) -> dict:
    """Single-series block encode — thin wrapper over the batch encoder."""
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    ns, ft, fv, tb, vb = encode_blocks_batch(ts, vals, np.array([0, len(ts)]))
    return {
        "n": int(ns[0]),
        "first_ts": int(ft[0]),
        "first_val": float(fv[0]),
        "ts_block": tb[0],
        "val_block": vb[0],
    }


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    n = block["n"]
    return (
        decode_timestamps(block["ts_block"], block["first_ts"], n),
        decode_values(block["val_block"], block["first_val"], n),
    )


# ------------------------------------------------------------------ Spark layer
def compress_series(df, group_cols=("series_id",), epoch_col="epoch", value_col="value"):
    """DataFrame (group, epoch, value) -> one compressed block per group.

    Scale design: ``repartition(group) + sortWithinPartitions(group, epoch) +
    mapInPandas`` rather than per-group ``applyInPandas`` — each Python call
    processes a whole Arrow batch of MANY series (split on group boundaries
    with numpy, partial trailing series carried into the next batch), so the
    per-call pandas/Arrow overhead is amortized over ~10^4 rows instead of
    being paid once per series.  Repartitioning on the group keys guarantees
    each series is wholly inside one partition, so carry-over never crosses
    a partition boundary.
    """
    import pandas as pd

    gcols = list(group_cols)
    schema_prefix = ", ".join(
        f"{c} {t}" for c, t in zip(gcols, _group_types(df, gcols))
    )
    schema = (
        schema_prefix
        + ", n int, first_ts long, first_val double, ts_block binary,"
        + " val_block binary, fmt tinyint"
    )
    out_cols = gcols + ["n", "first_ts", "first_val", "ts_block", "val_block", "fmt"]

    def encode_span(pdf, bounds):
        """Encode the series delimited by ``bounds`` inside pdf via the
        batch encoder -> one output frame."""
        ns, ft, fv, tb, vb = encode_blocks_batch(
            pdf[epoch_col].to_numpy(), pdf[value_col].to_numpy(), bounds
        )
        data = {c: pdf[c].to_numpy()[bounds[:-1]] for c in gcols}
        data.update(
            {"n": ns.astype("int32"), "first_ts": ft, "first_val": fv,
             "ts_block": tb, "val_block": vb,
             "fmt": np.full(len(ns), BLOCK_FORMAT_VERSION, dtype="int8")}
        )
        return pd.DataFrame(data, columns=out_cols)

    def kernel(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            gv = [pdf[c].to_numpy() for c in gcols]
            # boundaries where any group column changes
            change = np.zeros(len(pdf) - 1, dtype=bool)
            for g in gv:
                change |= g[1:] != g[:-1]
            bounds = np.concatenate(([0], np.where(change)[0] + 1, [len(pdf)]))
            # last run may continue in the next batch — carry it
            carry = pdf.iloc[bounds[-2]:].copy()
            if len(bounds) > 2:
                yield encode_span(pdf, bounds[:-1])
        if carry is not None and len(carry):
            yield encode_span(carry, np.array([0, len(carry)], dtype=np.int64))

    part = df.repartition(*gcols).sortWithinPartitions(*gcols, epoch_col)
    return part.mapInPandas(kernel, schema=schema)


def decompress_series(blocks_df, group_cols=("series_id",)):
    """Inverse of :func:`compress_series`: blocks -> (group, epoch, value).

    Blocks are self-contained, so this is ``mapInPandas`` straight over the
    block rows — NO shuffle (the previous groupBy().applyInPandas paid a full
    exchange for nothing) — and each Arrow batch of blocks is decoded by the
    lock-step :func:`decode_blocks_batch` instead of a per-row, per-point
    Python loop.

    Version gate: blocks must carry ``fmt == BLOCK_FORMAT_VERSION``; a
    missing column is rejected at plan time and a mismatched value per
    batch, so pre-v2 persisted blocks fail loudly instead of decoding to
    wrong timestamps."""
    import pandas as pd

    if "fmt" not in blocks_df.columns:
        raise ValueError(
            "compressed blocks carry no 'fmt' version column — these were "
            "written by a pre-v2 encoder and are not decodable by this "
            f"version (expected fmt={BLOCK_FORMAT_VERSION}); re-encode from raw"
        )
    gcols = list(group_cols)
    schema_prefix = ", ".join(
        f"{c} {t}" for c, t in zip(gcols, _group_types(blocks_df, gcols))
    )
    schema = schema_prefix + ", epoch long, value double"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            fmts = pdf["fmt"].to_numpy()
            if (fmts != BLOCK_FORMAT_VERSION).any():
                bad = sorted(set(int(x) for x in fmts[fmts != BLOCK_FORMAT_VERSION]))
                raise ValueError(
                    f"unsupported compressed-block format version(s) {bad}; "
                    f"this decoder reads fmt={BLOCK_FORMAT_VERSION} only"
                )
            ns = pdf["n"].to_numpy(dtype=np.int64)
            ts, vals = decode_blocks_batch(
                ns,
                pdf["first_ts"].to_numpy(dtype=np.int64),
                pdf["first_val"].to_numpy(dtype=np.float64),
                [bytes(b) for b in pdf["ts_block"]],
                [bytes(b) for b in pdf["val_block"]],
            )
            data = {c: np.repeat(pdf[c].to_numpy(), ns) for c in gcols}
            data["epoch"] = ts
            data["value"] = vals
            yield pd.DataFrame(data, columns=gcols + ["epoch", "value"])

    return blocks_df.mapInPandas(kernel, schema=schema)


def _group_types(df, gcols):
    m = dict(df.dtypes)
    return [m[c] for c in gcols]


# -------------------------------------------------- multi-column block tables
def compress_table(df, group_cols=("conv_id",), epoch_col="bucket",
                   value_cols=("vsum",)):
    """Multi-column variant of :func:`compress_series` for tier storage
    (VERDICT r04 task 4): one block row per group carries ONE shared
    delta-of-delta timestamp stream plus a Gorilla XOR value stream PER
    column (``first_<c>`` double + ``blk_<c>`` binary).  Integer columns are
    encoded through their float64 image (exact to 2^53 — tier counts).

    Same scale shape as compress_series: repartition on the group keys +
    sortWithinPartitions + ONE mapInPandas with cross-batch series carry,
    so each Python call amortizes over a whole Arrow batch.  The batch
    encoder is invoked once per value column; its timestamp pass is
    recomputed and discarded for columns past the first — a deliberate
    simplicity trade (the ts pass is one vectorized sweep, a small fraction
    of the XOR work)."""
    import pandas as pd

    gcols, vcols = list(group_cols), list(value_cols)
    schema_prefix = ", ".join(
        f"{c} {t}" for c, t in zip(gcols, _group_types(df, gcols))
    )
    schema = (
        schema_prefix
        + ", n int, first_ts long, ts_block binary, fmt tinyint, "
        + ", ".join(f"first_{c} double, blk_{c} binary" for c in vcols)
    )
    out_cols = (
        gcols + ["n", "first_ts", "ts_block", "fmt"]
        + [x for c in vcols for x in (f"first_{c}", f"blk_{c}")]
    )

    def encode_span(pdf, bounds):
        ts = pdf[epoch_col].to_numpy()
        data = {c: pdf[c].to_numpy()[bounds[:-1]] for c in gcols}
        first = True
        for c in vcols:
            ns, ft, fv, tb, vb = encode_blocks_batch(
                ts, pdf[c].to_numpy(dtype="float64"), bounds
            )
            if first:
                data.update({
                    "n": ns.astype("int32"), "first_ts": ft, "ts_block": tb,
                    "fmt": np.full(len(ns), BLOCK_FORMAT_VERSION, dtype="int8"),
                })
                first = False
            data[f"first_{c}"] = fv
            data[f"blk_{c}"] = vb
        return pd.DataFrame(data, columns=out_cols)

    def kernel(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            gv = [pdf[c].to_numpy() for c in gcols]
            change = np.zeros(len(pdf) - 1, dtype=bool)
            for g in gv:
                change |= g[1:] != g[:-1]
            bounds = np.concatenate(([0], np.where(change)[0] + 1, [len(pdf)]))
            carry = pdf.iloc[bounds[-2]:].copy()
            if len(bounds) > 2:
                yield encode_span(pdf, bounds[:-1])
        if carry is not None and len(carry):
            yield encode_span(carry, np.array([0, len(carry)], dtype=np.int64))

    part = df.repartition(*gcols).sortWithinPartitions(*gcols, epoch_col)
    return part.mapInPandas(kernel, schema=schema)


def decompress_table(blocks_df, group_cols=("conv_id",), epoch_col="bucket",
                     value_cols=("vsum",)):
    """Inverse of :func:`compress_table`: block rows -> (group, epoch,
    value columns).  Shuffle-free mapInPandas over self-contained blocks,
    with the same fmt version gate as decompress_series."""
    import pandas as pd

    for col in ["fmt", "n", "first_ts", "ts_block"]:
        if col not in blocks_df.columns:
            raise ValueError(f"compressed block table missing {col!r} column")
    gcols, vcols = list(group_cols), list(value_cols)
    schema_prefix = ", ".join(
        f"{c} {t}" for c, t in zip(gcols, _group_types(blocks_df, gcols))
    )
    schema = (
        schema_prefix + f", {epoch_col} long, "
        + ", ".join(f"{c} double" for c in vcols)
    )

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            fmts = pdf["fmt"].to_numpy()
            if (fmts != BLOCK_FORMAT_VERSION).any():
                bad = sorted(set(int(x) for x in fmts[fmts != BLOCK_FORMAT_VERSION]))
                raise ValueError(
                    f"unsupported compressed-block format version(s) {bad}; "
                    f"this decoder reads fmt={BLOCK_FORMAT_VERSION} only"
                )
            ns = pdf["n"].to_numpy(dtype=np.int64)
            ft = pdf["first_ts"].to_numpy(dtype=np.int64)
            tsb = [bytes(b) for b in pdf["ts_block"]]
            data = {c: np.repeat(pdf[c].to_numpy(), ns) for c in gcols}
            first = True
            for c in vcols:
                ts, vals = decode_blocks_batch(
                    ns, ft, pdf[f"first_{c}"].to_numpy(dtype=np.float64),
                    tsb, [bytes(b) for b in pdf[f"blk_{c}"]],
                )
                if first:
                    data[epoch_col] = ts
                    first = False
                data[c] = vals
            yield pd.DataFrame(data, columns=gcols + [epoch_col] + vcols)

    return blocks_df.mapInPandas(kernel, schema=schema)
