"""Gorilla-style chunk compression: delta-of-delta timestamps + XOR
float packing (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 — public paper; no reference-repo
counterpart, the reference keeps everything in RAM).

Encoding per the paper's §4.1:

- timestamps: store t0 (64 bits) and the first delta (32 bits), then
  delta-of-deltas bucketed as
      0                -> '0'
      [-63, 64]        -> '10'  + 7 bits
      [-255, 256]      -> '110' + 9 bits
      [-2047, 2048]    -> '1110' + 12 bits
      else             -> '1111' + 64 bits
- values: XOR with the previous value;
      0                -> '0'
      fits in previous meaningful window -> '10' + meaningful bits
      else -> '11' + 5-bit #leading + 6-bit #meaningful + bits

NaN encodes like any other payload (NaN bit pattern), so missing
values round-trip exactly.

The codec runs inside Arrow UDFs over per-(series, bucket) chunks
(roll_spark.plans.chunks) — each chunk is one BinaryType cell. Python
bit-twiddling is fine at chunk granularity for this sandbox; a
production deployment would swap in a native codec behind the same
encode/decode contract.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RSG1"


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


_DOD_BUCKETS = (
    (64, 0b10, 2, 7),
    (256, 0b110, 3, 9),
    (2048, 0b1110, 4, 12),
)


def encode_chunk(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel (int64 microsecond timestamps, float64 values)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if n != len(vals):
        raise ValueError("ts and values must have equal length")
    header = MAGIC + struct.pack("<i", n)
    if n == 0:
        return header
    w = _BitWriter()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    v0 = struct.unpack("<Q", struct.pack("<d", float(vals[0])))[0]
    w.write(v0, 64)
    prev_delta = 0
    prev_bits = v0
    prev_lead, prev_mean = -1, 0  # previous meaningful-bit window
    for i in range(1, n):
        delta = int(ts[i]) - int(ts[i - 1])
        dod = delta - prev_delta
        prev_delta = delta
        if dod == 0:
            w.write(0, 1)
        else:
            for bound, prefix, plen, nbits in _DOD_BUCKETS:
                if -bound + 1 <= dod <= bound:
                    w.write(prefix, plen)
                    w.write(dod + bound - 1, nbits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(dod & ((1 << 64) - 1), 64)
        cur = struct.unpack("<Q", struct.pack("<d", float(vals[i])))[0]
        x = cur ^ prev_bits
        prev_bits = cur
        if x == 0:
            w.write(0, 1)
        else:
            lead = 64 - x.bit_length()
            trail = (x & -x).bit_length() - 1
            lead = min(lead, 31)
            mean = 64 - lead - trail
            if prev_lead >= 0 and lead >= prev_lead and (64 - prev_lead - prev_mean) <= trail:
                # reuse previous window
                w.write(0b10, 2)
                shift = 64 - prev_lead - prev_mean
                w.write(x >> shift, prev_mean)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mean & 0x3F, 6)  # 64 encodes as 0
                w.write(x >> trail, mean)
                prev_lead, prev_mean = lead, mean
    return header + w.finish()


def decode_chunk(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    if blob[:4] != MAGIC:
        raise ValueError("bad magic")
    (n,) = struct.unpack("<i", blob[4:8])
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals
    r = _BitReader(blob[8:])
    t0 = r.read(64)
    if t0 >= 1 << 63:
        t0 -= 1 << 64
    ts[0] = t0
    v0 = r.read(64)
    vals[0] = struct.unpack("<d", struct.pack("<Q", v0))[0]
    prev_delta = 0
    prev_bits = v0
    prev_lead, prev_mean = -1, 0
    t_prev = t0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            matched = False
            for bound, _prefix, plen, nbits in _DOD_BUCKETS:
                if r.read(1) == 0:
                    dod = r.read(nbits) - bound + 1
                    matched = True
                    break
            if not matched:
                dod = r.read(64)
                if dod >= 1 << 63:
                    dod -= 1 << 64
        prev_delta += dod
        t_prev += prev_delta
        ts[i] = t_prev
        if r.read(1) == 0:
            x = 0
        else:
            if r.read(1) == 0:
                shift = 64 - prev_lead - prev_mean
                x = r.read(prev_mean) << shift
            else:
                lead = r.read(5)
                mean = r.read(6)
                if mean == 0:
                    mean = 64
                trail = 64 - lead - mean
                x = r.read(mean) << trail
                prev_lead, prev_mean = lead, mean
        prev_bits ^= x
        vals[i] = struct.unpack("<d", struct.pack("<Q", prev_bits))[0]
    return ts, vals
