"""Fast chunk decoder — word-streaming bit reads (test-only parity oracle).

Superseded in production by codec/decode_vec.py; kept under tests/ as a
second independent decoder implementation for byte/value parity checks.

Same algorithm as codec/oracle.py's decoder (prefix-sum reconstruction,
Xn verify — unpackdata.c:294-310, 556-561 analogues) but the bit reader
indexes into pre-split 64-bit words, so each field read is O(1) small-int
work instead of shifting one whole-stream big integer (the oracle's
BitReader is O(stream) per read, quadratic on long chunks). Produces
values identical to the oracle decoder (tests assert).
"""

from __future__ import annotations

import struct

import numpy as np

from sac2mseed_spark.codec import DOD_BUCKETS, GOR_LZ_BITS, GOR_MLEN_BITS
from sac2mseed_spark.codec.oracle import iter_chunks

_M64 = (1 << 64) - 1


class WordBitReader:
    __slots__ = ("words", "pos")

    def __init__(self, data: bytes):
        pad = (-len(data)) % 8
        if pad:
            data = data + b"\x00" * pad
        self.words = np.frombuffer(data, dtype=">u8").tolist()
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        self.pos = p + n
        w = p >> 6
        off = p & 63
        end = off + n
        v = self.words[w]
        if end <= 64:
            return (v >> (64 - end)) & ((1 << n) - 1)
        lo_bits = end - 64
        hi = (v & ((1 << (64 - off)) - 1)) << lo_bits
        return hi | (self.words[w + 1] >> (64 - lo_bits))


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def decode_chunk_fast(n, t0, delta0, ts_bits, stream_bits):
    ts = [t0]
    if n >= 2:
        ts.append(t0 + delta0)
    r = WordBitReader(ts_bits)
    delta = delta0
    read = r.read
    for _ in range(n - 2):
        if read(1) == 0:
            dod = 0
        else:
            for _prefix, _plen, bits in DOD_BUCKETS[:-1]:
                if read(1) == 0:
                    dod = _unzigzag(read(bits))
                    break
            else:
                dod = _unzigzag(read(64))
        delta += dod
        ts.append(ts[-1] + delta)

    streams = []
    for sb in stream_bits:
        r = WordBitReader(sb)
        read = r.read
        prev = read(64)
        vals = [prev]
        app = vals.append
        for _ in range(n - 1):
            if read(1) == 0:
                app(prev)
            else:
                lz = read(GOR_LZ_BITS)
                mlen = read(GOR_MLEN_BITS) + 1
                prev = prev ^ (read(mlen) << (64 - lz - mlen))
                app(prev)
        streams.append(vals)
    return ts, streams


def decode_blob_fast(blob: bytes, expect_xn: int | None = None):
    """Drop-in replacement for oracle.decode_blob (same Xn check)."""
    ts_all: list[int] = []
    n_streams = blob[3]
    streams_all: list[list[int]] = [[] for _ in range(n_streams)]
    for n, t0, delta0, ts_bits, stream_bits in iter_chunks(blob):
        ts, streams = decode_chunk_fast(n, t0, delta0, ts_bits, stream_bits)
        ts_all.extend(ts)
        for acc, s in zip(streams_all, streams):
            acc.extend(s)
    if expect_xn is not None and streams_all and streams_all[0]:
        if streams_all[0][-1] != expect_xn:
            raise ValueError(
                f"Xn mismatch: decoded {streams_all[0][-1]:#x}, expected {expect_xn:#x}"
            )
    return ts_all, streams_all


def bits_list_to_floats(bits: list[int]) -> np.ndarray:
    return np.array(bits, dtype=np.uint64).view(np.float64)
