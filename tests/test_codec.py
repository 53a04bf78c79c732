"""Codec round-trip + oracle/vectorized bit-exactness (FIXTURES.md §2).

Mirrors the reference's pack/unpack golden tests: deterministic series
engineered to hit every delta-of-delta bucket and Gorilla XOR case
(/root/reference/libmseed/test/lmtestpack.c:32-83 strategy), encode→decode
bit-exact, Xn invariant enforced (unpackdata.c:556-561 analogue).
"""

import math
import struct

import numpy as np
import pytest

from sac2mseed_spark.codec import oracle
from sac2mseed_spark.codec.vectorized import (
    encode_chunks_vec,
    floats_to_bits,
)


def _bits(vals):
    return [oracle.float_to_bits(float(v)) for v in vals]


# ---- fixture series (FIXTURES.md §2) ----------------------------------

def ts_constant_rate(n=500):
    return [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)]


def ts_jitter(n=500):
    jit = [0, 1, -1, 63, -63, 255, -255, 16_000, -16_000, 2**30, -(2**30), 2**40]
    out, t = [], 1_700_000_000_000_000
    for i in range(n):
        t += 1_000_000 + jit[i % len(jit)]
        out.append(t)
    return out


def val_constant(n=500):
    return [42.5] * n


def val_sinusoid(n=500):
    # expanding sinusoid, same family as the reference's sindata
    return [math.sin(i * 0.3) * (1.1 ** (i % 80)) for i in range(n)]


def val_specials():
    return [0.0, -0.0, 5e-324, -5e-324, 1e308, -1e308, float("nan"),
            float("inf"), float("-inf"), 1.0, -1.0, 2.0**-1022]


def val_int_like(n=200):
    return [float((i * 37) % 1000) for i in range(n)]


SERIES = {
    "const_rate/const_val": (ts_constant_rate(), val_constant()),
    "jitter/sinusoid": (ts_jitter(), val_sinusoid()),
    "jitter/specials": (ts_jitter(12), val_specials()),
    "const_rate/int_like": (ts_constant_rate(200), val_int_like()),
    "single_point": (ts_constant_rate(1), [3.25]),
    "two_points": (ts_constant_rate(2), [1.0, 1.0]),
}


@pytest.mark.parametrize("name", sorted(SERIES))
def test_oracle_roundtrip(name):
    ts, vals = SERIES[name]
    vb = _bits(vals)
    chunk = oracle.encode_chunk(ts, [vb])
    blob = oracle.assemble_blob([chunk], 1, len(ts))
    ts2, streams = oracle.decode_blob(blob, expect_xn=vb[-1])
    assert ts2 == ts
    assert streams[0] == vb


@pytest.mark.parametrize("name", sorted(SERIES))
def test_vectorized_matches_oracle(name):
    ts, vals = SERIES[name]
    vb = _bits(vals)
    expected = oracle.encode_chunk(ts, [vb])
    got, stats = encode_chunks_vec(
        np.array(ts, dtype=np.int64),
        np.array([0, len(ts)], dtype=np.int64),
        [floats_to_bits(np.array(vals, dtype=np.float64))],
    )
    assert got[0] == expected
    assert stats["n_points"][0] == len(ts)
    assert stats["xn"][0] == np.uint64(vb[-1])


def test_vectorized_many_chunks_batch():
    """One batch, many chunks of different sizes — equality per chunk."""
    rng = np.random.default_rng(42)
    chunks = []
    for n in [1, 2, 3, 7, 50, 400]:
        t0 = int(rng.integers(1_600_000_000_000_000, 1_800_000_000_000_000))
        deltas = rng.integers(1, 10_000_000, size=n - 1) if n > 1 else []
        ts = np.concatenate([[t0], t0 + np.cumsum(deltas)]).astype(np.int64) if n > 1 else np.array([t0], dtype=np.int64)
        vals = rng.normal(size=n) * rng.choice([1e-5, 1.0, 1e7])
        chunks.append((ts, vals))
    ts_flat = np.concatenate([c[0] for c in chunks])
    vals_flat = np.concatenate([c[1] for c in chunks])
    offsets = np.concatenate([[0], np.cumsum([len(c[0]) for c in chunks])]).astype(np.int64)
    got, _ = encode_chunks_vec(ts_flat, offsets, [floats_to_bits(vals_flat)])
    for i, (ts, vals) in enumerate(chunks):
        exp = oracle.encode_chunk(list(map(int, ts)), [_bits(vals)])
        assert got[i] == exp, f"chunk {i} mismatch"


def test_vectorized_multi_stream():
    ts = ts_jitter(300)
    s1 = val_sinusoid(300)
    s2 = [float(i % 17) for i in range(300)]
    exp = oracle.encode_chunk(ts, [_bits(s1), _bits(s2)])
    got, _ = encode_chunks_vec(
        np.array(ts, dtype=np.int64),
        np.array([0, 300], dtype=np.int64),
        [floats_to_bits(np.array(s1)), floats_to_bits(np.array(s2))],
    )
    assert got[0] == exp
    blob = oracle.assemble_blob(got, 2, 300)
    ts2, streams = oracle.decode_blob(blob)
    assert ts2 == ts
    assert streams[0] == _bits(s1) and streams[1] == _bits(s2)


@pytest.mark.parametrize("name", sorted(SERIES))
def test_fast_decoder_matches_oracle(name):
    from decode_fast_oracle import decode_blob_fast

    ts, vals = SERIES[name]
    vb = _bits(vals)
    blob = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, len(ts))
    slow = oracle.decode_blob(blob, expect_xn=vb[-1])
    fast = decode_blob_fast(blob, expect_xn=vb[-1])
    assert fast == slow


@pytest.mark.parametrize("name", sorted(SERIES))
def test_vec_decoder_matches_oracle(name):
    from sac2mseed_spark.codec.decode_vec import decode_blob_vec

    ts, vals = SERIES[name]
    vb = _bits(vals)
    blob = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, len(ts))
    slow = oracle.decode_blob(blob, expect_xn=vb[-1])
    vec = decode_blob_vec(blob, expect_xn=vb[-1])
    assert vec[0] == slow[0]
    assert vec[1] == slow[1]


def test_vec_decoder_many_blobs_concat():
    """Whole-batch wavefront decode: many blobs, mixed chunk counts and
    sizes, two streams — values identical to the oracle per blob."""
    from sac2mseed_spark.codec.decode_vec import check_xn, decode_concat

    rng = np.random.default_rng(7)
    blobs, exp = [], []
    for _ in range(40):
        chunks = []
        for _c in range(int(rng.integers(1, 4))):
            n = int(rng.integers(1, 300))
            t0 = int(rng.integers(10**14, 2 * 10**14))
            if n > 1:
                ts = (t0 + np.concatenate(
                    [[0], np.cumsum(rng.integers(-5_000_000, 10_000_000, n - 1))]
                )).astype(np.int64).tolist()
            else:
                ts = [t0]
            s1 = _bits(rng.normal(size=n) * rng.choice([1e-6, 1.0, 1e8]))
            s2 = _bits(rng.integers(0, 100, n).astype(float))
            chunks.append((ts, [s1, s2]))
        enc = [oracle.encode_chunk(ts, ss) for ts, ss in chunks]
        blobs.append(oracle.assemble_blob(enc, 2, sum(len(t) for t, _ in chunks)))
        exp.append(
            (
                sum((t for t, _ in chunks), []),
                sum((ss[0] for _, ss in chunks), []),
                sum((ss[1] for _, ss in chunks), []),
            )
        )
    data = np.frombuffer(b"".join(blobs), np.uint8)
    lens = np.array([len(b) for b in blobs], np.int64)
    ends = np.cumsum(lens)
    _, po, ts_out, streams = decode_concat(data, ends - lens, ends)
    for i, (ats, as1, as2) in enumerate(exp):
        s, e = po[i], po[i + 1]
        assert ts_out[s:e].tolist() == ats
        assert streams[0][s:e].tolist() == as1
        assert streams[1][s:e].tolist() == as2
    xn = np.array([e[1][-1] for e in exp], dtype=np.uint64)
    check_xn(streams, po, xn)
    bad = xn.copy()
    bad[3] = bad[3] ^ np.uint64(1)
    with pytest.raises(ValueError, match="Xn mismatch"):
        check_xn(streams, po, bad)


def test_vec_decoder_xn_check():
    from sac2mseed_spark.codec.decode_vec import decode_blob_vec

    ts, vals = SERIES["const_rate/int_like"]
    vb = _bits(vals)
    blob = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, len(ts))
    with pytest.raises(ValueError, match="Xn mismatch"):
        decode_blob_vec(blob, expect_xn=vb[-1] ^ 1)


def test_fast_decoder_xn_check():
    from decode_fast_oracle import decode_blob_fast

    ts, vals = SERIES["const_rate/int_like"]
    vb = _bits(vals)
    blob = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, len(ts))
    with pytest.raises(ValueError, match="Xn mismatch"):
        decode_blob_fast(blob, expect_xn=vb[-1] ^ 1)


def test_nan_roundtrip_preserves_bit_pattern():
    ts = ts_constant_rate(4)
    nan_bits = struct.unpack("<Q", struct.pack("<d", float("nan")))[0]
    vals_bits = [nan_bits, nan_bits, oracle.float_to_bits(1.5), nan_bits]
    chunk = oracle.encode_chunk(ts, [vals_bits])
    blob = oracle.assemble_blob([chunk], 1, 4)
    _, streams = oracle.decode_blob(blob)
    assert streams[0] == vals_bits


def test_xn_mismatch_detected():
    ts, vals = SERIES["const_rate/int_like"]
    vb = _bits(vals)
    blob = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, len(ts))
    with pytest.raises(ValueError, match="Xn mismatch"):
        oracle.decode_blob(blob, expect_xn=vb[-1] ^ 1)


def test_chunked_equals_single_when_split():
    """Splitting a series at a fixed boundary and concatenating the chunk
    encodings in a blob decodes to the same series — the skew-split
    bit-exactness property (operators/skew.py contract)."""
    ts, vals = ts_jitter(1000), val_sinusoid(1000)
    vb = _bits(vals)
    whole = oracle.assemble_blob([oracle.encode_chunk(ts, [vb])], 1, 1000)
    parts = [
        oracle.encode_chunk(ts[:512], [vb[:512]]),
        oracle.encode_chunk(ts[512:], [vb[512:]]),
    ]
    split = oracle.assemble_blob(parts, 1, 1000)
    for blob in (whole, split):
        ts2, streams = oracle.decode_blob(blob, expect_xn=vb[-1])
        assert ts2 == ts and streams[0] == vb
