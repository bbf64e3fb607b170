"""§2.5 codec: encode∘decode identity + block-max correctness (property
tests with seeded Zipfian streams — FIXTURES.md §5 edge list)."""

import numpy as np
import pytest

from elasticsearch_eslib_spark.config import BLOCK_SIZE
from elasticsearch_eslib_spark.functions.codec import (
    decode_posting_block, decode_stream, encode_posting_blocks, encode_stream,
)


@pytest.mark.parametrize("vals", [
    [0], [1], [2**40], [0, 0, 0], [1] * 128,
    list(range(128)), list(range(129)),
    [7] * 127 + [2**50],          # one huge exception
    [2**50] * 20,                  # all-huge (b grows, no exceptions)
    [], [255, 0, 255],
])
def test_stream_roundtrip_edges(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert (decode_stream(encode_stream(arr)) == arr).all()


@pytest.mark.parametrize("seed", range(8))
def test_stream_roundtrip_zipf(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(1, 256))
    vals = rng.zipf(1.3, size=n).astype(np.uint64)
    assert (decode_stream(encode_stream(vals)) == vals).all()


def test_exception_count_bounded():
    rng = np.random.default_rng(7)
    vals = rng.zipf(1.2, size=128).astype(np.uint64)
    data = encode_stream(vals)
    b, n_exc, n = data[0], data[1], data[2]
    assert n == 128
    assert n_exc <= 12  # ≤ floor(0.1 · n)


@pytest.mark.parametrize("n_docs", [1, 127, 128, 129, 400])
def test_posting_blocks_roundtrip(n_docs):
    rng = np.random.default_rng(42 + n_docs)
    gaps = rng.zipf(1.5, size=n_docs)
    doc_ids = np.cumsum(gaps).astype(np.int64)
    tfs = rng.zipf(1.8, size=n_docs).clip(1, 1000).astype(np.int64)
    dls = rng.integers(8, 1024, size=n_docs).astype(np.int64)
    blocks = encode_posting_blocks(doc_ids, tfs, dls)
    assert len(blocks) == (n_docs + BLOCK_SIZE - 1) // BLOCK_SIZE
    out_docs, out_tfs, out_dls = [], [], []
    for blk in blocks:
        d, t, l = decode_posting_block(
            blk["first_doc"], blk["doc_deltas"], blk["tfs"], blk["dls"])
        assert len(d) == blk["n_docs"]
        assert d[0] == blk["first_doc"] and d[-1] == blk["last_doc"]
        assert t.max() == blk["block_max_tf"]
        out_docs.append(d); out_tfs.append(t); out_dls.append(l)
    assert (np.concatenate(out_docs) == doc_ids).all()
    assert (np.concatenate(out_tfs) == tfs).all()
    assert (np.concatenate(out_dls) == dls).all()


def test_tf_one_everywhere():
    doc_ids = np.arange(1, 300, dtype=np.int64)
    tfs = np.ones(299, dtype=np.int64)
    dls = np.full(299, 100, dtype=np.int64)
    blocks = encode_posting_blocks(doc_ids, tfs, dls)
    for blk in blocks:
        assert blk["block_max_tf"] == 1
        d, t, _ = decode_posting_block(
            blk["first_doc"], blk["doc_deltas"], blk["tfs"], blk["dls"])
        assert (t == 1).all()


def test_small_and_numpy_encoders_byte_identical():
    """The pure-Python small-stream fast path must emit byte-identical
    output to the vectorized path (the format is pinned; which path ran
    must be unobservable)."""
    import elasticsearch_eslib_spark.functions.codec as C

    rng = np.random.default_rng(99)
    for _ in range(300):
        n = int(rng.integers(1, C._SMALL_N + 1))
        vals = rng.integers(
            0, 1 << int(rng.integers(1, 50)), size=n, dtype=np.uint64)
        small = C._encode_small([int(v) for v in vals])
        widths = C._bit_widths(vals)
        kth = n - 1 - int(n * C.EXCEPTION_FRACTION)
        b = int(max(1, np.partition(widths, kth)[kth]))
        exc = np.nonzero(widths > b)[0]
        out = bytearray(C._HEADER.pack(b, len(exc), n))
        out += C._pack_low_bits(vals, b)
        for lane in exc:
            out.append(int(lane))
            C._write_varint(int(vals[lane]) >> b, out)
        assert small == bytes(out)
        assert (C.decode_stream(small) == vals).all()


def test_bit_widths_match_int_bit_length():
    import elasticsearch_eslib_spark.functions.codec as C

    edge = np.array([0, 1, 2, 3, 7, 8, (1 << 32) - 1, 1 << 32,
                     (1 << 33) - 1, (1 << 52) + 12345, (1 << 63) + 5,
                     np.iinfo(np.uint64).max], dtype=np.uint64)
    rng = np.random.default_rng(3)
    rand = rng.integers(0, 1 << 63, size=5000, dtype=np.uint64)
    for vals in (edge, rand):
        ref = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
        assert (C._bit_widths(vals) == ref).all()


def test_small_stream_respects_block_size():
    """The pure-Python small-stream fast path must not swallow an explicit
    sub-_SMALL_N block_size: 20 postings at block_size=8 yield 3 blocks
    with per-block metadata, not one oversized block (round-4 fix)."""
    import numpy as np

    from elasticsearch_eslib_spark.functions.codec import (
        decode_posting_block, encode_posting_blocks,
    )

    d = np.arange(1, 21) * 3
    t = np.arange(1, 21)
    dl = np.full(20, 7)
    blocks = encode_posting_blocks(d, t, dl, block_size=8)
    assert [b["n_docs"] for b in blocks] == [8, 8, 4]
    assert [b["block_max_tf"] for b in blocks] == [8, 16, 20]
    got = []
    for b in blocks:
        dd, tt, ll = decode_posting_block(
            b["first_doc"], b["doc_deltas"], b["tfs"], b["dls"])
        assert b["first_doc"] == dd[0] and b["last_doc"] == dd[-1]
        got.extend(dd.tolist())
    assert got == d.tolist()
