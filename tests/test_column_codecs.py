"""Column-chunk round-trip tests over Arrow arrays — the engine-level
graft of propIsoStream (siphon/test/Test.hs:262-276): decode(encode(col))
must equal col bit-identically, nulls included (FIXTURES.md F1/F2)."""

import numpy as np
import pyarrow as pa
import pytest

from colonnade_ray.codecs import FsstCodec, decode_column, encode_column, train_merges
from colonnade_ray.codecs.base import Encoded

RNG = np.random.default_rng(42)


def _tokens_array(n_rows=300, seed=7):
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.lognormal(5.0, 1.0, n_rows), 0, 4000).astype(int)
    return pa.array(
        [list((rng.zipf(1.3, int(l)) % 50000).astype(np.int32)) for l in lens],
        pa.list_(pa.int32()),
    )


COLUMNS = {
    "doc_id_prefixed": pa.array([f"doc-{i:08d}" for i in range(2000)]),
    "source_lowcard": pa.array([f"src{i % 8}" for i in range(2000)]),
    "source_skewed": pa.array(
        ["src0" if i % 10 < 6 else f"src{i % 8}" for i in range(2000)]
    ),
    "strings_nulls": pa.array([None if i % 17 == 0 else f"s{i % 5}" for i in range(500)]),
    "strings_unicode": pa.array(["日本語テキスト№%d" % i for i in range(100)] * 3),
    "strings_empty_cells": pa.array(["", "a", "", "bb", ""] * 50),
    "string_empty_array": pa.array([], pa.string()),
    "all_null_strings": pa.array([None, None, None], pa.string()),
    "binary": pa.array([bytes([i % 256, 255 - i % 256]) for i in range(300)], pa.binary()),
    "int32": pa.array(RNG.integers(0, 2**16, 1000).astype(np.int32)),
    "int_nulls": pa.array([None if i % 3 == 0 else i * 7 for i in range(400)], pa.int64()),
    "floats": pa.array(RNG.normal(size=400)),
    "float_nulls": pa.array([None if i % 5 == 0 else float(i) for i in range(100)], pa.float64()),
    "bools": pa.array((RNG.integers(0, 2, 400) > 0).tolist()),
    "timestamps": pa.array(np.arange(500) * 10**6, pa.timestamp("us")),
    "tokens": _tokens_array(),
    "tokens_edges": pa.array(
        [[], [1], [7] * 1000, list(range(100, 200)), None, [0, 2**31 - 1, 5]],
        pa.list_(pa.int32()),
    ),
    "tokens_empty": pa.array([], pa.list_(pa.int32())),
    "date32_nulls": pa.array(
        [18000 + i if i % 3 else None for i in range(300)], pa.date32()
    ),
    "uint64_high_nulls": pa.array(
        [2**63 + i if i % 5 else None for i in range(200)], pa.uint64()
    ),
    "one_huge_row": pa.array([list(range(1_000_000))], pa.list_(pa.int32())),
    "list_int64": pa.array([[2**40, -5], [], [0]], pa.list_(pa.int64())),
    "decimal_narrow_nulls": pa.array(
        ["12.3456", None, "-7.0001", "0.0000"], pa.string()
    ).cast(pa.decimal128(9, 4)),
    "decimal_wide": pa.array([10**30, None, -(10**33)], pa.decimal128(38, 0)),
    "decimal_all_null": pa.array([None, None], pa.decimal128(18, 3)),
    "time32_nulls": pa.array(
        [None if i % 5 == 0 else (i * 37) % 86_400 for i in range(200)], pa.time32("s")
    ),
    "time64_us": pa.array([3_723_000_500, None], pa.time64("us")),
    "duration_ms": pa.array([1000, None, -5, 0], pa.duration("ms")),
}


@pytest.mark.parametrize("name", sorted(COLUMNS))
def test_column_roundtrip(name):
    arr = COLUMNS[name]
    payload, meta = encode_column(arr)
    back = decode_column(payload, meta)
    assert back.type == arr.type
    assert back.equals(arr), f"{name}: {arr.slice(0, 5)} != {back.slice(0, 5)}"


@pytest.mark.parametrize("name", ["doc_id_prefixed", "tokens", "source_lowcard"])
def test_column_encode_deterministic(name):
    arr = COLUMNS[name]
    p1, m1 = encode_column(arr)
    p2, m2 = encode_column(arr)
    assert p1 == p2 and m1 == m2


def test_chunked_array_roundtrip():
    ch = pa.chunked_array([["a", "b"], ["c"], ["dddd"]])
    payload, meta = encode_column(ch)
    back = decode_column(payload, meta)
    assert back.equals(ch.combine_chunks())


def test_compresses_prefixed_ids():
    arr = COLUMNS["doc_id_prefixed"]
    payload, _ = encode_column(arr)
    assert len(payload) < 0.4 * arr.nbytes  # fsst must bite on shared prefixes


def test_compresses_lowcard_strings():
    arr = COLUMNS["source_lowcard"]
    payload, _ = encode_column(arr)
    assert len(payload) < 0.15 * arr.nbytes  # dict path


def test_compresses_tokens_below_plain():
    arr = COLUMNS["tokens"]
    payload, _ = encode_column(arr)
    n_values = len(arr.flatten())
    assert len(payload) < 4 * n_values  # strictly below 4 B/token plain


def test_sliced_array_roundtrip():
    """Arrow slices carry a nonzero offset — buffers must be rebased."""
    base = pa.array([f"val-{i}" for i in range(100)])
    sl = base.slice(13, 50)
    payload, meta = encode_column(sl)
    assert decode_column(payload, meta).equals(pa.array(sl.to_pylist()))
    base_l = _tokens_array(50)
    sll = base_l.slice(7, 20)
    payload, meta = encode_column(sll)
    assert decode_column(payload, meta).equals(
        pa.array(sll.to_pylist(), pa.list_(pa.int32()))
    )


def test_fsst_blob_roundtrip():
    data = "".join(f"doc-{i:08d}" for i in range(3000)).encode()
    codec = FsstCodec()
    enc = codec.encode(data, sample=data[:65536])
    back = codec.decode(Encoded.unpack("fsst", enc.meta, enc.pack()))
    assert back == data
    assert enc.nbytes() < 0.35 * len(data)


def test_fsst_incompressible():
    data = RNG.integers(0, 256, 5000).astype(np.uint8).tobytes()
    codec = FsstCodec()
    enc = codec.encode(data, sample=data)
    back = codec.decode(Encoded.unpack("fsst", enc.meta, enc.pack()))
    assert back == data


def test_fsst_shared_table():
    """Encoder actors reuse a trained table across batches: decode must
    not need the trainer, only the merges recorded in meta."""
    sample = b"abcabcabcabc" * 100
    merges = train_merges(sample)
    codec = FsstCodec(merges)
    data = b"xyzabcabc" * 50
    enc = codec.encode(data)
    assert FsstCodec().decode(Encoded.unpack("fsst", enc.meta, enc.pack())) == data


def test_alp_compresses_prices():
    """ALP decimal scaling: 2-decimal doubles (price columns) store as
    scaled integers through the int cascade — far below byte planes."""
    rng = np.random.default_rng(3)
    arr = pa.array(np.round(rng.uniform(900, 105000, 20000), 2))
    payload, meta = encode_column(arr)
    assert decode_column(payload, meta).equals(arr)
    assert meta["streams"]["values"]["codec"] == "alp"
    assert meta["streams"]["values"]["meta"]["e"] == 2
    assert len(payload) < 0.45 * arr.nbytes  # ~24-bit ints vs 64-bit raw


def test_alp_bit_exact_roundtrip_float64():
    rng = np.random.default_rng(11)
    vals = np.round(rng.normal(0, 1e6, 5000), 4)
    vals[::7] = -vals[::7]
    arr = pa.array(vals)
    payload, meta = encode_column(arr)
    back = decode_column(payload, meta).to_numpy(zero_copy_only=False)
    assert np.array_equal(vals.view(np.uint64), back.view(np.uint64))
    assert meta["streams"]["values"]["codec"] == "alp"


def test_alp_float32_and_negative_zero_fallback():
    rng = np.random.default_rng(5)
    # range bounded away from 0 so rounding cannot produce -0.0 (which
    # correctly forces the planes fallback, asserted below)
    f32 = (np.round(rng.uniform(10, 50, 4096), 1)
           * np.where(np.arange(4096) % 2 == 0, -1.0, 1.0)).astype(np.float32)
    arr = pa.array(f32, pa.float32())
    payload, meta = encode_column(arr)
    back = decode_column(payload, meta).to_numpy(zero_copy_only=False)
    assert np.array_equal(f32.view(np.uint32), back.view(np.uint32))
    assert meta["streams"]["values"]["codec"] == "alp"
    # -0.0 cannot survive the integer reconstruction: must NOT pick alp
    nz = np.where(np.arange(4096) % 3 == 0, -0.0, 0.0)
    pm = encode_column(pa.array(nz))
    back2 = decode_column(pm[0], pm[1]).to_numpy(zero_copy_only=False)
    assert np.array_equal(nz.view(np.uint64), back2.view(np.uint64))
    assert pm[1]["streams"]["values"]["codec"] != "alp"


def test_float_plane_split_still_selected_for_nondecimal():
    """Non-decimal bounded doubles (no 10^e scaling round-trips) keep
    the BtrBlocks byte-plane path via its low-entropy exponent planes."""
    rng = np.random.default_rng(3)
    arr = pa.array(rng.uniform(900, 105000, 20000) * np.pi)
    payload, meta = encode_column(arr)
    assert decode_column(payload, meta).equals(arr)
    assert meta["streams"]["values"]["codec"] == "float_planes"
    assert len(payload) < 0.95 * arr.nbytes


def test_float_planes_nan_inf_exact():
    vals = [0.0, -0.0, float("nan"), float("inf"), float("-inf"), 1e-300, 1e300] * 20
    arr = pa.array(vals, pa.float64())
    payload, meta = encode_column(arr)
    back = decode_column(payload, meta)
    # NaN != NaN under equals? arrow equals treats NaN as equal at array level
    import numpy as np

    a = arr.to_numpy(zero_copy_only=False)
    b = back.to_numpy(zero_copy_only=False)
    assert np.array_equal(a.view(np.uint64), b.view(np.uint64))  # bit-identical


def test_large_list_and_large_string_roundtrip():
    """Blocks from other engines (e.g. polars-sorted) arrive as
    large_list/large_string; the router must round-trip them with the
    type preserved."""
    ll = pa.array([[1, 2, 3], [], [7] * 50, None], pa.large_list(pa.int32()))
    payload, meta = encode_column(ll)
    back = decode_column(payload, meta)
    assert back.type == ll.type and back.equals(ll)
    ls = pa.array(["alpha", None, "", "omega" * 40], pa.large_string())
    payload, meta = encode_column(ls)
    back = decode_column(payload, meta)
    assert back.type == ls.type and back.equals(ls)


def test_string_pattern_strategy_sequential_ids():
    """Prefixed-integer id columns encode as prefix + delta-coded int
    stream (strategy 'pattern'), orders of magnitude under FSST."""
    from colonnade_ray.codecs import decode_column, encode_column

    ids = pa.array([f"doc-{i:010d}" for i in range(10_000)])
    p, m = encode_column(ids)
    assert m["strategy"] == "pattern"
    assert len(p) < 5_000  # ~0.25 B/row vs ~14 B/row raw
    assert decode_column(p, m).equals(ids)


def test_string_pattern_strategy_edges():
    from colonnade_ray.codecs import decode_column, encode_column

    cases = [
        pa.array([f"{i:08d}" for i in range(5000, 6000)]),      # no prefix
        pa.array([f"doc-{i:010d}" for i in [5, 3, 9, 1, 1]]),   # dup + unsorted
    ]
    for arr in cases:
        p, m = encode_column(arr)
        assert m["strategy"] == "pattern", m["strategy"]
        assert decode_column(p, m).equals(arr)
    # NOT pattern: varlen, nulls, non-digit suffix, constant column
    for arr in [
        pa.array([f"doc-{i}" for i in range(100)]),
        pa.array(["doc-001", None, "doc-003"]),
        pa.array(["ab-x1", "ab-y2"]),
        pa.array(["same", "same", "same"]),
        pa.array(["x-001"]),  # single row: degenerate, stays raw
    ]:
        p, m = encode_column(arr)
        assert m.get("strategy") != "pattern"
        assert decode_column(p, m).equals(arr)


def test_pattern_ids_through_encode_stage():
    """The lineage codec summary must handle every string strategy
    (a pattern-id column once crashed _codec_of)."""
    import json

    from colonnade_ray.stages.decode import decode_batch
    from colonnade_ray.stages.encode import encode_batch

    t = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:010d}" for i in range(100)]),
            "tokens": pa.array([[1, 2, 3]] * 100, type=pa.list_(pa.int32())),
            "n_tok": pa.array([3] * 100, pa.int32()),
            "source": pa.array(["s"] * 100),
        }
    )
    enc = pa.table({k: pa.array(v) for k, v in encode_batch(t).items()})
    summary = json.loads(enc["codecs_json"][0].as_py())
    assert any(c.get("strategy") == "pattern" for c in summary)
    assert decode_batch(enc).equals(t)


def test_structural_types_roundtrip():
    """Round-2 type-coverage sweep: dictionary, struct (nested),
    fixed-size binary/list, date64, float16 — all bit-identical."""
    from colonnade_ray.codecs import decode_column, encode_column

    cases = [
        pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "z"}],
                 pa.struct([("a", pa.int32()), ("b", pa.string())])),
        pa.array([{"p": [1, 2], "q": {"r": 5}}],
                 pa.struct([("p", pa.list_(pa.int32())),
                            ("q", pa.struct([("r", pa.int64())]))])),
        pa.array([b"abcd", None, b"efgh"], pa.binary(4)),
        pa.array([[1.0, 2.0], None, [3.0, 4.0]], pa.list_(pa.float32(), 2)),
        pa.array([86_400_000, None], pa.date64()),
        pa.array(["x", "y", None, "x"]).dictionary_encode(),
        pa.array([10, 20, 10]).dictionary_encode(),
        pa.array(np.array([1.5, -0.25], np.float16)),
        pa.array([np.float16(1.5), None]),
        pa.array([], pa.struct([("a", pa.int32())])),
    ]
    for arr in cases:
        p, m = encode_column(arr)
        back = decode_column(p, m)
        assert back.type == arr.type, (arr.type, back.type)
        assert back.equals(arr), arr.type


def test_decimal256_rejected_loudly():
    """decimal256 must raise TypeError, not silently round-trip wrong
    values through the 16-byte decimal128 buffer reader."""
    from colonnade_ray.codecs import encode_column
    from colonnade_ray.codecs.columns import type_to_desc

    arr = pa.array([45678, None], pa.decimal256(20, 2))
    with pytest.raises(TypeError, match="decimal"):
        encode_column(arr)
    with pytest.raises(TypeError, match="decimal"):
        type_to_desc(pa.decimal256(50, 2))


def test_lengths_ref_dedups_list_lengths_stream():
    """Cross-column dedup (stages/encode.py _lengths_ref_hints): when a
    sibling int column stores exactly the list column's per-row lengths
    (the corpus's n_tok == len(tokens) invariant), the list's lengths
    stream is a zero-byte reference and decode reconstructs offsets
    from the decoded sibling.  Graft note: the reference never stores
    the same value twice either — one OneColonnade per column, cells
    derived from the row (colonnade/src/Colonnade/Encode.hs:530-534)."""
    import json

    from colonnade_ray.stages.decode import decode_batch, decode_chunk_row
    from colonnade_ray.stages.encode import encode_batch

    t = pa.table(
        {
            "doc_id": pa.array([f"doc-{i:010d}" for i in range(200)]),
            "tokens": pa.array(
                [[j for j in range(i % 11)] for i in range(200)],
                type=pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([i % 11 for i in range(200)], pa.int32()),
            "source": pa.array(["s"] * 200),
        }
    )
    enc = pa.table({k: pa.array(v) for k, v in encode_batch(t).items()})
    summary = json.loads(enc["codecs_json"][0].as_py())
    assert summary[1]["lengths"] == "ref:n_tok", summary
    assert decode_batch(enc).equals(t)
    # projected decode of the list column alone still works: the ref
    # target is decoded from the chunk row without joining the result
    row = {c: enc[c][0].as_py() for c in enc.column_names}
    proj = decode_chunk_row(row, columns=["tokens"])
    assert proj.column_names == ["tokens"]
    assert proj["tokens"].combine_chunks().equals(t["tokens"].combine_chunks())


def test_lengths_ref_fallback_and_nulls():
    """No ref when values differ; ref still taken (and bit-identical)
    when the list column has nulls and the int column stores 0 there —
    fill_null(0) is exactly what the lengths stream would store."""
    import json

    from colonnade_ray.stages.decode import decode_batch
    from colonnade_ray.stages.encode import encode_batch

    base = {
        "doc_id": pa.array([f"d{i}" for i in range(60)]),
        "tokens": pa.array(
            [[1, 2, 3] if i % 5 else None for i in range(60)],
            type=pa.list_(pa.int32()),
        ),
        "source": pa.array(["s"] * 60),
    }
    # mismatching sibling: falls back to a real lengths stream
    t_bad = pa.table({**base, "n_tok": pa.array([7] * 60, pa.int32())})
    enc = pa.table({k: pa.array(v) for k, v in encode_batch(t_bad).items()})
    s = json.loads(enc["codecs_json"][0].as_py())
    tok = next(c for c in s if "values" in c and "lengths" in c)
    assert not str(tok["lengths"]).startswith("ref:")
    assert decode_batch(enc).equals(t_bad)
    # matching sibling with nulls in the LIST column
    t_ok = pa.table(
        {**base, "n_tok": pa.array([3 if i % 5 else 0 for i in range(60)], pa.int32())}
    )
    enc2 = pa.table({k: pa.array(v) for k, v in encode_batch(t_ok).items()})
    s2 = json.loads(enc2["codecs_json"][0].as_py())
    tok2 = next(c for c in s2 if "values" in c and "lengths" in c)
    assert tok2["lengths"] == "ref:n_tok"
    assert decode_batch(enc2).equals(t_ok)
    # a NULLABLE sibling is never a ref target (decode would need the
    # fill; keep the invariant simple and loud)
    t_null = pa.table(
        {**base,
         "n_tok": pa.array([3 if i % 5 else None for i in range(60)], pa.int32())}
    )
    enc3 = pa.table({k: pa.array(v) for k, v in encode_batch(t_null).items()})
    s3 = json.loads(enc3["codecs_json"][0].as_py())
    tok3 = next(c for c in s3 if "values" in c and "lengths" in c)
    assert not str(tok3["lengths"]).startswith("ref:")
    assert decode_batch(enc3).equals(t_null)
