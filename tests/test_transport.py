"""Shuffle-transport narrowing (stages/transport.py): footer-driven
width selection, null-correct pack/unpack, and bit-transparency
through the encode pipeline."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colonnade_ray.stages.transport import (
    TRANSPORT_PREFIX,
    list_transport_spec,
    pack_list_columns,
    unpack_list_columns,
)


def _doc_table(n=500, vocab=50_000, seed=0, with_nulls=True, with_empty=True):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if with_nulls and i % 37 == 0:
            rows.append(None)
        elif with_empty and i % 50 == 0:
            rows.append([])
        else:
            rows.append(rng.integers(0, vocab, rng.integers(1, 30)).tolist())
    la = pa.array(rows, type=pa.list_(pa.int32()))
    return pa.table({"doc_id": [f"d{i}" for i in range(n)], "tokens": la})


SPEC16 = {"tokens": {"width": 2, "src": "uint16", "orig": "int32"}}


def test_pack_unpack_roundtrip_with_nulls_and_slices():
    t = _doc_table()
    p = pack_list_columns(t, SPEC16)
    assert TRANSPORT_PREFIX + "tokens" in p.column_names
    assert "tokens" not in p.column_names
    # simulate shuffle: slice + reconcat out of order
    shuffled = pa.concat_tables([p.slice(100, 57), p.slice(3, 11), p.slice(400, 100)])
    expect = pa.concat_tables([t.slice(100, 57), t.slice(3, 11), t.slice(400, 100)])
    u = unpack_list_columns(shuffled, SPEC16)
    assert u["tokens"].combine_chunks().equals(expect["tokens"].combine_chunks())


def test_pack_unpack_empty_batch():
    t = _doc_table(n=2, with_nulls=False)
    u = unpack_list_columns(pack_list_columns(t, SPEC16).slice(0, 0), SPEC16)
    assert len(u) == 0 and "tokens" in u.column_names


def test_spec_from_footer_stats(tmp_path):
    t = _doc_table(with_nulls=False, with_empty=False)
    f = str(tmp_path / "a.parquet")
    pq.write_table(t, f)
    spec = list_transport_spec([f])
    assert spec == {"tokens": {"width": 2, "src": "uint16", "orig": "int32"}}
    # uint8-narrow and int64->uint32 cases
    la8 = pa.array([[1, 2, 255], [0, 7]], type=pa.list_(pa.int32()))
    f8 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"small": la8}), f8)
    assert list_transport_spec([f8])["small"]["width"] == 1
    la64 = pa.array([[1, 2, 70_000]], type=pa.list_(pa.int64()))
    f64 = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"big": la64}), f64)
    assert list_transport_spec([f64])["big"] == {
        "width": 4, "src": "uint32", "orig": "int64"
    }
    # negative values: no narrowing
    lan = pa.array([[-1, 5]], type=pa.list_(pa.int32()))
    fn = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"neg": lan}), fn)
    assert "neg" not in list_transport_spec([fn])


def test_spec_disqualifies_any_leaf_nulls(tmp_path):
    """Footer null_count conflates null lists / empty lists / null
    ELEMENTS; only null_count == 0 proves narrowing is lossless, so any
    nonzero count must disqualify (null elements would corrupt the
    astype: NaN -> garbage)."""
    for name, rows in {
        "nullelem": [[1, None, 3], [4, 5]],
        "nulllist": [[1, 2], None, [3]],
        "emptylist": [[1, 2], [], [3]],
    }.items():
        la = pa.array(rows, type=pa.list_(pa.int32()))
        f = str(tmp_path / f"{name}.parquet")
        pq.write_table(pa.table({name: la}), f)
        assert name not in list_transport_spec([f]), name


def test_pack_identity_on_null_elements():
    """Hand-built spec over a column with null ELEMENTS: pack must fall
    back to identity (not silently turn [1,2,None] into [1,2,0])."""
    la = pa.array([[1, 2, None], [7]], type=pa.list_(pa.int32()))
    t = pa.table({"tokens": la})
    p = pack_list_columns(t, SPEC16)
    assert "tokens" in p.column_names
    assert TRANSPORT_PREFIX + "tokens" not in p.column_names
    assert p["tokens"].combine_chunks().equals(la)


def test_spec_shrinks_transport_bytes(tmp_path):
    t = _doc_table(with_nulls=False)
    p = pack_list_columns(t, SPEC16)
    assert p.nbytes < t.nbytes * 0.66  # ~2x on the dominant column


def test_encode_corpus_transport_bit_identical(ray_session, tmp_path):
    """Flagship integration: corpus encoded with transport narrowing
    decodes bit-identically (order-free digest) to the raw input."""
    import ray.data as rd

    from colonnade_ray.corpus import tokenized_documents
    from colonnade_ray.pipelines import decode_corpus, encode_corpus, roundtrip_verify

    inp = str(tmp_path / "inp")
    tokenized_documents("/root/testdata/sf0.001").write_parquet(inp)
    out = str(tmp_path / "out")
    s = encode_corpus(inp, out, batch_size=512, partition_by="source",
                      resume=False, transport=True)
    assert s["rows"] == 500
    res = roundtrip_verify(
        rd.read_parquet(inp), decode_corpus(out), ["doc_id", "tokens", "n_tok", "source"]
    )
    assert res["match"]


# ---------------------------------------------------------------------------
# Property tests (hypothesis): pack/unpack is the identity for any
# valid (values, widths, nulls, slices) combination


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


@pytest.mark.skipif(not HAVE_HYP, reason="hypothesis not installed")
@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(min_value=0, max_value=65535), max_size=40),
        ),
        max_size=60,
    ),
    width=st.sampled_from([1, 2, 4]),
    a=st.integers(min_value=0, max_value=20),
    ln=st.integers(min_value=0, max_value=60),
)
def test_transport_roundtrip_property(data, width, a, ln):
    hi = (1 << (8 * width)) - 1
    rows = [None if r is None else [min(v, hi) for v in r] for r in data]
    la = pa.array(rows, type=pa.list_(pa.int32()))
    t = pa.table({"tokens": la})
    spec = {
        "tokens": {
            "width": width,
            "src": {1: "uint8", 2: "uint16", 4: "uint32"}[width],
            "orig": "int32",
        }
    }
    p = pack_list_columns(t, spec)
    sl = p.slice(min(a, len(p)), ln)
    exp = t.slice(min(a, len(t)), ln)
    u = unpack_list_columns(sl, spec)
    assert u["tokens"].combine_chunks().equals(exp["tokens"].combine_chunks())
