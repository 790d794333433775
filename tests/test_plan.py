"""Schema-resolution tests — FIXTURES.md F3, graft of the reference's
headedToIndexed tests (siphon/test/Test.hs:123-138): bind-by-name onto
shuffled schemas; missing/duplicate diagnostics accumulate (NOT
fail-fast, siphon/src/Siphon.hs:252-278)."""

import pyarrow as pa
import pytest

from colonnade_ray.errors import SchemaBindError
from colonnade_ray.plan import CodecPlan, bind_plan

F1 = ["doc_id", "tokens", "n_tok", "source"]


def _schema(names, types=None):
    types = types or [pa.string()] * len(names)
    return pa.schema(list(zip(names, types)))


def test_bind_shuffled_order():
    plan = CodecPlan.by_name(*F1)
    schema = _schema(["source", "n_tok", "doc_id", "tokens"])
    bound = bind_plan(plan, schema)
    assert [b.index for b in bound.columns] == [2, 3, 1, 0]
    assert bound.names() == F1


def test_bind_missing_column():
    plan = CodecPlan.by_name(*F1)
    schema = _schema(["doc_id", "tokens", "source"])  # n_tok missing
    with pytest.raises(SchemaBindError) as e:
        bind_plan(plan, schema)
    issues = e.value.issues
    assert len(issues) == 1 and issues[0].kind == "missing" and issues[0].column == "n_tok"
    assert "n_tok" in str(e.value)


def test_bind_duplicate_column():
    plan = CodecPlan.by_name(*F1)
    schema = _schema(["doc_id", "tokens", "n_tok", "source", "source"])
    with pytest.raises(SchemaBindError) as e:
        bind_plan(plan, schema)
    (issue,) = e.value.issues
    assert issue.kind == "duplicate" and issue.positions == (3, 4)


def test_bind_accumulates_multiple_errors():
    """Missing n_tok AND duplicate source reported in ONE pass."""
    plan = CodecPlan.by_name(*F1)
    schema = _schema(["doc_id", "tokens", "source", "source"])
    with pytest.raises(SchemaBindError) as e:
        bind_plan(plan, schema)
    kinds = sorted((i.column, i.kind) for i in e.value.issues)
    assert kinds == [("n_tok", "missing"), ("source", "duplicate")]


def test_bind_by_index_and_out_of_range():
    schema = _schema(["a", "b"])
    bound = bind_plan(CodecPlan.by_index(1, 0), schema)
    assert [b.index for b in bound.columns] == [1, 0]
    with pytest.raises(SchemaBindError):
        bind_plan(CodecPlan.by_index(5), schema)


def test_type_mismatch_diagnostic():
    plan = CodecPlan(
        tuple([*CodecPlan.by_name("doc_id").columns]),
    )
    import dataclasses

    cp = dataclasses.replace(plan.columns[0], expected_type=pa.int64())
    with pytest.raises(SchemaBindError) as e:
        bind_plan(CodecPlan((cp,)), _schema(["doc_id"]))
    assert e.value.issues[0].kind == "type_mismatch"


def test_plan_composition_and_rename():
    p = CodecPlan.by_name("a") + CodecPlan.by_name("b")
    assert [c.name for c in p.columns] == ["a", "b"]
    r = p.rename({"a": "x"})
    assert [c.name for c in r.columns] == ["x", "b"]


def test_from_schema_and_headless():
    schema = _schema(["a", "b"], [pa.int64(), pa.string()])
    p = CodecPlan.from_schema(schema)
    bound = bind_plan(p, schema)
    headless = CodecPlan(
        tuple(
            __import__("dataclasses").replace(b.plan, index=b.index) for b in bound.columns
        )
    ).to_headless()
    rebound = bind_plan(headless, schema)
    assert [b.index for b in rebound.columns] == [0, 1]


def test_cornice_sections():
    """T10-T14: cap/recap/discard/endow/annotate grafts."""
    from colonnade_ray.plan import PlanSection, cap

    ids = CodecPlan.by_name("doc_id")
    payload = CodecPlan.by_name("tokens", "n_tok")
    sec = PlanSection("corpus", (cap("ids", ids), cap("payload", payload)))
    # discard: flat base plan, original names (Encode.hs:273-277)
    assert [c.name for c in sec.discard().columns] == ["doc_id", "tokens", "n_tok"]
    # endow: tier titles folded into names (Encode.hs:279-286)
    assert [c.name for c in sec.endow().columns] == [
        "corpus.ids.doc_id", "corpus.payload.tokens", "corpus.payload.n_tok",
    ]
    # recap adds a tier (Colonnade.hs:324-325)
    capped = sec.cap("root")
    assert [c.name for c in capped.endow().columns][0] == "root.corpus.ids.doc_id"
    # annotate: per-tier leaf counts = colspan (Encode.hs:301-315)
    ann = sec.annotate()
    assert ann["leaves"] == 3
    assert [s["leaves"] for s in ann["sections"]] == [1, 2]
    # a discarded plan binds like any flat plan
    schema = _schema(["n_tok", "doc_id", "tokens"])
    bound = bind_plan(sec.discard(), schema)
    assert [b.index for b in bound.columns] == [1, 2, 0]


def test_column_letters_reference_range_and_extension():
    """columnNumToLetters graft (siphon/src/Siphon.hs:543-546): 0..24
    match the reference letter-for-letter; beyond Y this engine extends
    in bijective base-26 instead of the reference's punt string."""
    from colonnade_ray.errors import column_letters

    assert [column_letters(i) for i in range(5)] == ["A", "B", "C", "D", "E"]
    assert column_letters(24) == "Y"
    assert column_letters(25) == "Z"
    assert column_letters(26) == "AA"
    assert column_letters(27 * 26 - 1) == "ZZ"
    assert column_letters(-1) == "?"


def test_humanize_cell_errors_golden():
    """prettyCellErrors graft (siphon/src/Siphon.hs:505-515): category
    header, per-cell blocks with column letters, content length, and
    the [empty cell] marker; the FIRST separator is dropped like the
    reference's `drop 1`."""
    from colonnade_ray.errors import CellError, ChunkDecodeError

    err = ChunkDecodeError(
        "frag-0", "c12",
        [
            CellError("price", 3, "12,50", reason="invalid int", col_index=2),
            CellError("name", 7, "", col_index=0),
        ],
    )
    out = err.humanize()
    lines = out.splitlines()
    assert lines[0] == "Decolonnade error in fragment frag-0, chunk c12."
    assert lines[1] == "Error Category: Cell Decolonnade"
    assert "  Column C (row 3)" in lines
    assert "  Cell Content Length: 5" in lines
    assert "  Cell Content: 12,50" in lines
    assert "  Column A (row 7)" in lines
    assert "  Cell Content: [empty cell]" in lines
    # drop-1: exactly one separator (between the two cells), not two
    assert sum(1 for ln in lines if ln.strip() == "-----------") == 1


def test_humanize_header_issues_golden():
    """Missing-Headers branch graft (siphon/src/Siphon.hs:497-541):
    'The header X was missing.' and duplicate headers rendered with
    column-letter coordinate lists."""
    from colonnade_ray.errors import HeaderIssue, SchemaBindError

    e = SchemaBindError(
        [
            HeaderIssue("n_tok", "missing"),
            HeaderIssue("source", "duplicate", positions=(1, 3)),
        ]
    )
    out = e.humanize()
    assert "Error Category: Missing Headers" in out
    assert "The header n_tok was missing." in out
    assert "The header [source] appears in columns B, D" in out
