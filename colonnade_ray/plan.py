"""Codec plans: declared column bindings resolved against physical
schemas at plan time.

Graft of the reference's table encoder ``Colonnade`` — an ordered
vector of named column encoders built once and folded over many times
(colonnade/src/Colonnade/Encode.hs:560-569) — and of
``headedToIndexed``: declared headers are matched against the actual
header row, rewriting the plan into positional form with *accumulated*
missing/duplicate diagnostics (siphon/src/Siphon.hs:252-278).

Headedness (colonnade/src/Colonnade/Encode.hs:499-525):
  - by_name  ≙ Headed   (bind by column name)
  - by_index ≙ Indexed  (bind by physical position, headerless payloads)
A bound plan is the ``Indexed`` form: every column carries its
physical index.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import pyarrow as pa

from .errors import HeaderIssue, SchemaBindError


@dataclass(frozen=True)
class ColumnPlan:
    """One declared column — the ``OneColonnade`` atom
    (colonnade/src/Colonnade/Encode.hs:530-534)."""

    name: Optional[str] = None      # Headed binding
    index: Optional[int] = None     # Indexed binding
    # optional codec constraints; None = auto-select per chunk
    forced_codec: Optional[str] = None
    expected_type: Optional[pa.DataType] = None

    def label(self) -> str:
        return self.name if self.name is not None else f"#{self.index}"


@dataclass(frozen=True)
class CodecPlan:
    """Ordered column plans.  Composition is concatenation — the
    Semigroup on Colonnade (colonnade/src/Colonnade/Encode.hs:575-577)."""

    columns: tuple = ()

    def __add__(self, other: "CodecPlan") -> "CodecPlan":
        return CodecPlan(self.columns + other.columns)

    @staticmethod
    def by_name(*names: str, **kw) -> "CodecPlan":
        return CodecPlan(tuple(ColumnPlan(name=n, **kw) for n in names))

    @staticmethod
    def by_index(*indices: int, **kw) -> "CodecPlan":
        return CodecPlan(tuple(ColumnPlan(index=i, **kw) for i in indices))

    @staticmethod
    def from_schema(schema: pa.Schema) -> "CodecPlan":
        """One ColumnPlan per physical column — graft of ``columns``
        dynamic fan-out (colonnade/src/Colonnade.hs:194-203)."""
        return CodecPlan(
            tuple(
                ColumnPlan(name=f.name, expected_type=f.type) for f in schema
            )
        )

    def rename(self, mapping: dict) -> "CodecPlan":
        """Header-only transform — graft of ``mapHeaderContent``
        (colonnade/src/Colonnade.hs:124-126)."""
        return CodecPlan(
            tuple(
                replace(c, name=mapping.get(c.name, c.name)) for c in self.columns
            )
        )

    def to_headless(self) -> "CodecPlan":
        """Drop names, keep indices — graft of ``toHeadless``
        (colonnade/src/Colonnade.hs:134-135); requires a bound plan."""
        if any(c.index is None for c in self.columns):
            raise ValueError("to_headless requires a bound (Indexed) plan")
        return CodecPlan(tuple(replace(c, name=None) for c in self.columns))


@dataclass(frozen=True)
class BoundColumn:
    plan: ColumnPlan
    index: int
    field: pa.Field


@dataclass(frozen=True)
class BoundPlan:
    columns: tuple
    schema: pa.Schema

    def names(self) -> list:
        return [b.field.name for b in self.columns]


def bind_plan(plan: CodecPlan, schema: pa.Schema) -> BoundPlan:
    """Resolve a declared plan against a physical schema.

    Accumulates ALL diagnostics before failing (missing, duplicate,
    index-out-of-range, type mismatch) — the applicative accumulation
    of headedToIndexed (siphon/src/Siphon.hs:252-278 + EitherWrap
    546-558), mirrored by FIXTURES.md F3 and the reference test
    siphon/test/Test.hs:123-138.
    """
    issues: list[HeaderIssue] = []
    bound: list[BoundColumn] = []
    names = schema.names
    for cp in plan.columns:
        if cp.name is not None:
            hits = [i for i, n in enumerate(names) if n == cp.name]
            if len(hits) == 0:
                issues.append(HeaderIssue(cp.name, "missing"))
                continue
            if len(hits) > 1:
                issues.append(HeaderIssue(cp.name, "duplicate", positions=tuple(hits)))
                continue
            idx = hits[0]
        elif cp.index is not None:
            if not (0 <= cp.index < len(names)):
                issues.append(
                    HeaderIssue(
                        cp.label(), "missing",
                        detail=f"index {cp.index} out of range (0..{len(names)-1})",
                    )
                )
                continue
            idx = cp.index
        else:
            issues.append(HeaderIssue("?", "missing", detail="plan column has neither name nor index"))
            continue
        f = schema.field(idx)
        if cp.expected_type is not None and f.type != cp.expected_type:
            issues.append(
                HeaderIssue(
                    f.name, "type_mismatch",
                    detail=f"expected {cp.expected_type}, found {f.type}",
                    positions=(idx,),
                )
            )
            continue
        bound.append(BoundColumn(cp, idx, f))
    if issues:
        raise SchemaBindError(issues)
    return BoundPlan(tuple(bound), schema)


# ---------------------------------------------------------------------------
# Plan sections — graft of the Cornice tiered-header tree
# (colonnade/src/Colonnade/Encode.hs:581-603: CorniceBase/CorniceCap
# with type-level depth).  A section tree groups column plans under
# named tiers; flattening either drops the tiers (``discard``,
# Encode.hs:273-277) or folds them into leaf names (``endow``,
# Encode.hs:279-286).  In the engine the tree shape becomes the
# partition-manifest section layout (SURVEY.md §2 T10-T14).


@dataclass(frozen=True)
class PlanSection:
    """One tier: a named group of column plans and/or sub-sections."""

    title: str
    children: tuple = ()  # of ColumnPlan | PlanSection

    def cap(self, title: str) -> "PlanSection":
        """Wrap under one more spanning tier — graft of ``recap``
        (colonnade/src/Colonnade.hs:324-325)."""
        return PlanSection(title, (self,))

    def discard(self) -> CodecPlan:
        """Flatten to the base plan, dropping tiers — graft of
        ``discard`` (Encode.hs:273-277)."""
        cols: list = []
        for c in self.children:
            if isinstance(c, PlanSection):
                cols.extend(c.discard().columns)
            else:
                cols.append(c)
        return CodecPlan(tuple(cols))

    def endow(self, sep: str = ".") -> CodecPlan:
        """Flatten by folding tier titles into leaf names — graft of
        ``endow`` (Encode.hs:279-286): group names prefix columns."""
        cols: list = []
        for c in self.children:
            if isinstance(c, PlanSection):
                for leaf in c.endow(sep).columns:
                    cols.append(
                        replace(leaf, name=f"{self.title}{sep}{leaf.name}")
                    )
            else:
                cols.append(replace(c, name=f"{self.title}{sep}{c.name}"))
        return CodecPlan(tuple(cols))

    def annotate(self) -> dict:
        """Leaf-count annotation per tier — graft of ``annotate``
        colspan counting (Encode.hs:301-315)."""
        total = 0
        subs = []
        for c in self.children:
            if isinstance(c, PlanSection):
                a = c.annotate()
                total += a["leaves"]
                subs.append(a)
            else:
                total += 1
        return {"title": self.title, "leaves": total, "sections": subs}


def cap(title: str, plan: CodecPlan) -> PlanSection:
    """Wrap a flat plan under one spanning tier — graft of ``cap``
    (colonnade/src/Colonnade.hs:289-290)."""
    return PlanSection(title, tuple(plan.columns))
