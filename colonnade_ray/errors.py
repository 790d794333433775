"""Error taxonomy — graft of the reference's ``SiphonError`` tree
(siphon/src/Siphon/Types.hs:35-59: row coordinate + RowError =
parse / per-cell decode / arity / header-resolution / encoding) and of
its human renderer ``humanizeSiphonError`` (siphon/src/Siphon.hs:474-544).

Engine coordinates are (fragment, chunk, column) instead of (row,
column): the unit of decode is a column chunk, and per-partition
lineage records carry these errors instead of aborting a stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


class ColonnadeError(Exception):
    """Base class for all engine errors."""


@dataclass
class HeaderIssue:
    """One column-binding diagnostic (missing / duplicate / type)."""

    column: str
    kind: str                       # "missing" | "duplicate" | "type_mismatch"
    detail: str = ""
    positions: tuple = ()           # physical indices involved


class SchemaBindError(ColonnadeError):
    """Accumulated (NOT fail-fast) plan-time binding failure — graft of
    ``headedToIndexed``'s EitherWrap applicative error accumulation
    (siphon/src/Siphon.hs:252-278, 546-558)."""

    def __init__(self, issues: list):
        self.issues = list(issues)
        super().__init__(self.humanize())

    def humanize(self) -> str:
        # graft of prettyHeadingErrors (siphon/src/Siphon.hs:505-525)
        lines = ["schema binding failed:"]
        for i in self.issues:
            if i.kind == "missing":
                lines.append(f"  column '{i.column}': missing from input schema")
            elif i.kind == "duplicate":
                lines.append(
                    f"  column '{i.column}': duplicated at positions {list(i.positions)}"
                )
            else:
                lines.append(f"  column '{i.column}': {i.detail}")
        return "\n".join(lines)


@dataclass
class CellError:
    """Per-cell decode failure inside one chunk — graft of
    siphon/src/Siphon/Types.hs:49-53 (CellError content+column)."""

    column: str
    row: int                        # row offset within the chunk
    content: str
    reason: str = ""


class ChunkDecodeError(ColonnadeError):
    """Decode failure of one column chunk, with coordinates — graft of
    RowErrorDecode (siphon/src/Siphon/Types.hs:41-44): errors
    accumulate across columns, not fail-fast."""

    def __init__(self, fragment: str, chunk_id: str, cell_errors: list):
        self.fragment = fragment
        self.chunk_id = chunk_id
        self.cell_errors = list(cell_errors)
        msgs = "; ".join(
            f"{e.column}[row {e.row}]: {e.reason} ({e.content!r})"
            for e in self.cell_errors[:5]
        )
        more = f" (+{len(self.cell_errors)-5} more)" if len(self.cell_errors) > 5 else ""
        super().__init__(f"decode failed in fragment={fragment} chunk={chunk_id}: {msgs}{more}")


class ChecksumError(ColonnadeError):
    """Payload checksum mismatch (lineage checksum vs recomputed)."""

    def __init__(self, fragment: str, chunk_id: str, expected: str, actual: str):
        self.fragment, self.chunk_id = fragment, chunk_id
        super().__init__(
            f"checksum mismatch fragment={fragment} chunk={chunk_id}: "
            f"expected {expected[:12]} got {actual[:12]}"
        )


class ArityError(ColonnadeError):
    """Batch schema shape differs from the bound plan — graft of the
    per-row arity check (siphon/src/Siphon.hs:671-676)."""
