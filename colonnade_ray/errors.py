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
        """Graft of the Missing-Headers branch of humanizeSiphonError:
        prettyNamedMissingHeaders ("The header X was missing.") and
        prettyHeadingErrors ("The header [x] appears in columns A, B")
        (siphon/src/Siphon.hs:497-541), with column-letter coordinates
        from ``column_letters``."""
        lines = ["Error Category: Missing Headers"]
        for i in self.issues:
            if i.kind == "missing":
                lines.append(f"  The header {i.column} was missing.")
            elif i.kind == "duplicate":
                cols = ", ".join(column_letters(p) for p in i.positions)
                lines.append(
                    f"  The header [{i.column}] appears in columns {cols}"
                )
            else:
                lines.append(f"  Column {i.column}: {i.detail}")
        return "\n".join(lines)


def column_letters(i: int) -> str:
    """Spreadsheet-style column coordinate — graft of
    ``columnNumToLetters`` (siphon/src/Siphon.hs:543-546): 0 -> "A"
    ... 24 -> "Y" exactly as the reference renders.  Deliberate
    deviation: the reference punts past Y ("Beyond Z. Fix this.");
    this engine routinely decodes wider tables, so indices >= 25
    continue in standard bijective base-26 (25 -> "Z", 26 -> "AA")."""
    if i < 0:
        return "?"
    letters = ""
    n = i + 1
    while n:
        n, r = divmod(n - 1, 26)
        letters = chr(65 + r) + letters
    return letters


@dataclass
class CellError:
    """Per-cell decode failure inside one chunk — graft of
    siphon/src/Siphon/Types.hs:49-53 (CellError content+column).
    ``col_index`` (when known from the bound plan) drives the
    column-letter coordinate in the pretty renderer."""

    column: str
    row: int                        # row offset within the chunk
    content: str
    reason: str = ""
    col_index: Optional[int] = None


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

    def humanize(self) -> str:
        """Multi-line pretty report — graft of ``humanizeSiphonError``
        + ``prettyCellErrors`` (siphon/src/Siphon.hs:474-544,505-515):
        a coordinate header, an error category line, then one block per
        failed cell with its column-letter coordinate, content length,
        and content ("[empty cell]" for empty, like the reference)."""
        lines = [
            f"Decolonnade error in fragment {self.fragment}, "
            f"chunk {self.chunk_id}.",
            "Error Category: Cell Decolonnade",
        ]
        blocks: list = []
        for e in self.cell_errors:
            coord = (
                column_letters(e.col_index)
                if e.col_index is not None
                else e.column
            )
            blocks.extend(
                [
                    "-----------",
                    f"Column {coord} (row {e.row})",
                    f"Cell Content Length: {len(e.content)}",
                    "Cell Content: "
                    + (e.content if e.content else "[empty cell]"),
                ]
                + ([f"Reason: {e.reason}"] if e.reason else [])
            )
        # prettyCellErrors drops the leading separator (drop 1)
        return "\n".join(lines + ["  " + b for b in blocks[1:]])


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
