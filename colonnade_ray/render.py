"""Debug render sinks — graft of the reference's ``ascii`` /
``asciiCapped`` (colonnade/src/Colonnade.hs:350-411, 327-347): a
two-pass measure-then-render ASCII table, self-documented there as a
ghci convenience — here a test/REPL convenience for small Datasets and
for lineage manifests.  The two-pass shape (size columns, then render
padded) is the same ``sizeColumns`` pattern the codec selector grafts.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def _cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bytes):
        return f"<{len(v)} bytes>"
    if isinstance(v, list):
        s = str(v)
        return s if len(s) <= 32 else s[:29] + "..."
    return str(v)


def ascii_table(data, limit: int = 20, sections: Optional[str] = None) -> str:
    """Render a small table/Dataset as an ASCII grid.

    ``sections=col`` renders grouped with full-width divider rows per
    group — graft of ``sectioned`` (lucid-colonnade/src/Lucid/
    Colonnade.hs:269-292) and ``asciiCapped``.
    """
    if not isinstance(data, (pa.Table, dict)) and hasattr(data, "take"):  # ray Dataset
        rows = data.take(limit)
        if not rows:
            return "(empty)"
        names = list(rows[0].keys())
    else:
        t = data if isinstance(data, pa.Table) else pa.table(data)
        t = t.slice(0, limit)
        names = t.column_names
        rows = t.to_pylist()

    if sections and sections in names:
        names = [n for n in names if n != sections]

    # pass 1: measure (sizeColumns graft — running max per column,
    # colonnade/src/Colonnade/Encode.hs:177-201)
    widths = {n: len(n) for n in names}
    for r in rows:
        for n in names:
            widths[n] = max(widths[n], len(_cell(r.get(n))))

    def rule() -> str:
        return "+" + "+".join("-" * (widths[n] + 2) for n in names) + "+"

    def line(vals) -> str:
        return "| " + " | ".join(str(v).ljust(widths[n]) for n, v in zip(names, vals)) + " |"

    # pass 2: render
    out = [rule(), line(names), rule()]
    if sections and rows and sections in rows[0]:
        total_w = len(rule())
        current = object()
        for r in rows:
            if r[sections] != current:
                current = r[sections]
                title = f"=== {sections}: {current} "
                out.append(title + "=" * max(total_w - len(title), 0))
            out.append(line([_cell(r.get(n)) for n in names]))
        out.append(rule())
    else:
        for r in rows:
            out.append(line([_cell(r.get(n)) for n in names]))
        out.append(rule())
    return "\n".join(out)


def _html_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def html_table(data, limit: int = 20, sections: Optional[str] = None,
               table_attrs: str = "") -> str:
    """Render a small table/Dataset as an HTML <table> — the S6/S7
    sink twin of ``ascii_table``.

    Graft of ``encodeHtmlTable`` (blaze-colonnade/src/Text/Blaze/
    Colonnade.hs:305-326): headers in <thead><th>, body rows in
    <tbody><td>.  ``sections=col`` renders grouped with a full-width
    divider row per group using ``colspan`` over the leaf columns —
    the Cornice annotation -> colspan semantics of
    ``encodeCappedTable`` (blaze-colonnade:362-399) and ``sectioned``
    (lucid-colonnade/src/Lucid/Colonnade.hs:269-292); colspan counts
    come from the flat column list exactly as ``annotate`` counts
    leaves (colonnade/src/Colonnade/Encode.hs:301-315).
    """
    if not isinstance(data, (pa.Table, dict)) and hasattr(data, "take"):  # ray Dataset
        rows = data.take(limit)
        names = list(rows[0].keys()) if rows else []
    else:
        t = data if isinstance(data, pa.Table) else pa.table(data)
        t = t.slice(0, limit)
        names = t.column_names
        rows = t.to_pylist()

    if sections and sections in names:
        names = [n for n in names if n != sections]

    attrs = f" {table_attrs}" if table_attrs else ""
    out = [f"<table{attrs}>", "  <thead>", "    <tr>"]
    for n in names:
        out.append(f"      <th>{_html_escape(str(n))}</th>")
    out += ["    </tr>", "  </thead>", "  <tbody>"]

    def tr(r) -> list:
        cells = [
            f"      <td>{_html_escape(_cell(r.get(n)))}</td>" for n in names
        ]
        return ["    <tr>"] + cells + ["    </tr>"]

    if sections and rows and sections in rows[0]:
        current = object()
        for r in rows:
            if r[sections] != current:
                current = r[sections]
                title = _html_escape(f"{sections}: {current}")
                # one spanning cell over all leaf columns (colspan =
                # leaf count, the annotate/Cornice cap semantics)
                out.append(
                    f'    <tr><td colspan="{len(names)}">{title}</td></tr>'
                )
            out.extend(tr(r))
    else:
        for r in rows:
            out.extend(tr(r))
    out += ["  </tbody>", "</table>"]
    return "\n".join(out)
