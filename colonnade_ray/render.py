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


def _remove_whitespace_after_tag(html: str, chosen: str) -> str:
    """Strip whitespace that appears while ``chosen`` is the innermost
    open tag — a faithful port of ``removeWhitespaceAfterTag``'s
    six-state machine (blaze-colonnade/src/Text/Blaze/Colonnade.hs:
    441-496), including its tag-context stack and the mismatched- /
    unopened-closing-tag errors (raised here as ValueError)."""
    NORMAL, SOMETAG, OPENING, OPENING_ATTRS, CLOSING, AFTER = range(6)
    ctx: list = []
    state = NORMAL
    tag = ""
    res: list = []
    for c in html:
        keep = True
        if state == NORMAL or state == AFTER:
            if c == "<":
                state = SOMETAG
            elif c.isspace() and ctx and ctx[-1] == chosen:
                keep = False  # drop whitespace inside the chosen tag
            else:
                state = NORMAL
        elif state == SOMETAG:
            if c == "/":
                state, tag = CLOSING, ""
            elif c in "<>":
                raise ValueError(f"unexpected {c!r} inside tag")
            else:
                state, tag = OPENING, c
        elif state == OPENING:
            if c == ">":
                ctx.append(tag)
                state = AFTER
            elif c.isspace():
                ctx.append(tag)
                state = OPENING_ATTRS
            else:
                tag += c
        elif state == OPENING_ATTRS:
            if c == ">":
                state = AFTER
        elif state == CLOSING:
            if c == ">":
                if not ctx:
                    raise ValueError("closing tag without any opening tag")
                if ctx[-1] != tag:
                    raise ValueError(
                        f"closing tag <{tag}> did not match opening tag <{ctx[-1]}>"
                    )
                ctx.pop()
                state = AFTER
            else:
                tag += c
        if keep:
            res.append(c)
    return "".join(res)


_COMPACT_TAGS = ("td", "th", "strong", "span", "em")


def compact_html(html: str) -> str:
    """S12 graft of ``printCompactHtml`` (blaze-colonnade:504-512):
    strip whitespace inside <td>/<th>/<strong>/<span>/<em>; returns the
    string (the reference prints it) with trailing newlines dropped."""
    for t in _COMPACT_TAGS:
        html = _remove_whitespace_after_tag(html, t)
    return html.rstrip("\n")


def very_compact_html(html: str) -> str:
    """S12 graft of ``printVeryCompactHtml`` (blaze-colonnade:516-524):
    ``compact_html`` plus whitespace inside <tr> elements."""
    for t in _COMPACT_TAGS + ("tr",):
        html = _remove_whitespace_after_tag(html, t)
    return html.rstrip("\n")
