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
               table_attrs: str = "", row_attrs=None, cell_attrs=None,
               thead_attrs: str = "", tbody_attrs: str = "") -> str:
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

    ``row_attrs`` is a ``row_dict -> str`` hook stamping attributes on
    each ``<tr>`` — the ``(a -> Attribute)`` argument of
    ``encodeTable``/``encodeBody`` (blaze-colonnade:400-434);
    ``cell_attrs`` is a ``(col_name, row_dict) -> str`` hook stamping
    attributes on each ``<td>`` — the ``Cell`` content+attribute pair
    of ``encodeCellTable``/``htmlFromCell`` (blaze-colonnade:263-300,
    414-439).  ``thead_attrs``/``tbody_attrs`` complete
    ``encodeTable``'s attribute surface.
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

    def _sp(a: str) -> str:
        return f" {a}" if a else ""

    out = [f"<table{_sp(table_attrs)}>", f"  <thead{_sp(thead_attrs)}>",
           "    <tr>"]
    for n in names:
        out.append(f"      <th>{_html_escape(str(n))}</th>")
    out += ["    </tr>", "  </thead>", f"  <tbody{_sp(tbody_attrs)}>"]

    def tr(r) -> list:
        cells = [
            f"      <td{_sp(cell_attrs(n, r) if cell_attrs else '')}>"
            f"{_html_escape(_cell(r.get(n)))}</td>" for n in names
        ]
        return [f"    <tr{_sp(row_attrs(r) if row_attrs else '')}>"] \
            + cells + ["    </tr>"]

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


# ------------------------------------------------------- S10 row-explode

def explode_definitions(ds, id_col: str, columns: Optional[list] = None):
    """Row-explode a Dataset into (id, ord, key, value) definition
    records — the Dataset-level graft of the reference's
    one-row-to-many-items encoders ``encodeDefinitionTable`` /
    ``encodeListItems`` (yesod-colonnade/src/Yesod/Colonnade.hs:99-131):
    each input row becomes one record per exploded column, key = the
    column header, value = the rendered cell content, ``ord`` = the
    column's position so a renderer can reassemble header order.

    Vectorized melt: per Arrow batch, k column-cast passes + one
    row-major ravel (numpy), no per-row Python except the ``_cell``
    fallback for binary/list debug renders.  Streams — nothing
    materializes; feed the result to write_parquet / a renderer."""
    import numpy as np

    def melt(batch: pa.Table) -> pa.Table:
        cols = list(columns) if columns else \
            [c for c in batch.column_names if c != id_col]
        n, k = batch.num_rows, len(cols)
        vals = np.empty((n, k), dtype=object)
        for j, c in enumerate(cols):
            col = batch[c]
            try:
                import pyarrow.compute as pc
                vals[:, j] = np.asarray(
                    pc.cast(col, pa.string()).to_pylist(), dtype=object)
            except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                vals[:, j] = np.asarray(
                    [_cell(v) for v in col.to_pylist()], dtype=object)
        ids = np.repeat(
            np.asarray(batch[id_col].to_pylist(), dtype=object), k)
        return pa.table({
            id_col: pa.array(ids),
            "ord": pa.array(np.tile(np.arange(k, dtype=np.int32), n)),
            "key": pa.array(np.tile(np.asarray(cols, dtype=object), n),
                            pa.string()),
            "value": pa.array(vals.ravel(), pa.string()),
        })

    return ds.map_batches(melt, batch_format="pyarrow")


def definition_table(row: dict, table_attrs: str = "",
                     columns: Optional[list] = None) -> str:
    """Two-column (header, value) HTML table for ONE row, no <thead> —
    the literal graft of ``encodeDefinitionTable``
    (yesod-colonnade/src/Yesod/Colonnade.hs:116-131)."""
    cols = list(columns) if columns else list(row.keys())
    attrs = f" {table_attrs}" if table_attrs else ""
    out = [f"<table{attrs}>", "  <tbody>"]
    for c in cols:
        out += ["    <tr>",
                f"      <td>{_html_escape(str(c))}</td>",
                f"      <td>{_html_escape(_cell(row.get(c)))}</td>",
                "    </tr>"]
    out += ["  </tbody>", "</table>"]
    return "\n".join(out)


def list_items(row: dict, columns: Optional[list] = None,
               ul_attrs: str = "", li_attrs=None,
               combine=lambda h, v: f"{h}: {v}") -> str:
    """<ul><li>header: value</li>...</ul> for ONE row — graft of
    ``encodeListItems`` (yesod-colonnade/src/Yesod/Colonnade.hs:99-114);
    ``li_attrs`` is a per-item ``(col, row) -> str`` hook (the
    header<>data attribute concatenation) and ``combine`` merges header
    and cell content exactly as the reference's combiner argument."""
    cols = list(columns) if columns else list(row.keys())
    attrs = f" {ul_attrs}" if ul_attrs else ""
    out = [f"<ul{attrs}>"]
    for c in cols:
        la = li_attrs(c, row) if li_attrs else ""
        la = f" {la}" if la else ""
        body = combine(_html_escape(str(c)), _html_escape(_cell(row.get(c))))
        out.append(f"  <li{la}>{body}</li>")
    out.append("</ul>")
    return "\n".join(out)
