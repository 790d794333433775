"""Decode stage: encoded chunk rows -> original Arrow rows.

Dual of encode.py — the graft of the reference's ``Siphon`` decode
drivers (``consumeBody``/``uncheckedRun``, siphon/src/Siphon.hs:578-749):
per chunk, apply every column's decoder, validate shape, accumulate
errors with coordinates instead of failing fast.

Stateless: a chunk row is self-describing (meta JSON carries codec
parameters, FSST merges included), so decode tasks are pure and
retry-safe.
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

import pyarrow as pa

from ..codecs import decode_column
from ..errors import CellError, ChecksumError, ChunkDecodeError


def decode_chunk_row(row: dict, verify_checksum: bool = True) -> pa.Table:
    """One encoded row (python dict) -> Arrow table of n_rows rows.

    Codec-level failures (torn frames: payload truncated mid-varint /
    mid-bitpack, short string data) are ACCUMULATED across columns and
    re-raised as one ChunkDecodeError with (fragment, chunk, column)
    coordinates — the not-fail-fast error semantics of ``uncheckedRun``
    (siphon/src/Siphon.hs:718-749)."""
    names = json.loads(row["plan_json"])
    payloads = [row[f"col{i}_payload"] for i in range(len(names))]
    if verify_checksum:
        h = hashlib.blake2b(digest_size=16)
        for p in payloads:
            h.update(p)
        actual = h.hexdigest()
        if actual != row["checksum"]:
            raise ChecksumError(row.get("fragment", ""), row.get("chunk_id", ""),
                                row["checksum"], actual)
    arrays, fields = [], []
    cell_errors = []
    for i, name in enumerate(names):
        meta = json.loads(row[f"col{i}_meta"])
        try:
            arr = decode_column(payloads[i], meta)
        except (ValueError, IndexError, KeyError, pa.lib.ArrowInvalid) as e:
            cell_errors.append(
                CellError(column=name, row=-1,
                          content=f"<{len(payloads[i])} payload bytes>",
                          reason=str(e))
            )
            continue
        arrays.append(arr)
        fields.append(pa.field(name, arr.type))
    if cell_errors:
        raise ChunkDecodeError(row.get("fragment", ""), row.get("chunk_id", ""),
                               cell_errors)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


class DecodeBatch:
    """map_batches callable: a batch of encoded chunk rows -> the
    concatenation of their decoded tables."""

    def __init__(self, verify_checksum: bool = True):
        self.verify_checksum = verify_checksum

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        cols = batch.column_names
        for r in range(len(batch)):
            row = {c: batch[c][r].as_py() for c in cols}
            tables.append(decode_chunk_row(row, self.verify_checksum))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables)


def decode_batch(batch: pa.Table) -> pa.Table:
    return DecodeBatch()(batch)
