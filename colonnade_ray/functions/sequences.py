"""Sequence operators for training-data preparation: truncation,
vocabulary remapping, and fixed-length example packing.

These act on the engine's graft axis — the tokens:list<int32> column
(SURVEY.md §1.1) — with pure Arrow-offsets arithmetic: no per-row
Python in any hot path.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _list_parts(arr: pa.Array):
    lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    return lens, vals


def truncate_tokens_batch(batch: pa.Table, max_len: int,
                          tokens_col: str = "tokens") -> pa.Table:
    """Clip every sequence to max_len tokens (offsets arithmetic)."""
    arr = batch[tokens_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    lens, vals = _list_parts(arr)
    new_lens = np.minimum(lens, max_len)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    keep = np.zeros(vals.size, dtype=bool)
    for_runs = np.flatnonzero(new_lens)  # small loop over ROWS only
    # vectorized keep-mask: mark [start, start+new_len) per row
    marks = np.zeros(vals.size + 1, dtype=np.int8)
    np.add.at(marks, starts[for_runs], 1)
    np.add.at(marks, (starts + new_lens)[for_runs], -1)
    keep = np.cumsum(marks[:-1]) > 0
    new_vals = vals[keep]
    offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                      pa.array(new_vals.astype(np.int32)))
    out = batch.set_column(
        batch.column_names.index(tokens_col), tokens_col, tokens
    )
    if "n_tok" in batch.column_names:
        out = out.set_column(
            out.column_names.index("n_tok"), "n_tok",
            pa.array(new_lens.astype(np.int32)),
        )
    return out


class RemapTokens:
    """Broadcast vocabulary remap: token id -> new id via a LUT fetched
    once per actor (ray.put pattern); unknown ids -> unk_id."""

    def __init__(self, lut_ref, unk_id: int = 0, tokens_col: str = "tokens"):
        import ray

        lut = ray.get(lut_ref) if not isinstance(lut_ref, np.ndarray) else lut_ref
        self.lut = np.asarray(lut, dtype=np.int32)
        self.unk_id = unk_id
        self.tokens_col = tokens_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.tokens_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens, vals = _list_parts(arr)
        v = vals.astype(np.int64)
        ok = (v >= 0) & (v < self.lut.size)
        mapped = np.full(v.size, self.unk_id, dtype=np.int32)
        mapped[ok] = self.lut[v[ok]]
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(mapped))
        return batch.set_column(
            batch.column_names.index(self.tokens_col), self.tokens_col, tokens
        )


def remap_tokens(ds, lut: np.ndarray, unk_id: int = 0, tokens_col: str = "tokens",
                 concurrency=None):
    import ray

    from ..util import default_concurrency

    ref = ray.put(np.asarray(lut, dtype=np.int32))
    return ds.map_batches(
        RemapTokens,
        fn_constructor_kwargs=dict(lut_ref=ref, unk_id=unk_id, tokens_col=tokens_col),
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )


class PackSequences:
    """Fixed-length example packing: concatenate documents (with an EOS
    separator) and re-slice into seq_len-token training examples — the
    classic LLM data-prep step.

    Chunk-local (no state across batches): each batch's token stream
    packs independently; the tail shorter than seq_len is emitted when
    ``keep_remainder`` else dropped.  Token conservation per batch:
    sum(n_tok) + n_docs (EOS) = n_examples*seq_len + tail, asserted by
    tests.  Per-example provenance (first source) rides along.
    """

    def __init__(self, seq_len: int = 2048, eos_id: int = 0,
                 tokens_col: str = "tokens", keep_remainder: bool = False):
        self.seq_len = seq_len
        self.eos_id = eos_id
        self.tokens_col = tokens_col
        self.keep_remainder = keep_remainder

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.tokens_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens, vals = _list_parts(arr)
        n = len(batch)
        # interleave an EOS after each doc: build via offsets scatter
        total = int(lens.sum()) + n
        stream = np.full(total, self.eos_id, dtype=np.int32)
        ends = np.cumsum(lens + 1)
        starts = ends - (lens + 1)
        # positions of doc tokens inside the stream
        marks = np.zeros(total, dtype=np.int8)
        marks[starts[lens > 0]] += 1
        marks[(starts + lens)[lens > 0]] -= 1
        tok_mask = np.cumsum(marks) > 0
        stream[tok_mask] = vals.astype(np.int32)
        n_full = total // self.seq_len
        examples = stream[: n_full * self.seq_len].reshape(n_full, self.seq_len)
        ex_lens = [self.seq_len] * n_full
        flat = [examples.reshape(-1)]
        if self.keep_remainder and total % self.seq_len:
            tail = stream[n_full * self.seq_len :]
            flat.append(tail)
            ex_lens.append(tail.size)
        flat_v = np.concatenate(flat) if flat else np.zeros(0, np.int32)
        offsets = np.concatenate(([0], np.cumsum(ex_lens))).astype(np.int32)
        out_tokens = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat_v.astype(np.int32))
        )
        src = ""
        if "source" in batch.column_names and n:
            s0 = batch["source"][0].as_py()
            src = s0 if s0 is not None else ""
        k = len(ex_lens)
        return pa.table(
            {
                "example_id": pa.array(np.arange(k, dtype=np.int64)),
                "tokens": out_tokens,
                "n_tok": pa.array(np.asarray(ex_lens, dtype=np.int32)),
                "source": pa.array([src] * k),
            }
        )


def pack_sequences(ds, seq_len: int = 2048, eos_id: int = 0,
                   keep_remainder: bool = False, concurrency=None):
    from ..util import default_concurrency

    return ds.map_batches(
        PackSequences,
        fn_constructor_kwargs=dict(seq_len=seq_len, eos_id=eos_id,
                                   keep_remainder=keep_remainder),
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )
