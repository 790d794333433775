"""Text analysis kernels for training-data pipelines (brief-mandated):
tokenization, language-ID heuristic, quality scoring, token counting,
document fingerprinting.  All vectorized per batch; no per-row Python
in hot paths.

These generalize the reference's per-cell scalar functions
(parse/print/escape, siphon/src/Siphon.hs:297-334 and test parsers
siphon/test/Test.hs:330-368) to corpus-scale text columns.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

VOCAB_SIZE = 50_000
_WORD_RE = r"[A-Za-z0-9]+"  # BPE-ish word pieces; \p classes kept ASCII for determinism


class HashTokenizer:
    """Actor-pool friendly tokenizer: compile once, run per batch."""

    def __init__(self, text_col: str = "text", vocab: int = VOCAB_SIZE,
                 id_col: str = "doc_id", source_col: str = "source"):
        self.text_col = text_col
        self.vocab = vocab
        self.id_col = id_col
        self.source_col = source_col
        self.word_re = re.compile(_WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas().fillna("")
        # findall per row is C-speed in pandas; explode to hash in one pass
        words = texts.str.findall(self.word_re)
        lens = words.str.len().to_numpy().astype(np.int64)
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words]) if lens.sum() else np.zeros(0, object)
        if flat.size:
            h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
            tok = (h % np.uint64(self.vocab)).astype(np.int32)
        else:
            tok = np.zeros(0, np.int32)
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        tokens = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(tok, pa.int32()))
        doc_id = batch[self.id_col]
        if not pa.types.is_string(doc_id.type):
            doc_id = pc.cast(doc_id, pa.string())
        cols = {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": batch[self.source_col],
        }
        return pa.table(cols)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace+regex token counting (count_substring_regex kernel)."""
    n = pc.count_substring_regex(pc.coalesce(batch[text_col], ""), _WORD_RE)
    return batch.append_column("token_count", pc.cast(n, pa.int64()))


_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at from this that".split()
)
# tiny per-language stopword sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is"},
    "de": {"der", "die", "und", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
    "es": {"el", "la", "los", "que", "de"},
}


class QualityScorer:
    """Quality metrics per doc: lengths, alpha/digit/space/punct counts,
    stopword hits.  Integer outputs only (oracle-hash safe)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.coalesce(batch[self.text_col], "")
        out = batch
        out = out.append_column("q_chars", pc.cast(pc.utf8_length(txt), pa.int64()))
        for name, pat in [
            ("q_alpha", "[A-Za-z]"),
            ("q_digit", "[0-9]"),
            ("q_space", "[ ]"),
            ("q_punct", r"[.,;:!?]"),
        ]:
            out = out.append_column(
                name, pc.cast(pc.count_substring_regex(txt, pat), pa.int64())
            )
        stop_pat = r"\b(" + "|".join(_STOPWORDS) + r")\b"
        out = out.append_column(
            "q_stopwords", pc.cast(pc.count_substring_regex(txt, stop_pat), pa.int64())
        )
        return out


class LanguageId:
    """Stopword-marker language scorer (n-gram heuristic class).

    Emits lang_guess:string — argmax of per-language marker hits, "und"
    (undetermined) when nothing matches."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pats = {
            lang: r"\b(" + "|".join(sorted(m)) + r")\b" for lang, m in _LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.coalesce(batch[self.text_col], "")
        lowered = pc.utf8_lower(txt)
        scores = np.stack(
            [
                pc.count_substring_regex(lowered, p).to_numpy(zero_copy_only=False)
                for p in self.pats.values()
            ]
        )
        langs = np.array(list(self.pats.keys()) + ["und"])
        best = np.argmax(scores, axis=0)
        best = np.where(scores.max(axis=0) == 0, len(self.pats), best)
        return batch.append_column("lang_guess", pa.array(langs[best]))


_WORD_LOWER_RE = re.compile(r"[a-z0-9]+")


def word_freq(ds, text_col: str = "text", k: int = 50):
    """Top-k word frequencies over a text column — the canonical
    shuffle-minimized wide aggregate: each batch emits its own
    (word, count) partials (vectorized explode + value_counts), so the
    ONE groupby exchange moves distinct-words-per-batch, not tokens;
    a final sort by (count desc, word asc) + limit is tiny.

    At 100 TB the partial pass reduces exchange volume by the mean
    within-batch word multiplicity (~10-100x on natural text)."""
    from ray.data.aggregate import Sum

    empty = pa.table({"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if pa.types.is_null(col.type):  # a block of only missing texts
            return empty
        txt = pc.utf8_lower(pc.coalesce(col, ""))
        words = txt.to_pandas().str.findall(_WORD_LOWER_RE)
        lens = words.str.len().to_numpy().astype(np.int64)
        if lens.sum():
            flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
            vc = pd.Series(flat).value_counts()
            return pa.table(
                {"word": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                 "n": pa.array(vc.to_numpy().astype(np.int64))}
            )
        return empty

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("word").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "word"], descending=[True, False]).limit(k)


def ngram_freq(ds, n: int = 2, text_col: str = "text", k: int = 50):
    """Top-k word n-gram frequencies — same shuffle-minimized shape as
    ``word_freq`` (per-batch partial counts, ONE small groupby), with
    the gram construction fully vectorized: one flat word explode per
    batch, grams formed by n strided views masked at doc boundaries,
    no per-doc Python.  N-gram statistics drive contamination checks,
    Gopher-style repetition filters and LM-overlap analyses, so this
    is a first-class corpus operator, not a convenience."""
    from ray.data.aggregate import Sum

    if n < 2:
        return word_freq(ds, text_col=text_col, k=k)
    empty = pa.table({"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if pa.types.is_null(col.type):
            return empty
        txt = pc.utf8_lower(pc.coalesce(col, ""))
        words = txt.to_pandas().str.findall(_WORD_LOWER_RE)
        lens = words.str.len().to_numpy().astype(np.int64)
        total = int(lens.sum())
        if total < n:
            return empty
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if len(w)]
        )
        doc_of = np.repeat(np.arange(lens.size), lens)
        # gram starting at i is valid iff i..i+n-1 stay in one doc
        valid = doc_of[: total - n + 1] == doc_of[n - 1 :]
        if not valid.any():
            return empty
        grams = pd.Series(flat[: total - n + 1][valid])
        for j in range(1, n):
            grams = grams + " " + pd.Series(flat[j : total - n + 1 + j][valid])
        vc = grams.value_counts()
        return pa.table(
            {"gram": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
             "n": pa.array(vc.to_numpy().astype(np.int64))}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.groupby("gram").aggregate(Sum("n", alias_name="n"))
    return agg.sort(["n", "gram"], descending=[True, False]).limit(k)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit document fingerprint (SipHash of full text — the
    rolling-hash fingerprint class; exact-dup key)."""
    txt = pc.coalesce(batch[text_col], "").to_pandas().to_numpy(dtype=object)
    h = pd.util.hash_array(txt, categorize=False).astype(np.uint64).view(np.int64)
    return batch.append_column("fingerprint", pa.array(h))
