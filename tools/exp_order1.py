"""Order-1 context experiment for the token stream (round-4 verdict
ask #7).

BASELINE.md names higher-order modeling as the only remaining lever
between the shipped 0.872 B/token and the 0.8624 order-0 floor.  This
experiment measures, on a flagship-sized real chunk of the corpus,
whether ANY order-1 context the codec could realistically condition on
carries exploitable information:

1. previous-token half-octave class -> next token's rank distribution
   (the `dict_rans2_shared` selector alphabet as context),
2. source -> rank distribution (per-source conditional tables),

each evaluated as HOLDOUT CROSS-ENTROPY: context tables are estimated
on the first half of the stream and charged against the second half,
plus the serialized table cost (contexts x quantized freq table, the
same K=4096 quantization the rANS coder uses).  Empirical conditional
entropy on the training half alone always "wins" by overfitting; a
codec only realizes holdout gains.

Run: PYTHONPATH=/root/repo python tools/exp_order1.py [n_tokens]
Prints one JSON line; the conclusion is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import sys

import numpy as np


def entropy_bits(counts: np.ndarray) -> float:
    p = counts[counts > 0].astype(np.float64)
    p /= p.sum()
    return float(-(p * np.log2(p)).sum())


def cross_entropy_bits(train_counts: np.ndarray,
                       hold_counts: np.ndarray,
                       alpha: float = 0.5) -> float:
    """Bits/symbol charged to the holdout stream under the model
    estimated from train (add-alpha smoothed, as an escape-free coder
    must assign every symbol nonzero mass)."""
    q = train_counts.astype(np.float64) + alpha
    q /= q.sum()
    h = hold_counts.astype(np.float64)
    n = h.sum()
    if n == 0:
        return 0.0
    return float(-(h * np.log2(q)).sum() / n)


def half_octave_class(ranks: np.ndarray) -> np.ndarray:
    """The dict_rans2_shared selector: floor(2*log2(rank+1)) — ~34
    classes over an 18-bit rank range."""
    return (2.0 * np.log2(ranks.astype(np.float64) + 1.0)).astype(np.int32)


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    from colonnade_ray.corpus import synth_rows

    # flagship-distribution token stream with source labels, sharded
    # exactly like the bench corpus
    toks, srcs = [], []
    got, shard = 0, 0
    while got < n_target:
        t = synth_rows(20_000, seed=9_000 + shard, start_id=shard * 20_000)
        flat = t["tokens"].combine_chunks().flatten().to_numpy()
        lens = t["n_tok"].to_numpy()
        toks.append(flat)
        srcs.append(np.repeat(
            np.asarray([s for s in t["source"].to_pylist()]), lens))
        got += len(flat)
        shard += 1
    tok = np.concatenate(toks)[:n_target]
    src = np.concatenate(srcs)[:n_target]

    # global frequency ranks — the shared-dictionary view of the stream
    vals, counts = np.unique(tok, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    rank_of = np.empty(len(vals), np.int64)
    rank_of[order] = np.arange(len(vals))
    lut = np.zeros(int(vals.max()) + 1, np.int64)
    lut[vals] = rank_of
    ranks = lut[tok]
    n = len(ranks)
    half = n // 2
    R = int(ranks.max()) + 1

    h0_full = entropy_bits(np.bincount(ranks, minlength=R))
    tr, ho = ranks[:half], ranks[half:]
    tr_c = np.bincount(tr, minlength=R)
    ho_c = np.bincount(ho, minlength=R)
    h0_holdout = cross_entropy_bits(tr_c, ho_c)

    # --- context 1: previous-token half-octave class ---------------
    ctx = half_octave_class(ranks)
    prev = np.concatenate(([0], ctx[:-1]))
    n_ctx = int(prev.max()) + 1
    h1_emp_n = 0.0
    h1_hold_n = 0.0
    table_bits = 0.0
    K_BITS = 12  # rANS K=4096 quantization: ~12 bits/slot serialized
    for c in range(n_ctx):
        m_tr = prev[:half] == c
        m_ho = prev[half:] == c
        tc = np.bincount(ranks[:half][m_tr], minlength=R)
        hc = np.bincount(ranks[half:][m_ho], minlength=R)
        h1_emp_n += entropy_bits(tc) * tc.sum()
        h1_hold_n += cross_entropy_bits(tc, hc) * hc.sum()
        # table cost: nonzero slots of this context's quantized table
        table_bits += (tc > 0).sum() * K_BITS
    h1_emp = h1_emp_n / half
    h1_hold = h1_hold_n / (n - half)
    h1_net = h1_hold + table_bits / (n - half)

    # --- context 2: source ------------------------------------------
    src_ids = {s: i for i, s in enumerate(np.unique(src))}
    sctx = np.asarray([src_ids[s] for s in src], np.int32)
    h2_hold_n = 0.0
    s_table_bits = 0.0
    for c in range(len(src_ids)):
        tc = np.bincount(ranks[:half][sctx[:half] == c], minlength=R)
        hc = np.bincount(ranks[half:][sctx[half:] == c], minlength=R)
        h2_hold_n += cross_entropy_bits(tc, hc) * hc.sum()
        s_table_bits += (tc > 0).sum() * K_BITS
    h2_hold = h2_hold_n / (n - half)
    h2_net = h2_hold + s_table_bits / (n - half)

    out = {
        "n_tokens": n,
        "n_contexts_prevclass": n_ctx,
        "n_sources": len(src_ids),
        "order0_entropy_bits": round(h0_full, 4),
        "order0_holdout_bits": round(h0_holdout, 4),
        "prevclass_train_bits": round(h1_emp, 4),
        "prevclass_holdout_bits": round(h1_hold, 4),
        "prevclass_net_bits_with_tables": round(h1_net, 4),
        "persource_holdout_bits": round(h2_hold, 4),
        "persource_net_bits_with_tables": round(h2_net, 4),
        "order1_gain_bits": round(h0_holdout - h1_net, 4),
        "persource_gain_bits": round(h0_holdout - h2_net, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
