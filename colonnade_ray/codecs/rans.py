"""Lane-interleaved range-ANS entropy coder over a small alphabet.

The dict codecs (ints.py) get within ~0.5 bit/value of the empirical
entropy with a fixed 4-bit bit-length-class selector per value; the
selector stream is the remaining slack (measured on the flagship token
corpus: H(class) = 3.53 bits vs the flat 4, and the payload streams
are already within 0.07 bits of their conditional entropy).  This
module entropy-codes ONLY that 16-symbol class stream, keeping every
payload stream pure bit-packing — the engine stays "lightweight" (no
per-value bit cursor, no byte-serial loop) because the rANS here is
interleaved across K independent lanes and every step is a numpy
vector op over the K lane states: symbol i belongs to lane i % K, so
encode/decode walk rows of a (n/K, K) matrix — sequential only along
the n/K axis (~1.7k iterations per 1.75M-value chunk at K=1024).

This is the public interleaved-rANS construction (Duda's rANS +
Giesen's ryg_rans interleaving, as used SIMD-wide in htscodecs):
32-bit states, 16-bit renormalization I/O, 12-bit quantized
frequencies.  State invariant x in [L, L<<16) with L = 1<<16; encode
of a symbol with freq f emits iff x >= f<<20 (single conditional shift
suffices), decode refills iff x < L — the masks pair exactly, so the
stream is written in decode order by reversing the per-row emission
blocks.

Determinism contract (codecs/base.py): pure integer numpy, stable
argmax tie-breaks in the frequency quantizer, no RNG.
"""

from __future__ import annotations

import numpy as np

SCALE_BITS = 12
M = 1 << SCALE_BITS          # frequency scale (sum of quantized freqs)
_L = np.uint64(1 << 16)      # state interval lower bound
_IO = np.uint64(16)          # renormalization shift
_SB = np.uint64(SCALE_BITS)
_MASK = np.uint64(M - 1)
_EMIT = np.uint64(0xFFFF)


def pick_lanes(n: int) -> int:
    """Lane count: enough rows to amortize numpy-call overhead, few
    enough lanes that the K*4-byte state header stays negligible.

    Measured on a 3.4M-symbol flagship selector stream (round 4):
    K=4096 decodes in 0.077 s but its 16 KB state header costs 0.039
    bits/symbol; K=2048 decodes in 0.081 s (+5%) at 0.019 bits, and
    each halving grows the renorm stream ~0.7 KB (later emission
    boundaries), so the NET save of 4096->2048 is ~6.8 KB per chunk.
    The schedule keeps state overhead <= ~0.02 bits/symbol and only
    pays for 4096 lanes once the chunk is big enough to amortize
    them."""
    if n >= 1 << 23:
        return 4096
    if n >= 1 << 21:
        return 2048
    if n >= 1 << 17:
        return 1024
    if n >= 1 << 13:
        return 256
    if n >= 1 << 9:
        return 64
    return 16


def quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Quantize symbol counts to integer freqs summing to exactly M,
    every present symbol >= 1.  Deterministic (first-max tie-break)."""
    counts = np.asarray(counts, dtype=np.int64)
    n = int(counts.sum())
    if n <= 0:
        raise ValueError("quantize_freqs: empty input")
    f = counts * M // n
    f[(counts > 0) & (f == 0)] = 1
    diff = M - int(f.sum())
    while diff > 0:
        f[int(np.argmax(f))] += 1
        diff -= 1
    while diff < 0:
        cand = np.flatnonzero(f > 1)
        f[cand[int(np.argmax(f[cand]))]] -= 1
        diff += 1
    return f


def rans_encode(sym: np.ndarray, freqs: np.ndarray, K: int) -> tuple[bytes, bytes]:
    """Encode ``sym`` (small-int array) under quantized ``freqs``.

    Returns (states_bytes, stream_bytes).  ``sym`` positions past the
    true length must already be padded to a multiple of K with the
    most probable symbol by the caller (see dict_rans).
    """
    n = int(sym.size)
    if n == 0:
        return b"", b""
    rows = (n + K - 1) // K
    if rows * K != n:
        raise ValueError("rans_encode: sym must be padded to a multiple of K")
    smat = sym.reshape(rows, K)
    F = np.asarray(freqs, dtype=np.uint64)
    C = np.concatenate(([0], np.cumsum(freqs))).astype(np.uint64)
    x = np.full(K, _L, dtype=np.uint64)
    out_rows: list[np.ndarray] = []
    for r in range(rows - 1, -1, -1):
        s = smat[r]
        f = F[s]
        mask = x >= (f << np.uint64(20))
        if mask.any():
            out_rows.append((x[mask] & _EMIT).astype(np.uint16))
            x[mask] >>= _IO
        q = x // f
        x = (q << _SB) + (x - q * f) + C[s]
    out_rows.reverse()
    stream = np.concatenate(out_rows) if out_rows else np.zeros(0, np.uint16)
    return x.astype(np.uint32).tobytes(), stream.tobytes()


def rans_decode(states_b: bytes, stream_b: bytes, freqs: np.ndarray,
                n_padded: int, K: int) -> np.ndarray:
    """Decode ``n_padded`` symbols (a multiple of K).  Raises ValueError
    on torn frames (short state header or exhausted stream)."""
    if n_padded == 0:
        return np.zeros(0, dtype=np.uint8)
    rows = n_padded // K
    if rows * K != n_padded:
        raise ValueError("rans_decode: n_padded must be a multiple of K")
    x32 = np.frombuffer(states_b, dtype=np.uint32)
    if x32.size != K:
        raise ValueError(f"rans state header torn: {x32.size} lanes, want {K}")
    x = x32.astype(np.uint64)
    stream = np.frombuffer(stream_b, dtype=np.uint16).astype(np.uint64)
    F = np.asarray(freqs, dtype=np.uint64)
    C = np.concatenate(([0], np.cumsum(freqs))).astype(np.uint64)
    table = np.repeat(
        np.arange(len(freqs), dtype=np.uint8), np.asarray(freqs, dtype=np.int64)
    )
    if table.size != M:
        raise ValueError("rans freqs do not sum to scale")
    # Fused per-slot transition tables: for slot ``low``, the decoded
    # symbol is table[low] and the state update is
    # x' = F[s] * (x >> SB) + (low - C[s]); precomputing f and the
    # bias per slot turns the inner loop's three gathers + arithmetic
    # into two gathers + FMA, and the symbol gather itself is deferred
    # out of the loop entirely (one (rows, K) gather at the end) —
    # the loop only stores the 12-bit slot per lane.
    tf = F[table]
    tb = np.arange(M, dtype=np.uint64) - C[table]
    lows = np.empty((rows, K), dtype=np.uint16)
    p = 0
    for r in range(rows):
        low = x & _MASK
        lows[r] = low.astype(np.uint16)
        x = tf[low] * (x >> _SB) + tb[low]
        mask = x < _L
        k = int(np.count_nonzero(mask))
        if k:
            if p + k > stream.size:
                raise ValueError("rans stream torn: ran out of renorm words")
            x[mask] = (x[mask] << _IO) | stream[p : p + k]
            p += k
    return table[lows.reshape(-1)]
