"""Lane-interleaved rANS kernel tests (codecs/rans.py) — the entropy
layer under dict_rans.  No Ray needed."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st_h

from colonnade_ray.codecs.rans import (
    M,
    pick_lanes,
    quantize_freqs,
    rans_decode,
    rans_encode,
)

RNG = np.random.default_rng(7)


def _roundtrip(sym: np.ndarray, nsym: int = 16) -> None:
    counts = np.bincount(sym, minlength=nsym).astype(np.int64)
    freqs = quantize_freqs(counts)
    K = pick_lanes(sym.size)
    rows = (sym.size + K - 1) // K
    pad = rows * K - sym.size
    padded = sym
    if pad:
        mps = int(np.argmax(freqs))
        padded = np.concatenate([sym, np.full(pad, mps, sym.dtype)])
    states, stream = rans_encode(padded, freqs, K)
    back = rans_decode(states, stream, freqs, rows * K, K)
    assert np.array_equal(back[: sym.size], sym)


def test_quantize_sums_to_scale():
    for counts in ([1, 0, 0], [1] * 16, [10**9, 1, 1, 1], [3, 5, 7, 11, 13]):
        f = quantize_freqs(np.array(counts))
        assert int(f.sum()) == M
        assert all(fi >= 1 for fi, c in zip(f, counts) if c > 0)
        assert all(fi == 0 for fi, c in zip(f, counts) if c == 0)


def test_quantize_deterministic():
    c = RNG.integers(0, 1000, 16)
    assert np.array_equal(quantize_freqs(c), quantize_freqs(c.copy()))


def test_roundtrip_skewed():
    sym = RNG.choice(16, size=200_000, p=np.array(
        [0.4, 0.2, 0.1, 0.08, 0.06, 0.05, 0.04, 0.03,
         0.015, 0.01, 0.005, 0.004, 0.003, 0.002, 0.0005, 0.0005]
    )).astype(np.uint8)
    _roundtrip(sym)


def test_roundtrip_single_symbol():
    # constant stream: the state never renormalizes, stream is empty
    _roundtrip(np.full(5000, 3, np.uint8))


def test_roundtrip_two_symbols_extreme_skew():
    sym = np.zeros(100_000, np.uint8)
    sym[::9973] = 15  # rare symbol at quantized floor freq
    _roundtrip(sym)


def test_roundtrip_tiny_and_ragged():
    for n in (1, 2, 15, 16, 17, 63, 64, 65, 511, 513, 4097):
        _roundtrip(RNG.integers(0, 7, n).astype(np.uint8))


def test_roundtrip_uniform_all_classes():
    _roundtrip(RNG.integers(0, 16, 65_537).astype(np.uint8))


def test_compressed_size_near_entropy():
    p = np.array([0.5, 0.25, 0.125, 0.125])
    sym = RNG.choice(4, size=1 << 18, p=p).astype(np.uint8)
    counts = np.bincount(sym, minlength=4).astype(np.int64)
    freqs = quantize_freqs(counts)
    K = pick_lanes(sym.size)
    states, stream = rans_encode(sym, freqs, K)
    h = -(p * np.log2(p)).sum()
    bits = (len(states) + len(stream)) * 8 / sym.size
    # within 3% + lane-state amortization of the entropy
    assert bits < h * 1.03 + (4 * K * 8) / sym.size


def test_torn_stream_raises():
    sym = RNG.integers(0, 16, 100_000).astype(np.uint8)
    counts = np.bincount(sym, minlength=16).astype(np.int64)
    freqs = quantize_freqs(counts)
    K = pick_lanes(sym.size)
    rows = (sym.size + K - 1) // K
    pad = rows * K - sym.size
    padded = np.concatenate([sym, np.full(pad, int(np.argmax(freqs)), np.uint8)])
    states, stream = rans_encode(padded, freqs, K)
    with pytest.raises(ValueError):
        rans_decode(states[:-4], stream, freqs, rows * K, K)
    with pytest.raises(ValueError):
        rans_decode(states, stream[: len(stream) // 2 * 2 - 8], freqs, rows * K, K)


@settings(max_examples=30, deadline=None)
@given(st_h.lists(st_h.integers(0, 15), min_size=1, max_size=3000))
def test_property_roundtrip(vals):
    _roundtrip(np.array(vals, dtype=np.uint8))
