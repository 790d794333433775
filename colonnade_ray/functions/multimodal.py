"""Multimodal column stages: image/audio/video as opaque binary
columns with typed metadata (brief-mandated).

The Ray-side plumbing is REAL and tested: schemas, batch sizing for
large binary payloads, actor-pool stage signatures, and output
layout.  The codec work itself (JPEG decode, resample, frame
sampling) is STUBBED — the image/audio libraries are not in this
container — behind ``decoder=`` hooks; the default deterministic fake
decoder lets pipelines and tests exercise the full data path.  Swap
``decoder=pillow_decoder`` (or an equivalent) in production.

Design notes for 100 TB (per the brief):
- binary payloads are big: these stages want SMALL batch_size (rows)
  and rely on Ray's dynamic block splitting for outputs;
- a decode model/codec context is loaded once per actor (__init__),
  never per batch;
- metadata travels in sibling typed columns, so pruned reads can skip
  payloads entirely (`columns=[...]` without the blob column).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),          # opaque encoded bytes
        ("media_type", pa.string()),       # "image/jpeg", "audio/wav", ...
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a real media decoder: derives a
    fixed-shape float32 'pixel' array from the payload digest.  Lets
    the whole pipeline (batching, actor state, output schema) run and
    be verified without image/audio libraries."""
    h = hashlib.blake2b(payload, digest_size=32).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(64, dtype=np.float32)


def unavailable_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """The honest stub: raises until a real codec library is wired in."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; pass decoder=fake_decode for plumbing tests "
        "or wire a real decoder (e.g. PIL.Image.open) here"
    )


class MediaFeatureExtract:
    """Actor-pool stage: binary payload -> feature vector + metadata.

    __init__ loads the (stubbed) codec context once per actor; __call__
    is per batch.  Output drops the payload (features are much
    smaller), keeping the id + typed metadata.
    """

    def __init__(self, decoder: Optional[Callable] = None, feature_dim: int = 64):
        self.decoder = decoder or fake_decode
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        for i, (p, m) in enumerate(zip(payloads, mtypes)):
            if p is None:
                continue
            arr = self.decoder(p, m)
            k = min(arr.size, self.feature_dim)
            feats[i, :k] = arr.ravel()[:k]
        flat = pa.array(feats.ravel(), pa.float32())
        offsets = pa.array(
            np.arange(0, (len(payloads) + 1) * self.feature_dim, self.feature_dim,
                      dtype=np.int32)
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload_bytes": pa.array(
                    [len(p) if p is not None else 0 for p in payloads], pa.int64()
                ),
                "features": pa.ListArray.from_arrays(offsets, flat),
            }
        )


def extract_media_features(ds, decoder: Optional[Callable] = None,
                           batch_size: int = 64, concurrency=None):
    """Feature-extract a media Dataset.

    batch_size defaults SMALL (64 rows): payloads can be MBs each, and
    batch_bytes = batch_size x payload x concurrency must fit worker
    heaps (SURVEY.md memory-aware rule)."""
    from ..util import default_concurrency

    return ds.map_batches(
        MediaFeatureExtract,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, default_concurrency()),
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus in MEDIA_SCHEMA shape."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, int(s)).astype(np.uint8).tobytes()
                for s in rng.integers(100, 4096, n)]
    return pa.table(
        {
            "media_id": pa.array([f"media-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/jpeg" if i % 2 == 0 else "audio/wav" for i in range(n)]),
            "width": pa.array(rng.integers(16, 1024, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 1024, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32)),
        }
    )
