"""Multimodal column stages: image/audio/video as opaque binary
columns with typed metadata (brief-mandated).

The Ray-side plumbing is REAL and tested: schemas, batch sizing for
large binary payloads, actor-pool stage signatures, and output
layout.  Decode is REAL for images and audio — WAV (stdlib ``wave``),
P6 PPM (pure numpy), baseline 8-bit PNG (stdlib ``zlib`` + numpy
unfiltering, ``decode_png``), and baseline JPEG (from-scratch
Huffman + IDCT in ``functions/jpeg.py``, any sampling up to 4:2:0,
restart markers) — including a real nearest-neighbor resize stage —
via ``stdlib_decoder``.  Remaining compressed codecs (MP3/MP4 frame
sampling) stay STUBBED — those libraries are not in this container —
behind the same ``decoder=`` hook; the deterministic fake decoder
lets pipelines and tests exercise the full data path for any media
type.  Swap ``decoder=pillow_decoder`` (or an equivalent) in
production.

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


# ---------------------------------------------------------------------------
# REAL decoders for container-friendly formats (stdlib + numpy only)


def decode_wav(payload: bytes, media_type: str = "audio/wav") -> np.ndarray:
    """PCM WAV -> float32 mono samples in [-1, 1] (stdlib ``wave``)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return arr


def _ppm_header(b: bytes):
    """Parse a P6 header (magic, comments, width height maxval)."""
    if not b.startswith(b"P6"):
        raise ValueError("not a binary P6 PPM")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            pos = b.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    return vals[0], vals[1], vals[2], pos + 1  # w, h, maxval, raster offset


def decode_ppm(payload: bytes, media_type: str = "image/x-portable-pixmap") -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8 pixel array (pure numpy)."""
    w, h, maxval, off = _ppm_header(payload)
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    return np.frombuffer(payload, np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via two index gathers (no loops)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


# ---------------------------------------------------------------------------
# PNG: real baseline decoder from stdlib zlib (no image libraries)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying lengths + CRCs."""
    import struct
    import zlib

    pos = len(_PNG_SIG)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return


def decode_png(payload: bytes,
               media_type: str = "image/png") -> np.ndarray:
    """Baseline PNG -> (h, w, channels) uint8 pixel array, from stdlib
    ``zlib`` + numpy only (round-4 ask #4: closes the compressed-image
    stub without new dependencies).

    Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3
    (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — the baseline
    every encoder can emit.  All five scanline filters (none/sub/up/
    average/paeth) reconstruct per the spec; rows unfilter in one pass
    each with the row-wide ops vectorized (``up`` fully, ``sub`` by
    per-lane cumsum; ``average``/``paeth`` walk pixels but operate on
    whole channel slices).  Chunk CRCs are verified.  16-bit depth and
    Adam7 interlacing raise ``NotImplementedError`` honestly."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    palette = None
    idat = []
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if ctype_i not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype_i}")
    ch = _PNG_CHANNELS[ctype_i]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG raster size {len(raw)} != {h}x({stride}+1)")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    out = np.zeros((h, stride), np.uint16)  # u16 scratch: sums < 512
    prev = np.zeros(stride, np.uint16)
    for r in range(h):
        row = lines[r, 1:].astype(np.uint16)
        f = ftypes[r]
        if f == 0:
            rec = row
        elif f == 1:   # sub: recon[x] = raw[x] + recon[x-bpp]
            rec = row.reshape(w, ch).astype(np.uint64)
            rec = (np.cumsum(rec, axis=0) & 0xFF).reshape(stride)
        elif f == 2:   # up
            rec = (row + prev) & 0xFF
        elif f == 3:   # average
            rec = row.copy()
            rec[:ch] = (row[:ch] + prev[:ch] // 2) & 0xFF
            for x in range(ch, stride, ch):
                s = x - ch
                rec[x : x + ch] = (
                    row[x : x + ch]
                    + (rec[s : s + ch] + prev[x : x + ch]) // 2
                ) & 0xFF
        elif f == 4:   # paeth
            rec = row.copy()
            zero = np.zeros(ch, np.int32)
            for x in range(0, stride, ch):
                a = rec[x - ch : x].astype(np.int32) if x else zero
                b = prev[x : x + ch].astype(np.int32)
                c = (prev[x - ch : x].astype(np.int32) if x else zero)
                p = a + b - c
                pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, b, c))
                rec[x : x + ch] = (row[x : x + ch] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f} on row {r}")
        out[r] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    if ctype_i == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        img = palette[img[..., 0]]
    return img


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """(h, w[, channels]) uint8 -> baseline non-interlaced PNG.
    ``filters``: per-row filter types (int or sequence, default 0) —
    lets the round-trip test exercise every unfilter path."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    ctype_i = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h
    flat = img.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, np.int32)
    lines = []
    for r in range(h):
        row = flat[r]
        f = filters[r]
        left = np.concatenate([np.zeros(ch, np.int32), row[:-ch]]) \
            if w * ch > ch else np.zeros(w * ch, np.int32)
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]]) \
            if w * ch > ch else np.zeros(w * ch, np.int32)
        if f == 0:
            enc = row
        elif f == 1:
            enc = row - left
        elif f == 2:
            enc = row - prev
        elif f == 3:
            enc = row - (left + prev) // 2
        elif f == 4:
            p = left + prev - upleft
            pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                           np.abs(p - upleft))
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = row - pred
        else:
            raise ValueError(f"filter {f}")
        lines.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_i, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def stdlib_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """Dispatch: REAL decode where the container allows, honest stub
    elsewhere."""
    if media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(payload, media_type)
    if media_type in ("image/x-portable-pixmap", "image/ppm"):
        return decode_ppm(payload, media_type).ravel().astype(np.float32) / 255.0
    if media_type == "image/png":
        return decode_png(payload, media_type).ravel().astype(np.float32) / 255.0
    if media_type == "image/jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload, media_type).ravel() \
            .astype(np.float32) / 255.0
    return unavailable_decoder(payload, media_type)


class ImageResize:
    """Actor-pool stage: PPM payload -> resized PPM payload.

    Real end-to-end for uncompressed images.  Per-row decode is the
    work itself here (payloads are the data), so the row loop is not a
    hot-path smell; batch_size stays small per the module notes."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads, widths, heights = [], [], []
        for p in batch["payload"].to_pylist():
            if p is None:
                out_payloads.append(None)
                widths.append(0)
                heights.append(0)
                continue
            img = resize_nearest(decode_ppm(p), self.out_h, self.out_w)
            out_payloads.append(encode_ppm(img))
            widths.append(self.out_w)
            heights.append(self.out_h)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out_payloads, pa.binary()),
                "media_type": batch["media_type"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
            }
        )


def resize_images(ds, out_w: int = 64, out_h: int = 64, batch_size: int = 64,
                  concurrency=None):
    """Resize a PPM image Dataset (actor pool, small batches)."""
    from ..util import default_concurrency

    return ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, default_concurrency()),
    )


def split_ppm_stream(payload: bytes) -> list:
    """Split a concatenated-P6 'video stream' payload into its frame
    payloads by walking the headers (each frame is self-describing:
    header gives the exact raster length, so no delimiter is needed)."""
    frames, pos = [], 0
    while pos < len(payload):
        w, h, _maxval, off = _ppm_header(payload[pos:])
        end = pos + off + w * h * 3
        if end > len(payload):
            raise ValueError(
                f"truncated PPM stream: frame {len(frames)} needs "
                f"{end - pos} bytes at offset {pos}, only {len(payload) - pos} left"
            )
        frames.append(payload[pos:end])
        pos = end
    return frames


class FrameSample:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME.

    The video analog of ImageResize: real end-to-end for the
    concatenated-PPM container (``video/x-ppm-stream``); compressed
    video (MP4/H.264) would swap ``splitter=`` for a PyAV/ffmpeg
    splitter with the same row-explosion layout.  Sampling policy:
    ``every=k`` keeps frames 0, k, 2k, ...; ``n_frames=m`` keeps m
    evenly-spaced frames (first frame always included).  Output rows
    are plain images, so the stage composes directly with
    ImageResize / MediaFeatureExtract downstream.

    Scale notes: output can be LARGER than input (frame explosion) —
    Ray's dynamic block splitting handles the fan-out, and batch_size
    stays small because each input row is a whole video.
    """

    def __init__(self, every: Optional[int] = None, n_frames: Optional[int] = None,
                 splitter: Optional[Callable] = None):
        if (every is None) == (n_frames is None):
            raise ValueError("pass exactly one of every= / n_frames=")
        self.every = every
        self.n_frames = n_frames
        self.splitter = splitter or split_ppm_stream

    def _pick(self, total: int) -> np.ndarray:
        if self.every is not None:
            return np.arange(0, total, self.every)
        m = min(self.n_frames, total)
        if m <= 0:
            return np.zeros(0, np.int64)
        return np.unique((np.arange(m) * total) // m)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, totals, payloads, ws, hs = [], [], [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            if not p:
                continue
            frames = self.splitter(p)
            for i in self._pick(len(frames)):
                fp = frames[int(i)]
                w, h, _mx, _off = _ppm_header(fp)
                ids.append(mid)
                idxs.append(int(i))
                totals.append(len(frames))
                payloads.append(fp)
                ws.append(w)
                hs.append(h)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(
                    ["image/x-portable-pixmap"] * len(ids), pa.string()
                ),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
            }
        )


def sample_frames(ds, every: Optional[int] = None, n_frames: Optional[int] = None,
                  batch_size: int = 16, concurrency=None):
    """Frame-sample a video Dataset (actor pool, very small batches —
    each row is a whole video)."""
    from ..util import default_concurrency

    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"every": every, "n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, default_concurrency()),
    )


class AudioSpectralFeatures:
    """Actor-pool stage: WAV payload -> log-power spectral feature
    vector (REAL signal processing, numpy only): Hann-windowed framed
    rFFT power, pooled into ``n_bands`` log-spaced (mel-like) bands,
    time-averaged, log-compressed.  Deterministic; the audio analog
    of the image feature extract (same output layout, composes with
    the same downstream stages — e.g. embedding dedup / ANN over the
    feature column)."""

    def __init__(self, n_bands: int = 32, frame: int = 256,
                 hop: int = 128, rate: int = 8000):
        self.n_bands = n_bands
        self.frame = frame
        self.hop = hop
        # precomputed per actor (once), reused every batch
        self.window = np.hanning(frame)
        self.n_bins = frame // 2 + 1
        # log-spaced band edges, forced strictly increasing where the
        # low end would collide (geomspace rounds 1,1,2,... at small
        # n), clipped to the spectrum
        edges = np.round(np.geomspace(1, self.n_bins,
                                      n_bands + 1)).astype(np.int64)
        edges = np.maximum(edges, np.arange(n_bands + 1) + 1)
        edges = np.clip(np.maximum.accumulate(edges), 1, self.n_bins)
        self.edges = edges

    def _features(self, samples: np.ndarray) -> np.ndarray:
        n = samples.size
        if n < self.frame:
            samples = np.pad(samples, (0, self.frame - n))
            n = samples.size
        n_frames = 1 + (n - self.frame) // self.hop
        idx = (np.arange(self.frame)[None, :]
               + self.hop * np.arange(n_frames)[:, None])
        frames = samples[idx] * self.window[None, :]
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        bands = np.zeros((n_frames, self.n_bands), np.float64)
        for b in range(self.n_bands):
            lo = min(int(self.edges[b]), self.n_bins - 1)
            hi = min(max(int(self.edges[b + 1]), lo + 1), self.n_bins)
            bands[:, b] = power[:, lo:hi].mean(axis=1)
        return np.log1p(bands.mean(axis=0)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, nsamp = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            if not p:
                continue
            samples = decode_wav(p)
            ids.append(mid)
            nsamp.append(samples.size)
            feats.append(self._features(samples))
        flat = pa.array(np.concatenate(feats) if feats
                        else np.zeros(0, np.float32), pa.float32())
        offs = pa.array(np.arange(0, (len(ids) + 1) * self.n_bands,
                                  self.n_bands, dtype=np.int32))
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "features": pa.ListArray.from_arrays(offs, flat),
        })


def extract_audio_features(ds, n_bands: int = 32, frame: int = 256,
                           hop: int = 128, batch_size: int = 64,
                           concurrency=None):
    """Spectral-feature a WAV Dataset (actor pool; window/band tables
    built once per actor)."""
    from ..util import default_concurrency

    return ds.map_batches(
        AudioSpectralFeatures,
        fn_constructor_kwargs={"n_bands": n_bands, "frame": frame,
                               "hop": hop},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (1, default_concurrency()),
    )


def synth_ppm_video_payload(seed: int, frames: int = 12, w: int = 16,
                            h: int = 12) -> bytes:
    """A real concatenated-P6 'video': per-frame gradient + frame
    counter baked into the blue channel (deterministic)."""
    return b"".join(
        synth_ppm_payload(seed * 1000 + f, w=w, h=h) for f in range(frames)
    )


def synth_video_table(n: int, seed: int = 42, frames: int = 12) -> pa.Table:
    """Video corpus in MEDIA_SCHEMA shape with decodable PPM streams."""
    payloads = [synth_ppm_video_payload(seed + i, frames=frames) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"vid-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video/x-ppm-stream"] * n),
            "width": pa.array([16] * n, pa.int32()),
            "height": pa.array([12] * n, pa.int32()),
            "duration_ms": pa.array([frames * 40] * n, pa.int32()),
        }
    )


def synth_wav_payload(seed: int, ms: int = 50, rate: int = 8000) -> bytes:
    """A real little sine-burst WAV file (deterministic)."""
    import io
    import wave

    t = np.arange(int(rate * ms / 1000)) / rate
    freq = 200 + 50 * (seed % 20)
    samples = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def synth_ppm_payload(seed: int, w: int = 32, h: int = 24) -> bytes:
    """A real P6 PPM gradient image (deterministic)."""
    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = ((y[:, None] * 255) // max(h - 1, 1)).astype(np.uint8)
    img[..., 1] = ((x[None, :] * 255) // max(w - 1, 1)).astype(np.uint8)
    img[..., 2] = (seed * 37) % 256
    return encode_ppm(img)


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Media corpus whose payloads are REAL decodable WAV/PPM files."""
    payloads, mtypes = [], []
    for i in range(n):
        if i % 2 == 0:
            payloads.append(synth_ppm_payload(seed + i))
            mtypes.append("image/x-portable-pixmap")
        else:
            payloads.append(synth_wav_payload(seed + i))
            mtypes.append("audio/wav")
    return pa.table(
        {
            "media_id": pa.array([f"media-{i:06d}" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(mtypes),
            "width": pa.array([32 if i % 2 == 0 else 0 for i in range(n)], pa.int32()),
            "height": pa.array([24 if i % 2 == 0 else 0 for i in range(n)], pa.int32()),
            "duration_ms": pa.array([0 if i % 2 == 0 else 50 for i in range(n)], pa.int32()),
        }
    )
