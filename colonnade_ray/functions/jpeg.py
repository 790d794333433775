"""Baseline JPEG (JFIF) codec from the stdlib + numpy — no image
libraries.

Closes the last compressed-image stub behind ``stdlib_decoder``:
``decode_jpeg`` handles baseline sequential DCT (SOF0), 8-bit,
grayscale or YCbCr with any (H, V) sampling factors up to 2x2
(4:4:4 / 4:2:2 / 4:2:0), restart markers, and multi-segment
DQT/DHT; Huffman tables are read FROM THE FILE (DHT), so decode
correctness never depends on baked-in table constants.  Progressive
(SOF2), arithmetic coding, and 12-bit precision raise
``NotImplementedError`` honestly.

``encode_jpeg`` writes baseline 4:4:4 (or grayscale, or 4:2:0 via
``subsample=True``) with the Annex-K-style quantization scaled by
``quality`` — enough to exercise every decoder path and to round-trip
pixel content within the DCT quantization error (the test asserts
PSNR bounds and near-exactness on flat blocks).

Everything block-shaped is vectorized: the 8x8 forward/inverse DCT
is two matmuls against a precomputed cosine basis applied to ALL
blocks of a plane at once; only the entropy coder walks symbols (it
is bit-serial by nature; payload-sized, not pixel-sized).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex-K-style base quantization (luminance / chrominance)
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Huffman table specs the ENCODER writes (decoder always reads DHT,
# so decode correctness never depends on these): DC tables code the
# value category 0..11, AC tables code (run, size) bytes.  Flat
# canonical shapes — suboptimal bitrate, irrelevant for round-trip.
_DC_BITS = [0, 0, 0, 12] + [0] * 12       # 12 symbols, all 4 bits
_DC_VALS = list(range(12))


def _ac_symbols() -> list:
    """Every (run, size) symbol baseline AC coding can emit: EOB
    (0x00), ZRL (0xF0), and run 0-15 x size 1-10."""
    syms = [0x00, 0xF0]
    for r in range(16):
        for s in range(1, 11):
            syms.append((r << 4) | s)
    return syms


_AC_VALS = _ac_symbols()
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)  # all 162 symbols at 8 bits (<= 256,
#                              no shorter codes -> valid canonical)


def _dct_basis() -> np.ndarray:
    k = np.arange(8)
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    return 0.5 * c[:, None] * M  # rows = frequency, cols = space


_BASIS = _dct_basis()


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) coefficients."""
    return _BASIS @ blocks @ _BASIS.T


def _idct(blocks: np.ndarray) -> np.ndarray:
    return _BASIS.T @ blocks @ _BASIS


def _canonical_codes(bits, vals):
    """JPEG canonical Huffman: (code, length) per symbol value."""
    codes = {}
    code = 0
    k = 0
    for li in range(16):
        for _ in range(bits[li]):
            codes[vals[k]] = (code, li + 1)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment (0xFF00 de-stuffed, RSTn
    markers consumed by ``restart``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker: feed padding bits (caller handles restarts /
                # end via restart()/at_marker)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                self.pos += 1
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _HuffDecoder:
    """Canonical-table decoder with per-length (min, max, base) —
    O(code length) per symbol."""

    def __init__(self, bits, vals):
        self.vals = list(vals)
        self.mins, self.maxs, self.base = {}, {}, {}
        code = 0
        k = 0
        for li in range(16):
            n = bits[li]
            if n:
                self.mins[li + 1] = code
                self.maxs[li + 1] = code + n - 1
                self.base[li + 1] = k
                code += n
                k += n
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bits(1)
            mx = self.maxs.get(length)
            if mx is not None and code <= mx:
                return self.vals[self.base[length] + code
                                 - self.mins[length]]
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG signed-magnitude: s-bit value -> signed coefficient."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return [np.clip(np.round(x), 0, 255).astype(np.uint8)
            for x in (r, g, b)]


def _rgb_to_ycbcr(img: np.ndarray):
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(payload: bytes,
                media_type: str = "image/jpeg") -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) RGB (or (h, w, 1) grayscale) uint8.
    See module docstring for the supported envelope."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    sof = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64],
                                        np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128],
                                        ">u2").astype(np.int64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffDecoder(bits, vals)
                p += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            sof = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0xFF{marker:02X} (baseline "
                "sequential SOF0 only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i : 3 + 2 * i]
                scomps.append({"id": cs, "td": tda >> 4,
                               "ta": tda & 15})
            data_start = pos + seglen
            return _decode_scan(payload, data_start, sof, scomps, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(payload, start, sof, scomps, qt, huff_dc, huff_ac,
                 restart_interval):
    if sof is None:
        raise ValueError("JPEG SOS before SOF")
    h, w, comps = sof["h"], sof["w"], sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for sc in scomps:
        c = by_id[sc["id"]]
        c["td"], c["ta"] = sc["td"], sc["ta"]
    # coefficient planes per component (MCU-padded)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 8, 8), np.float64)
        c["pred"] = 0
    br = _BitReader(payload, start)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and \
                    mcu_n % restart_interval == 0:
                br.restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_t = huff_dc[c["td"]]
                ac_t = huff_ac[c["ta"]]
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for u in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = dc_t.decode(br)
                        diff = _extend(br.bits(s), s) if s else 0
                        c["pred"] += diff
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 15
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run past block end")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = (zz * q).astype(np.float64)
                        bi = ((my * c["v"] + v) * c["bw"]
                              + mx * c["h"] + u)
                        c["coef"][bi] = blk.reshape(8, 8)
            mcu_n += 1
    planes = []
    for c in comps:
        spatial = _idct(c["coef"]) + 128.0
        # blocks -> plane
        plane = spatial.reshape(c["bh"], c["bw"], 8, 8) \
            .transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255) \
            .astype(np.uint8)[..., None]
    r, g, b = _ycbcr_to_rgb(*planes)
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# Encoder


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n, 8, 8) in raster block
    order."""
    H, W = plane.shape
    return plane.reshape(H // 8, 8, W // 8, 8) \
        .transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    H, W = plane.shape
    return np.pad(plane, ((0, bh - H), (0, bw - W)), mode="edge")


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 -> baseline
    JFIF bytes.  ``subsample=True`` writes 4:2:0 (Y at 2x2, chroma at
    1x1); ``restart_interval=N`` emits DRI + RSTn markers every N
    MCUs — both exist to exercise the decoder's full envelope."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[..., 0]
    h, w = img.shape[:2]
    ql = _scale_q(QL, quality)
    qc = _scale_q(QC, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [0]
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample \
            else [(1, 1), (1, 1), (1, 1)]
        qts = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtabs = [ql, qc]
    # per-component quantized zigzag blocks, in raster block order
    comp_zz = []
    for p, (sh, sv), tq in zip(planes, samp, qts):
        if (sh, sv) != (hmax, vmax):
            # box-average downsample by the sampling ratio
            fy, fx = vmax // sv, hmax // sh
            H2 = (h + fy - 1) // fy
            W2 = (w + fx - 1) // fx
            pp = _pad_to(p, H2 * fy, W2 * fx)
            p = pp.reshape(H2, fy, W2, fx).mean(axis=(1, 3))
        bh, bw = mcuy * sv * 8, mcux * sh * 8
        p = _pad_to(p, bh, bw)
        blocks = _plane_blocks(p) - 128.0
        coefs = _fdct(blocks)
        q = qtabs[tq].astype(np.float64)
        # spatial->zigzag reorder, then quantize: stored table entry k
        # divides zigzag coefficient k (the decoder multiplies back in
        # the same convention)
        flat = coefs.reshape(-1, 64)
        zz = np.round(flat[:, ZIGZAG] / q[None, :]).astype(np.int64)
        comp_zz.append(zz)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bwriter = _BitWriter()
    chunks = []  # flushed entropy segments + RST markers
    preds = [0] * len(planes)
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and \
                    mcu_n % restart_interval == 0:
                chunks.append(bwriter.flush())
                chunks.append(bytes([0xFF,
                                     0xD0 + ((mcu_n // restart_interval
                                              - 1) % 8)]))
                bwriter = _BitWriter()
                preds = [0] * len(planes)
            mcu_n += 1
            for ci, (sh, sv) in enumerate(samp):
                bw_c = mcux * sh
                for v in range(sv):
                    for u in range(sh):
                        bi = (my * sv + v) * bw_c + mx * sh + u
                        zz = comp_zz[ci][bi]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = _category(diff)
                        code, ln = dc_codes[s]
                        bwriter.write(code, ln)
                        if s:
                            val = diff if diff >= 0 \
                                else diff + (1 << s) - 1
                            bwriter.write(val, s)
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) \
                            if np.any(zz[1:]) else 0
                        for k in range(1, last_nz + 1):
                            v_ = int(zz[k])
                            if v_ == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[0xF0]
                                bwriter.write(code, ln)
                                run -= 16
                            s = _category(v_)
                            code, ln = ac_codes[(run << 4) | s]
                            bwriter.write(code, ln)
                            val = v_ if v_ >= 0 else v_ + (1 << s) - 1
                            bwriter.write(val, s)
                            run = 0
                        if last_nz < 63:
                            code, ln = ac_codes[0x00]
                            bwriter.write(code, ln)
    chunks.append(bwriter.flush())
    entropy = b"".join(chunks)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, qts[i]])
    seg(0xC0, sof)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    seg(0xC4, dht)
    dht = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    seg(0xC4, dht)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)
