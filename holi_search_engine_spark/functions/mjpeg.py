"""Pure-stdlib/numpy MJPEG-in-AVI codec: a baseline JPEG decoder +
encoder (ITU-T T.81, public spec) and a minimal RIFF/AVI container
parser + writer.

Why this exists: the reference pipeline treats media as opaque payloads;
our multimodal operators (SURVEY §2.7 additions) decode PNG and WAV for
real with stdlib codecs, and video was the one remaining gated stub
(round-3 verdict item #8: "a deterministic MJPEG-in-AVI decoder ... or
close the branch permanently").  MJPEG-in-AVI is the one video format
that needs NO external codec: the container is plain RIFF chunk walking
and each frame is an independent baseline JPEG — decodable with a
Huffman bit reader and an 8x8 IDCT, both implementable from the public
spec in numpy.

Scope (deliberately the baseline subset):

- decoder: SOF0 (baseline sequential DCT, 8-bit), grayscale or 3-channel
  YCbCr at any sampling factors (4:4:4, 4:2:0, ...), restart markers,
  byte unstuffing.  Progressive (SOF2) and arithmetic coding are out of
  scope and raise.
- encoder: grayscale or RGB 4:4:4, Annex K quantization tables with the
  libjpeg quality scaling, standard Huffman tables (written into the
  stream via DHT, so the codec is self-consistent end-to-end even
  offline).  Exists to make the decoder ROUND-TRIP-TESTABLE in a
  container with no image library (tests/test_multimodal.py asserts
  PSNR bounds encoder->decoder).

The Spark-side plumbing (schema, partitioning, Arrow batch shape) in
``operators/multimodal.py`` routes video payloads here via
``decode_media``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Index i of the zigzag sequence -> (row, col) flat index."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            cells.reverse()
        order.extend(cells)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag()  # zigzag position -> natural position
UNZIGZAG = np.argsort(ZIGZAG)  # natural position -> zigzag position

# Annex K (T.81 §K.1) quantization tables, natural (row-major) order
QUANT_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QUANT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Annex K Huffman tables as (bits[1..16], values).  The encoder WRITES
# these into DHT segments, so round-trip correctness is self-contained.
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8-point DCT-II matrix: forward F = T @ B @ T.T, inverse
# B = T.T @ F @ T (T.81 A.3.3 up to the orthonormal scaling)
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos(
            (2 * _n + 1) * _k * np.pi / 16
        )


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    return {(ln, c): v for v, (c, ln) in _huff_codes(bits, values).items()}


# ---------------------------------------------------------------------------
# JPEG decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            return 0  # T.81 F.2.2.5: pad past the end with 1s/0s — EOB territory
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(
    reader: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8x8 block of quantized coefficients in ZIGZAG order."""

    def huff(tab):
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            v = tab.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in scan")

    zz = np.zeros(64, dtype=np.int32)
    s = huff(dc_tab)
    pred += _extend(reader.read_bits(s), s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = huff(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, pred


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 array (h, w) grayscale or (h, w, 3) RGB.

    Raises ``ValueError`` for anything undecodable — including truncated
    streams, which internally surface as short-read ``struct.error`` /
    ``IndexError`` from the segment parser and bit reader and are
    normalized here so callers handle ONE exception type (the fake-mode
    media path and the fuzz tests rely on this contract)."""
    try:
        return _jpeg_decode_inner(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or corrupt JPEG stream: {e}") from e


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    saw_dht = False  # gates the OpenDML default-table fallback (see SOS)
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan: list[bytes] | None = None  # entropy segments split at RST markers
    scan_comps: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[o + 1:o + 65], dtype=np.uint8).astype(np.int32)
                quant[tq] = tbl[UNZIGZAG]  # store natural order
                o += 65
        elif marker == 0xC4:  # DHT
            saw_dht = True
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                values = list(seg[o + 17:o + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_lookup(bits, values)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential DCT (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i:3 + 2 * i]
                c = next(c for c in comps if c["id"] == cid)
                # MJPEG-in-AVI (OpenDML) allows abbreviated frames that
                # omit DHT ENTIRELY and imply the Annex K tables: id 0 =
                # luminance, anything else = chrominance.  The fallback is
                # restricted to that no-DHT-at-all case: a stream that DID
                # define tables but references an absent id is corrupt,
                # and silently backfilling it would decode to garbage —
                # raise instead (mirrors the missing-DQT path below).
                td, ta = tabs >> 4, tabs & 0xF
                if (td not in huff_dc or ta not in huff_ac) and saw_dht:
                    missing = "DC" if td not in huff_dc else "AC"
                    mid = td if td not in huff_dc else ta
                    raise ValueError(
                        f"scan references undefined {missing} Huffman table "
                        f"{mid} in a stream that defines other tables"
                    )
                if td not in huff_dc:
                    huff_dc[td] = _huff_lookup(*(DC_LUM if td == 0 else DC_CHROM))
                if ta not in huff_ac:
                    huff_ac[ta] = _huff_lookup(*(AC_LUM if ta == 0 else AC_CHROM))
                if c["tq"] not in quant:
                    raise ValueError(f"missing quantization table {c['tq']}")
                scan_comps.append(
                    {**c, "dc": huff_dc[td], "ac": huff_ac[ta]}
                )
            # entropy-coded data runs from here to the next non-RST marker
            o = pos + seglen
            raw = bytearray()
            segments = [raw]
            while o < len(data) - 1:
                if data[o] == 0xFF:
                    nxt = data[o + 1]
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        o += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart: new segment
                        segments.append(bytearray())
                        o += 2
                        continue
                    break  # real marker (EOI): scan over
                segments[-1].append(data[o])
                o += 1
            scan = [bytes(s) for s in segments]
            pos = o
            break
        pos += seglen
    if scan is None or not comps:
        raise ValueError("no scan data")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in scan_comps
    ]
    preds = [0] * len(scan_comps)
    seg_iter = iter(scan)
    reader = _BitReader(next(seg_iter))
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader = _BitReader(next(seg_iter))
                preds = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                q = quant[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz, preds[ci] = _decode_block(
                            reader, c["dc"], c["ac"], preds[ci]
                        )
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz  # zigzag -> natural
                        block = (coef * q).reshape(8, 8)
                        pix = _T.T @ block @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    if len(scan_comps) == 1:
        out = planes[0][:h, :w]
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    # upsample chroma to luma resolution (nearest), then YCbCr -> RGB
    full = []
    for c, p in zip(scan_comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# JPEG encoder (grayscale / RGB 4:4:4) — exists to round-trip-test the
# decoder offline; tables are written into the stream, so any consumer
# reading DQT/DHT (ours does) decodes it exactly.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(
    wtr: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    coef = _T @ (block - 128.0) @ _T.T
    zz = np.rint(coef.ravel()[ZIGZAG] / q.ravel()[ZIGZAG]).astype(np.int32)
    diff = int(zz[0]) - pred
    pred = int(zz[0])

    def mag(v: int) -> tuple[int, int]:
        s = int(abs(v)).bit_length()
        return s, (v if v >= 0 else v + (1 << s) - 1)

    s, bitsv = mag(diff)
    c, ln = dc_codes[s]
    wtr.write(c, ln)
    if s:
        wtr.write(bitsv, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            wtr.write(c, ln)
            run -= 16
        s, bitsv = mag(v)
        c, ln = ac_codes[(run << 4) | s]
        wtr.write(c, ln)
        wtr.write(bitsv, s)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        wtr.write(c, ln)
    return pred


def _dht_segment(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    bits, values = table
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, q: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(x) for x in q.ravel()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1:h, :]  # edge-replicate padding
    pp[:, w:] = pp[:, w - 1:w]
    return pp


def jpeg_encode(arr: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 (chroma at half resolution, 2x2-mean
    downsampled; luma sampling 2x2) — exists chiefly so the decoder's
    generic multi-sampling MCU path is round-trip-testable offline."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qlum = _scaled_quant(QUANT_LUM, quality)
    qchrom = _scaled_quant(QUANT_CHROM, quality)
    if gray:
        planes = [arr]
        qs = [qlum]
        samps = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qs = [qlum, qchrom, qchrom]
        samps = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samps):
        if sh < hmax or sv < vmax:  # downsample chroma by block mean
            fy, fx = vmax // sv, hmax // sh
            pe = _pad_edge(p, -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx)
            p = pe.reshape(pe.shape[0] // fy, fy, pe.shape[1] // fx, fx).mean(axis=(1, 3))
        padded.append(_pad_edge(p, mcus_y * 8 * sv, mcus_x * 8 * sh))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, qlum)
    if not gray:
        out += _dqt_segment(1, qchrom)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samps[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROM) + _dht_segment(1, 1, AC_CHROM)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHROM)]
    ac_codes = [_huff_codes(*AC_LUM), _huff_codes(*AC_CHROM)]
    wtr = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                sh, sv = samps[ci]
                t = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_block(
                            wtr,
                            padded[ci][y0:y0 + 8, x0:x0 + 8],
                            qs[ci],
                            dc_codes[t],
                            ac_codes[t],
                            preds[ci],
                        )
    if wtr.n:  # pad the final partial byte with 1s
        pad = 8 - wtr.n
        wtr.write((1 << pad) - 1, pad)
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# RIFF / AVI container
# ---------------------------------------------------------------------------

_AVI_MAGIC = (b"RIFF", b"AVI ")


def is_avi(data: bytes) -> bool:
    return data[:4] == _AVI_MAGIC[0] and data[8:12] == _AVI_MAGIC[1]


def avi_decode_frames(data: bytes) -> list[bytes]:
    """Walk the RIFF tree, return the compressed ('..dc') / uncompressed
    ('..db') video chunks of the 'movi' list in stream order."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    riff_end = 12 + struct.unpack("<I", data[4:8])[0] - 4
    # the RIFF size field covers the whole payload, so a file cut ANYWHERE
    # inside it is detectable up front — raise instead of silently
    # returning a frame prefix (a data pipeline must not half-decode)
    if riff_end > len(data):
        raise ValueError(
            f"truncated AVI: RIFF declares {riff_end} bytes, have {len(data)}"
        )

    def walk(o: int, end: int) -> None:
        while o + 8 <= end:
            cid = data[o:o + 4]
            (size,) = struct.unpack("<I", data[o + 4:o + 8])
            body_start = o + 8
            if body_start + size > end:  # chunk overruns its parent
                raise ValueError(f"truncated AVI chunk {cid!r}")
            if cid == b"LIST":
                ltype = data[body_start:body_start + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk(body_start + 4, body_start + size)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(data[body_start:body_start + size])
            o = body_start + size + (size & 1)  # chunks pad to even

    walk(12, riff_end)
    return frames


def avi_meta(data: bytes) -> dict:
    """width/height/frame count from the 'avih' main header."""
    if not is_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    if 12 + struct.unpack("<I", data[4:8])[0] - 4 > len(data):
        raise ValueError("truncated AVI: RIFF size exceeds payload")
    o = 12
    while o + 8 <= len(data):
        cid = data[o:o + 4]
        (size,) = struct.unpack("<I", data[o + 4:o + 8])
        # same contract as avi_decode_frames.walk(): a size field that
        # overruns the payload is a truncation/corruption, raised as the
        # normalized ValueError — never a raw struct.error from a short
        # slice further down
        if o + 8 + size > len(data):
            raise ValueError(f"truncated AVI chunk {cid!r}")
        if cid == b"LIST" and data[o + 8:o + 12] == b"hdrl":
            io_ = o + 12
            while io_ + 8 <= o + 8 + size:
                scid = data[io_:io_ + 4]
                (ssize,) = struct.unpack("<I", data[io_ + 4:io_ + 8])
                if io_ + 8 + ssize > o + 8 + size:  # overruns parent LIST
                    raise ValueError(f"truncated AVI header chunk {scid!r}")
                if scid == b"avih":
                    if len(data) < io_ + 64:
                        raise ValueError("truncated avih header")
                    f = struct.unpack("<14I", data[io_ + 8:io_ + 64])
                    return {
                        "us_per_frame": f[0],
                        "total_frames": f[4],
                        "width": f[8],
                        "height": f[9],
                    }
                io_ += 8 + ssize + (ssize & 1)
        o += 8 + size + (size & 1)
    raise ValueError("no avih header")


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def avi_encode_frames(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal MJPG AVI: hdrl (avih + one vids/MJPG strl) + movi."""
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1), 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)
