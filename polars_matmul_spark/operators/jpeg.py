"""JPEG decode/encode in pure NumPy — no codec library.

JPEG (ITU T.81 / ISO 10918-1) is, like PNG, decodable from first
principles: the only "codec" work is Huffman entropy coding,
zigzag/quantization bookkeeping, and the 8x8 DCT — all expressible
with stdlib + NumPy. This closes the JPEG branch of the multimodal
layer's env-blocked stub (the reference repo has no image surface at
all — its SURVEY §2.3 scope is two similarity pyfunctions; this
module is part of the training-pipeline extension layer, used by
``decoded_asset_stats`` / ``resize_bmp_real`` via
``multimodal._decode_image_rgb``).

Scope: baseline sequential (SOF0/1) AND progressive (SOF2 — spectral
selection, successive approximation, EOB-run coding, DC/AC refinement
scans per T.81 annex G), 8-bit precision, grayscale or YCbCr,
sampling factors 1x1 / 2x1 / 1x2 / 2x2, restart intervals. Lossless/
hierarchical frames, arithmetic coding, and 12-bit precision raise
ValueError.

The encoders (``encode_jpeg``, ``encode_jpeg_progressive``) exist as
the writing sinks and the test harness: Annex-K example quantization
tables (quality-scaled per the IJG rule); the baseline encoder uses
the Annex-K Huffman tables, the progressive encoder generates an
OPTIMAL table per scan (T.81 K.2 — the fixed Annex-K tables lack the
EOBn symbols progressive needs, which is why every progressive
encoder optimizes), 4:4:4 or 4:2:0. JPEG is lossy, so tests assert
exactness only where the math guarantees it (flat blocks quantize
exactly; baseline and progressive streams of the SAME image decode
BIT-identically because both encoders quantize with the same
per-block routine) and PSNR bounds elsewhere; the IDCT is
additionally pinned against an independent scalar transcription of
the T.81 equation, and compressed streams for both frame types are
built BY HAND in the tests (bit-level, from the spec) so the decoder
has fixtures no code in this repo produced.

Scale note: decoding happens inside mapInPandas batches per asset —
embarrassingly parallel, no shuffle; per-asset work is O(pixels) with
the only Python-level loop being the Huffman symbol walk (bounded by
the compressed byte count).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# ---------------------------------------------------------------------------
# shared tables

#: zigzag order: _ZIGZAG[k] = (row-major index of the k-th zigzag coeff)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: T.81 Annex K.1 example luminance / chrominance quantization tables
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 example Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II basis: _DCT_M[u, x] = C(u)/2 * cos((2x+1)u*pi/16)
_DCT_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of an 8x8 coefficient block (T.81 A.3.3),
    separable: f = M^T S M with the orthonormal 1-D basis."""
    return _DCT_M.T @ block @ _DCT_M


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


# ---------------------------------------------------------------------------
# Huffman machinery


def _build_decode_table(bits, huffval):
    """(bits, huffval) -> dict[(length, code)] = symbol, per T.81 C.2."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    """(bits, huffval) -> dict[symbol] = (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with FF00
    de-stuffing and RSTn awareness (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, start: int):
        self.data, self.pos = data, start
        self.acc, self.nbits = 0, 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits past the end (spec allows trailing pad)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                else:
                    # any marker ends the entropy segment: stop
                    # consuming and pad bits (progressive scans are
                    # followed by DHT/SOS/EOI, baseline by RSTn/EOI;
                    # a code that needs the pad bits is malformed and
                    # surfaces as an invalid-Huffman-code error)
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self):
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self.acc, self.nbits = 0, 0
        d = self.data
        # skip any pad FFs, then expect FFD0-FFD7
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude v to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL JPEG decode — pure NumPy. Baseline sequential (SOF0/1)
    AND progressive (SOF2: spectral selection, successive
    approximation, EOB runs, DC/AC refinement scans, per T.81 G).
    Returns uint8 ``(h, w)`` for grayscale or ``(h, w, 3)`` RGB for
    YCbCr input (JFIF BT.601 conversion, chroma upsampled by pixel
    replication). Raises ValueError on non-JPEG,
    lossless/hierarchical/arithmetic/12-bit, or malformed streams."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, comps); comps: (cid, hs, vs, tq)
    progressive = False
    coeff = None  # progressive: per-comp (bh, bw, 64) zigzag coeff store
    restart_interval = 0
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG stream")
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                table = np.zeros(64, dtype=np.int64)
                table[_ZIGZAG] = vals
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, huffval)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_id))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(baseline sequential and progressive are implemented)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_sel = []  # (cid, td, ta) in scan order
            for c in range(ns):
                cs, tds = body[1 + 2 * c], body[2 + 2 * c]
                scan_sel.append((cs, tds >> 4, tds & 0x0F))
            if not progressive:
                return _decode_scan(
                    payload, pos + 2 + seg_len, frame,
                    qt, huff, {c: (td, ta) for c, td, ta in scan_sel},
                    restart_interval,
                )
            if frame is None:
                raise ValueError("SOS before SOF")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if coeff is None:
                coeff = _alloc_coeff_stores(frame)
            pos = _decode_scan_progressive(
                payload, pos + 2 + seg_len, frame, coeff, huff,
                scan_sel, ss, se, ahal >> 4, ahal & 0x0F,
                restart_interval,
            )
            continue
        # APPn / COM / others: skip
        pos += 2 + seg_len
    if progressive and coeff is not None:
        return _finish_progressive(frame, coeff, qt)
    raise ValueError("no SOS marker — truncated JPEG")


def _decode_scan(payload, start, frame, qt, huff, scan_tables, dri):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame
    if h < 1 or w < 1:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        raise ValueError("unsupported sampling factors (1 or 2 only)")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = [
        np.zeros((mcus_y * c[2] * 8, mcus_x * c[1] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(payload, start)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq_id) in enumerate(comps):
                if cid not in scan_tables:
                    raise ValueError(f"component {cid} missing from scan")
                td, ta = scan_tables[cid]
                dc_tab, ac_tab = huff.get((0, td)), huff.get((1, ta))
                if dc_tab is None or ac_tab is None or tq_id not in qt:
                    raise ValueError("missing Huffman/quant table")
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.huff(dc_tab)
                        if t > 11:
                            raise ValueError(f"bad DC category {t}")
                        pred[ci] += _extend(reader.bits(t), t)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[_ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * qt[tq_id])
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Level-shift, chroma-upsample, crop and color-convert decoded
    component planes (shared by the baseline and progressive paths)."""
    out_planes = []
    for ci, (cid, hs, vs, tq_id) in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full MCU-grid resolution by pixel replication
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 annex G: spectral selection + successive
# approximation, EOB runs, DC/AC refinement)


def _frame_geometry(frame):
    """(hmax, vmax, mcus_x, mcus_y, nominal block grids per comp)."""
    h, w, comps = frame
    if h < 1 or w < 1:
        raise ValueError(f"bad JPEG dimensions {w}x{h}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not all(1 <= c[1] <= 2 and 1 <= c[2] <= 2 for c in comps):
        raise ValueError("unsupported sampling factors (1 or 2 only)")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    nominal = []
    for cid, hs, vs, tq_id in comps:
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        nominal.append((-(-ch // 8), -(-cw // 8)))
    return hmax, vmax, mcus_x, mcus_y, nominal


def _alloc_coeff_stores(frame):
    """Per-component zigzag-order coefficient stores at the MCU-padded
    block grid (interleaved DC scans write the dummy blocks too)."""
    h, w, comps = frame
    hmax, vmax, mcus_x, mcus_y, _ = _frame_geometry(frame)
    return [
        np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        for cid, hs, vs, tq_id in comps
    ]


def _decode_scan_progressive(
    payload, start, frame, coeff, huff, scan_sel, ss, se, ah, al, dri
):
    """Decode one progressive scan into the coefficient stores and
    return the payload position of the next marker."""
    h, w, comps = frame
    hmax, vmax, mcus_x, mcus_y, nominal = _frame_geometry(frame)
    if ss > se or se > 63 or al > 13 or ah > 13:
        raise ValueError(f"bad progressive scan header Ss={ss} Se={se}")
    if ss == 0 and se != 0:
        raise ValueError("DC scan must have Se=0")
    if ss > 0 and len(scan_sel) != 1:
        raise ValueError("progressive AC scans hold exactly one component")
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    members = []  # (ci, dc_table_or_None, ac_table_or_None)
    for cid, td, ta in scan_sel:
        if cid not in cid_to_ci:
            raise ValueError(f"component {cid} missing from frame")
        ci = cid_to_ci[cid]
        dc_tab = ac_tab = None
        if ss == 0 and ah == 0:  # DC first needs a DC table
            dc_tab = huff.get((0, td))
            if dc_tab is None:
                raise ValueError("missing DC Huffman table")
        if ss > 0:  # AC scans need an AC table
            ac_tab = huff.get((1, ta))
            if ac_tab is None:
                raise ValueError("missing AC Huffman table")
        members.append((ci, dc_tab, ac_tab))
    reader = _BitReader(payload, start)
    state = {"eobrun": 0, "pred": [0] * len(comps)}
    p1 = 1 << al

    def dc_first(ci, blk, dc_tab):
        t = reader.huff(dc_tab)
        if t > 11:
            raise ValueError(f"bad DC category {t}")
        state["pred"][ci] += _extend(reader.bits(t), t)
        blk[0] = state["pred"][ci] << al

    def dc_refine(blk):
        if reader.bits(1):
            blk[0] |= p1

    def ac_first(blk, ac_tab):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.huff(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.bits(s), s) << al
            k += 1

    def _correction(blk, k):
        # T.81 G.1.2.3: refine an already-nonzero coefficient by one
        # appended bit (never flips sign, only grows the magnitude)
        if reader.bits(1) and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else -p1

    def ac_refine(blk, ac_tab):
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.huff(ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    if s != 1:
                        raise ValueError("bad refinement magnitude bits")
                    val = p1 if reader.bits(1) else -p1
                else:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.bits(r)
                        break
                    val = 0  # ZRL: pass 16 zero-history coefficients
                while k <= se:
                    if blk[k] != 0:
                        _correction(blk, k)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("refinement run past band end")
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    _correction(blk, k)
                k += 1
            state["eobrun"] -= 1

    def do_unit(ci, by, bx, dc_tab, ac_tab):
        blk = coeff[ci][by, bx]
        if ss == 0:
            if ah == 0:
                dc_first(ci, blk, dc_tab)
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(blk, ac_tab)
            else:
                ac_refine(blk, ac_tab)

    n_units = 0

    def maybe_restart():
        nonlocal n_units
        if dri and n_units and n_units % dri == 0:
            reader.sync_restart()
            state["eobrun"] = 0
            state["pred"] = [0] * len(comps)
        n_units += 1

    if len(members) > 1:  # interleaved (DC scans only): MCU order
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for ci, dc_tab, ac_tab in members:
                    hs, vs = comps[ci][1], comps[ci][2]
                    for by in range(vs):
                        for bx in range(hs):
                            do_unit(
                                ci, my * vs + by, mx * hs + bx,
                                dc_tab, ac_tab,
                            )
    else:  # non-interleaved: the component's own block grid (A.2.2)
        ci, dc_tab, ac_tab = members[0]
        nbh, nbw = nominal[ci]
        for by in range(nbh):
            for bx in range(nbw):
                maybe_restart()
                do_unit(ci, by, bx, dc_tab, ac_tab)

    # locate the next marker (skip pad bytes, stuffing and stray RSTn)
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF:
            nxt = payload[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("truncated JPEG after progressive scan")


def _finish_progressive(frame, coeff, qt) -> np.ndarray:
    """Dequantize + IDCT every accumulated coefficient block (one
    einsum per component) and assemble the pixels."""
    h, w, comps = frame
    hmax, vmax, _, _, _ = _frame_geometry(frame)
    planes = []
    for ci, (cid, hs, vs, tq_id) in enumerate(comps):
        if tq_id not in qt:
            raise ValueError("missing quantization table")
        st = coeff[ci]
        bh, bw, _ = st.shape
        nat = np.zeros((bh, bw, 64), dtype=np.int64)
        nat[..., _ZIGZAG] = st
        blocks = nat.reshape(bh, bw, 8, 8) * qt[tq_id]
        # per-block _idct2, the very routine the baseline scan uses —
        # batched matmul kernels round differently, and the contract
        # here is BIT-identical pixels between the two paths
        plane = np.empty((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(
                    blocks[by, bx]
                )
        planes.append(plane)
    return _assemble(planes, comps, h, w, hmax, vmax)


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> base tables, 100 -> all-ones."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255)


def _prepare_planes(img: np.ndarray, quality: int, subsample: bool):
    """Shared encoder front half: validate, JFIF color transform,
    optional 4:2:0 chroma box-average, quality-scaled Annex-K quant
    tables, MCU-grid padding with edge replication. Returns
    (gray, h, w, padded level-shifted planes, samp, qts,
    mcus_x, mcus_y)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg wants a uint8 (h,w) or (h,w,3) array")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError(f"unsupported channel count {img.shape[2]}")
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # pad to even, box-average 2x2
            cbp = _pad_to(cb, 2)
            crp = _pad_to(cr, 2)
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2]
                  + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2]
                  + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    qts = [_scale_qt(_QT_LUMA, quality).reshape(8, 8)]
    if not gray:
        qts.append(_scale_qt(_QT_CHROMA, quality).reshape(8, 8))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad each plane to its MCU-grid size (edge replication)
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        th, tw = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.empty((th, tw))
        ph, pw = min(p.shape[0], th), min(p.shape[1], tw)
        pp[:ph, :pw] = p[:ph, :pw]
        pp[ph:, :pw] = pp[ph - 1 : ph, :pw]
        pp[:, pw:] = pp[:, pw - 1 : pw]
        padded.append(pp - 128.0)
    return gray, h, w, padded, samp, qts, mcus_x, mcus_y


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline-JPEG writing sink for uint8 gray ``(h, w)`` or RGB
    ``(h, w, 3)`` arrays: Annex-K tables (quality-scaled), 4:4:4 by
    default or 4:2:0 with ``subsample=True`` (box-average chroma);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart resync)."""
    gray, h, w, padded, samp, qts, mcus_x, mcus_y = _prepare_planes(
        img, quality, subsample
    )
    # encode tables per component: (qt_id, dc_table, ac_table)
    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]

    writer = _BitWriter()
    pred = [0] * len(padded)
    inv_zigzag = _ZIGZAG  # coef.flat[_ZIGZAG] produces zigzag order
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes(
                    [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                )
                pred = [0] * len(padded)
            n_mcu += 1
            for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
                tq = 0 if ci == 0 else 1
                dct_q, acd, dcd = qts[tq], ac_enc[min(ci, 1)], dc_enc[min(ci, 1)]
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        coef = np.round(_dct2(block) / dct_q).astype(np.int64)
                        zz = coef.flat[inv_zigzag]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t = _category(diff)
                        code, length = dcd[t]
                        writer.write(code, length)
                        if t:
                            mag = diff if diff >= 0 else diff + (1 << t) - 1
                            writer.write(mag & ((1 << t) - 1), t)
                        # AC: run-length of zeros + (ZRL | EOB)
                        nz = np.nonzero(zz[1:])[0]
                        last = int(nz[-1]) + 1 if len(nz) else 0
                        run = 0
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = acd[0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            s = _category(v)
                            code, length = acd[(run << 4) | s]
                            writer.write(code, length)
                            mag = v if v >= 0 else v + (1 << s) - 1
                            writer.write(mag & ((1 << s) - 1), s)
                            run = 0
                        if last < 63:
                            code, length = acd[0x00]  # EOB
                            writer.write(code, length)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qts):
        out += seg(0xDB, bytes([tq]) + bytes(q.flat[inv_zigzag].astype(np.uint8)))
    nc = len(padded)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    tables = [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
    if not gray:
        tables += [(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)]
    for tc, th, (bits, huffval) in tables:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _pad_to(p: np.ndarray, m: int) -> np.ndarray:
    th = -(-p.shape[0] // m) * m
    tw = -(-p.shape[1] // m) * m
    out = np.empty((th, tw))
    out[: p.shape[0], : p.shape[1]] = p
    out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
    out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
    return out


# ---------------------------------------------------------------------------
# progressive encoding (T.81 annex G encoder side + K.2 optimal tables)


def _gen_huffman_table(freq):
    """Optimal length-limited Huffman table from symbol frequencies,
    per T.81 K.2 (the flowcharts behind every optimizing JPEG
    encoder): pairwise merge by lowest frequency, count code lengths,
    fold lengths > 16 down, and reserve the all-ones code via a
    sentinel 257th symbol. Returns ``(bits[16], huffval)``."""
    freq = list(freq) + [1]  # sentinel keeps the all-ones code unused
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = c2 = -1
        v = None
        for i, f in enumerate(freq):  # least freq, biggest index wins ties
            if f and (v is None or f <= v):
                v, c1 = f, i
        v = None
        for i, f in enumerate(freq):
            if f and i != c1 and (v is None or f <= v):
                v, c2 = f, i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    counts = [0] * 33
    for size in codesize:
        if size:
            counts[size] += 1
    for length in range(32, 16, -1):  # fold lengths > 16 (K.2 "adjust")
        while counts[length] > 0:
            j = length - 2
            while counts[j] == 0:
                j -= 1
            counts[length] -= 2
            counts[length - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
    for length in range(16, 0, -1):  # drop the sentinel's slot
        if counts[length] > 0:
            counts[length] -= 1
            break
    huffval = [
        sym
        for size in range(1, 33)
        for sym in range(256)
        if codesize[sym] == size
    ]
    return counts[1:17], huffval


class _SymbolCounter:
    """Pass-1 emitter: tallies Huffman symbols, ignores raw bits."""

    def __init__(self):
        self.freq = [0] * 256

    def symbol(self, s):
        self.freq[s] += 1

    def bits(self, v, n):
        pass


class _SymbolWriter:
    """Pass-2 emitter: writes Huffman codes + raw bits to a
    _BitWriter."""

    def __init__(self, writer, table):
        self.writer, self.table = writer, table

    def symbol(self, s):
        code, length = self.table[s]
        self.writer.write(code, length)

    def bits(self, v, n):
        if n:
            self.writer.write(v & ((1 << n) - 1), n)


def _default_scan_script(nc):
    """IJG-shaped progressive scan script: DC first at Al=1 then
    refine; luma AC split into two spectral bands with two successive
    approximation levels; chroma AC in one band with one refinement.
    Entries are (component-index list, Ss, Se, Ah, Al)."""
    if nc == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([2], 1, 63, 0, 1),
        ([1], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([2], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([0], 1, 63, 1, 0),
    ]


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    scans=None,
) -> bytes:
    """Progressive-JPEG (SOF2) writing sink: the same color transform,
    quantization and coefficient math as :func:`encode_jpeg`, with
    the entropy coding split across a scan script (spectral selection
    + successive approximation, EOB-run coding, DC/AC refinement
    scans per T.81 G.1.2) and a per-scan OPTIMIZED Huffman table
    (:func:`_gen_huffman_table` — Annex-K fixed tables lack the EOBn
    symbols progressive needs, which is why every progressive encoder
    optimizes). Because both encoders quantize identically and the
    default script refines down to Al=0, ``decode_jpeg`` of the
    progressive stream is BIT-IDENTICAL to the baseline round trip —
    the strongest cross-check the format allows, pinned in the tests.

    ``scans`` overrides the script with (comp_list, Ss, Se, Ah, Al)
    tuples; ``restart_interval`` > 0 emits DRI + RSTn every that many
    MCUs (interleaved scans) / blocks (single-component scans)."""
    gray, h, w, padded, samp, qts, mcus_x, mcus_y = _prepare_planes(
        img, quality, subsample
    )
    nc = len(padded)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # quantized coefficients per comp, zigzag order, MCU-padded grid
    coefs = []
    nominal = []
    for ci, (p, (hs, vs)) in enumerate(zip(padded, samp)):
        bh, bw = mcus_y * vs, mcus_x * hs
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        q = qts[0 if ci == 0 else 1]
        # per-block _dct2, the very routine encode_jpeg quantizes
        # with — batched DCT kernels round differently at the .5
        # boundary, and the test contract is BIT-identical decoded
        # pixels between the baseline and progressive streams
        zz = np.empty((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                coef = np.round(_dct2(blocks[by, bx]) / q).astype(
                    np.int64
                )
                zz[by, bx] = coef.flat[_ZIGZAG]
        coefs.append(zz)
        cw, ch = -(-w * hs // hmax), -(-h * vs // vmax)
        nominal.append((-(-ch // 8), -(-cw // 8)))
    if scans is None:
        scans = _default_scan_script(nc)

    def scan_pass(comp_list, ss, se, ah, al, emit):
        """One scan, symmetric with _decode_scan_progressive: emits
        through `emit` (counter on pass 1, writer on pass 2). Returns
        the flush callback status via closures."""
        eobrun = 0
        be: list[int] = []  # correction bits buffered behind the EOB run
        pred = [0] * nc

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                emit.symbol(nbits << 4)
                if nbits:
                    emit.bits(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
                for b in be:
                    emit.bits(b, 1)
                be.clear()

        def dc_first(ci, blk):
            v = int(blk[0]) >> al  # arithmetic shift, like the decoder's <<
            diff = v - pred[ci]
            pred[ci] = v
            t = _category(diff)
            emit.symbol(t)
            if t:
                mag = diff if diff >= 0 else diff + (1 << t) - 1
                emit.bits(mag, t)

        def dc_refine(blk):
            emit.bits((int(blk[0]) >> al) & 1, 1)

        def ac_first(blk):
            nonlocal eobrun
            r = 0
            for k in range(ss, se + 1):
                v = int(blk[k])
                av = (v if v >= 0 else -v) >> al  # magnitude shift (G.1.2.2)
                if av == 0:
                    r += 1
                    continue
                while r > 15:
                    emit_eobrun()
                    emit.symbol(0xF0)
                    r -= 16
                emit_eobrun()
                s = av.bit_length()
                emit.symbol((r << 4) | s)
                mag = av if v >= 0 else ~av
                emit.bits(mag, s)
                r = 0
            if r > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()

        def ac_refine(blk):
            nonlocal eobrun
            absv = [
                ((int(blk[k]) if blk[k] >= 0 else -int(blk[k])) >> al)
                for k in range(ss, se + 1)
            ]
            eob = 0  # band position AFTER the last newly-nonzero coef
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            r = 0
            br: list[int] = []  # this block's pending correction bits
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    emit_eobrun()
                    emit.symbol(0xF0)
                    r -= 16
                    for b in br:
                        emit.bits(b, 1)
                    br.clear()
                if t > 1:
                    # history coefficient: one appended correction bit
                    br.append(t & 1)
                    continue
                emit_eobrun()
                emit.symbol((r << 4) | 1)
                emit.bits(1 if blk[ss + i] > 0 else 0, 1)
                for b in br:
                    emit.bits(b, 1)
                br.clear()
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                # bound the buffered-correction window (libjpeg's rule)
                if eobrun == 0x7FFF or len(be) > 937:
                    emit_eobrun()

        def do_unit(ci, by, bx):
            blk = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    dc_first(ci, blk)
                else:
                    dc_refine(blk)
            else:
                if ah == 0:
                    ac_first(blk)
                else:
                    ac_refine(blk)

        n_units = 0
        rst = 0

        def maybe_restart():
            nonlocal n_units, rst, eobrun, pred
            if restart_interval and n_units and n_units % restart_interval == 0:
                emit_eobrun()
                if isinstance(emit, _SymbolWriter):
                    emit.writer.flush()
                    emit.writer.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                eobrun = 0
                pred = [0] * nc
            n_units += 1

        if len(comp_list) > 1:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    maybe_restart()
                    for ci in comp_list:
                        hs, vs = samp[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                do_unit(ci, my * vs + by, mx * hs + bx)
        else:
            ci = comp_list[0]
            nbh, nbw = nominal[ci]
            for by in range(nbh):
                for bx in range(nbw):
                    maybe_restart()
                    do_unit(ci, by, bx)
        emit_eobrun()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    inv_zigzag = _ZIGZAG
    for tq, q in enumerate(qts):
        out += seg(
            0xDB, bytes([tq]) + bytes(q.flat[inv_zigzag].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive DCT
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_list, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se=0")
        if ss > 0 and len(comp_list) != 1:
            raise ValueError("progressive AC scans hold one component")
        # pass 1: symbol statistics -> optimal table for THIS scan
        needs_table = not (ss == 0 and ah > 0)  # DC refine is raw bits
        counter = _SymbolCounter()
        scan_pass(comp_list, ss, se, ah, al, counter)
        enc_table = None
        if needs_table and any(counter.freq):
            bits, huffval = _gen_huffman_table(counter.freq)
            tc = 0 if ss == 0 else 1
            out += seg(
                0xC4, bytes([tc << 4]) + bytes(bits) + bytes(huffval)
            )
            enc_table = _build_encode_table(bits, huffval)
        sos = bytes([len(comp_list)])
        for ci in comp_list:
            sos += bytes([ci + 1, 0x00])  # table 0 for both classes
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        writer = _BitWriter()
        scan_pass(
            comp_list, ss, se, ah, al,
            _SymbolWriter(writer, enc_table or {}),
        )
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
