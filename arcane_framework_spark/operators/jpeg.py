"""Pure stdlib+numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

The execution container ships no imaging library, and JPEG is what a
scraped multimodal corpus overwhelmingly contains — so the decode path
is implemented for real here: full marker parse (SOI/APPn/DQT/SOF0/DHT/
DRI/SOS/EOI), Huffman-coded DC-difference + run-length AC entropy
decode with byte-stuffing and restart markers, dequantization,
de-zigzag, float IDCT (separable 8x8 basis, numpy matmul), chroma
upsampling (4:4:4, 4:2:2, 4:2:0), and JFIF YCbCr->RGB. Progressive,
arithmetic-coded, 12-bit, and hierarchical JPEGs raise
``NotImplementedError`` honestly.

The encoders exist for test fixtures: ``encode_jpeg`` (sequential
baseline, standard Annex K tables, 4:4:4 RGB or grayscale) and
``encode_jpeg_ycbcr`` (explicit YCbCr planes with 4:2:0 / 4:2:2 chroma
subsampling and a permutable scan order — the fixture for the
upsampling + color-conversion decode path). They share NOTHING with the
decoder beyond the module's zigzag/table constants — round-trip tests
compare the decoder's output against an independent
quantize->dequantize->IDCT reconstruction, so an encode/decode pair
cannot hide a shared bug in the bitstream layer.

Spark never sees any of this directly: decoding runs inside the same
Arrow-batched ``mapInPandas`` plumbing as the other real decoders
(``operators/multimodal.py``), one Python worker per partition.

Reference parity note: the reference framework (C#/.NET ingestion
library) has no image path at all — this module belongs to the
SURVEY §2.9 LLM-pipeline extension surface (X89).
"""

from __future__ import annotations

import struct

#: Zigzag order: index i of this list = the (row-major) coefficient
#: position holding zigzag coefficient i.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K Table K.1 — luminance quantization (quality 50), zigzag order
#: applied at use time (stored row-major here).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K Table K.2 — chrominance quantization.
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K standard Huffman tables as (BITS counts per length 1..16,
#: HUFFVAL symbol list) — the tables every baseline encoder ships.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
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
]


def _idct_basis():
    """The 8x8 separable DCT-III basis matrix B with B[u, x] =
    C(u)/2 * cos((2x+1)u*pi/16); IDCT(F) = B.T @ F @ B."""
    import math

    import numpy as np

    b = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            b[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return b


_BASIS = None


def _basis():
    global _BASIS
    if _BASIS is None:
        _BASIS = _idct_basis()
    return _BASIS


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits, vals):
    """Map (code_length, code) -> symbol via T.81 Annex C canonical
    code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """symbol -> (code, length), same canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (restart handled by the
    caller via ``at_marker``/``skip_marker``)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        byte = d[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # A real marker mid-entropy (e.g. premature EOI): per
                # T.81 the decoder may pad with 1-bits; a well-formed
                # stream never reads past its own data, so treat this
                # as corruption instead of fabricating pixels.
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} in entropy data"
                )
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align(self):
        self.bitbuf = 0
        self.nbits = 0

    def at_restart(self):
        """True when positioned exactly at an RSTn marker."""
        d = self.data
        return (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        )

    def skip_restart(self):
        self.pos += 2
        self.align()


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map a ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(content: bytes) -> "object":
    """Decode a sequential-baseline JPEG to ``(h, w, 3)`` (or ``(h, w,
    1)`` for grayscale) uint8.

    Raises ``ValueError`` for malformed input and ``NotImplementedError``
    for progressive / arithmetic / 12-bit / hierarchical streams.
    """
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, object] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data before EOI")
        if marker in (0xC1,):  # extended sequential: same decode path
            marker = 0xC0
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise NotImplementedError("progressive JPEG not supported")
        if marker in (0xC3, 0xC5, 0xC7, 0xC9, 0xCB, 0xCD, 0xCF):
            raise NotImplementedError(
                f"JPEG coding process 0xFF{marker:02X} not supported"
            )
        (seglen,) = struct.unpack_from(">H", content, pos)
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = content[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if i + 64 > len(seg):
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int32)
                q[ZIGZAG] = zz
                qtables[tq] = q.reshape(8, 8)
                i += 64
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG samples")
            if h == 0 or w == 0:
                raise ValueError("degenerate JPEG dimensions")
            if len(seg) < 6 + 3 * nc:
                raise ValueError(
                    f"SOF declares {nc} components but segment holds "
                    f"{len(seg) - 6} descriptor bytes"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated DHT header")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("truncated SOS header")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                # Scan entries are resolved to FRAME component indices:
                # planes/predictors are allocated in frame order, and a
                # legal JPEG may list scan components in any order — an
                # index by scan position would swap (and mis-size) planes.
                fi = next(
                    (i for i, x in enumerate(frame["comps"])
                     if x["id"] == cs),
                    None,
                )
                if fi is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((fi, tdta >> 4, tdta & 0x0F))
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError("multi-scan JPEG not supported")
            if len({fi for fi, _, _ in scan}) != len(scan):
                raise ValueError("duplicate component in scan")
            return _decode_scan(
                content, pos + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(content, pos, frame, scan, qtables, htables,
                 restart_interval):
    import numpy as np

    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid sampling factors")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    basis = _basis()

    planes = []
    for c in comps:
        cw, ch = 8 * c["h"] * mcus_x, 8 * c["v"] * mcus_y
        planes.append(np.zeros((ch, cw), dtype=np.float64))
        if c["tq"] not in qtables:
            raise ValueError(f"missing quant table {c['tq']}")

    reader = _BitReader(content, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                if not reader.at_restart():
                    raise ValueError("expected restart marker")
                reader.skip_restart()
                pred = [0] * len(comps)
            for fi, td, ta in scan:
                comp = comps[fi]
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("missing Huffman table")
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dc_tab)
                        if size > 11:
                            raise ValueError("invalid DC size")
                        diff = _extend(reader.receive(size), size)
                        pred[fi] += diff
                        coeffs[0] = pred[fi]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs
                        fq = block.reshape(8, 8) * q
                        pix = basis.T @ fq @ basis + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[fi][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    out_planes = []
    for ci, c in enumerate(comps):
        p = np.clip(np.round(planes[ci]), 0, 255)
        # upsample subsampled chroma to full resolution by replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise NotImplementedError("non-integer chroma upsampling ratio")
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        return out_planes[0].astype(np.uint8)[:, :, None]
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = (pl.astype(np.float64) for pl in out_planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test-fixture writer: baseline, 4:4:4 / grayscale)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1-bits
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _csize(v: int) -> int:
    """Coefficient magnitude category (bit length of |v|)."""
    return abs(v).bit_length()


def _encode_block(writer: "_BitWriter", block, qflat, dct, act,
                  pred: int) -> int:
    """FDCT + quantize (zigzag) + entropy-encode one centered 8x8 block;
    returns the block's DC value as the component's new predictor."""
    import numpy as np

    basis = _basis()
    fdct = basis @ block @ basis.T
    zz = np.round(fdct.reshape(-1)[ZIGZAG] / qflat[ZIGZAG]).astype(np.int64)
    diff = int(zz[0]) - pred
    size = _csize(diff)
    code, length = dct[size]
    writer.write(code, length)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(mag & ((1 << size) - 1), size)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = act[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _csize(v)
        code, length = act[(run << 4) | size]
        writer.write(code, length)
        mag = v if v >= 0 else v + (1 << size) - 1
        writer.write(mag & ((1 << size) - 1), size)
        run = 0
    if run:
        code, length = act[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _edge_block(plane, y0: int, x0: int):
    """8x8 block at (y0, x0) with edge-replicate padding, centered."""
    import numpy as np

    ph, pw = plane.shape
    ys = np.minimum(np.arange(y0, y0 + 8), ph - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), pw - 1)
    return plane[np.ix_(ys, xs)] - 128.0


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(img: "object") -> bytes:
    """Encode an ``(h, w)``, ``(h, w, 1)`` or ``(h, w, 3)`` uint8 array
    as a sequential-baseline JFIF JPEG (standard Annex K tables, no
    chroma subsampling, no restarts). Deterministic: same input, same
    bytes."""
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nchan = img.shape
    if nchan not in (1, 3):
        raise ValueError(f"unsupported channel count {nchan}")
    qluma = np.array(QUANT_LUMA, dtype=np.int64)
    qchroma = np.array(QUANT_CHROMA, dtype=np.int64)

    if nchan == 3:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        qs = [qluma, qchroma, qchroma]
        comp_defs = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
        huff_ids = [(0, 0), (1, 1), (1, 1)]
    else:
        planes = [img[:, :, 0].astype(np.float64)]
        qs = [qluma]
        comp_defs = [(1, 0x11, 0)]
        huff_ids = [(0, 0)]

    dc_enc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    h_pad = -(-h // 8) * 8
    w_pad = -(-w // 8) * 8
    writer = _BitWriter()
    pred = [0] * len(planes)
    for by in range(0, h_pad, 8):
        for bx in range(0, w_pad, 8):
            for ci, plane in enumerate(planes):
                # edge-replicate padding keeps partial blocks smooth
                block = _edge_block(plane, by, bx)
                pred[ci] = _encode_block(
                    writer, block, qs[ci],
                    dc_enc[huff_ids[ci][0]], ac_enc[huff_ids[ci][1]],
                    pred[ci],
                )
    writer.flush()

    # DQT segments (zigzag order on the wire)
    def dqt_payload(tq, flat):
        arr = [0] * 64
        for i in range(64):
            arr[i] = flat[ZIGZAG[i]]
        return bytes([tq]) + bytes(arr)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, dqt_payload(0, QUANT_LUMA))
    if nchan == 3:
        out += _seg(0xDB, dqt_payload(1, QUANT_CHROMA))
    sof = struct.pack(">BHHB", 8, h, w, len(comp_defs))
    for cid, hv, tq in comp_defs:
        sof += struct.pack(">BBB", cid, hv, tq)
    out += _seg(0xC0, sof)

    def dht_payload(tc, th, bits, vals):
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out += _seg(0xC4, dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if nchan == 3:
        out += _seg(0xC4, dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([len(comp_defs)])
    for (cid, _hv, _tq), (td, ta) in zip(comp_defs, huff_ids):
        sos += bytes([cid, (td << 4) | ta])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_ycbcr(y, cb, cr, sampling=(2, 2),
                      scan_order=(0, 1, 2)) -> bytes:
    """Baseline JFIF encoder over EXPLICIT YCbCr planes with chroma
    subsampling — the fixture writer for the decoder's subsampled
    upsampling and color-conversion path, which the 4:4:4 RGB
    ``encode_jpeg`` never exercises.

    ``y`` is the full-resolution ``(h, w)`` uint8 luma plane; ``cb`` /
    ``cr`` are ``(ceil(h/vs), ceil(w/hs))`` uint8 planes already at
    chroma resolution for ``sampling = (hs, vs)`` — no color transform
    or downsample happens here, so a fixture can pick plane values whose
    quantization is exactly invertible (even luma with Q00=16;
    ``128 + 17*m`` chroma with Q00=17) and a SQL oracle can recompute
    the decoded RGB in closed form.

    ``scan_order`` permutes the SOS component list AND the matching MCU
    interleave — a legal-but-unusual layout (T.81 allows any scan
    order) that catches decoders indexing planes by scan position
    instead of by frame component. Deterministic: same input, same
    bytes.
    """
    import numpy as np

    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    hs, vs = sampling
    if (hs, vs) not in ((1, 1), (2, 1), (2, 2)):
        raise ValueError(f"unsupported sampling {sampling}")
    h, w = y.shape
    ch_h, ch_w = -(-h // vs), -(-w // hs)
    if cb.shape != (ch_h, ch_w) or cr.shape != (ch_h, ch_w):
        raise ValueError(
            f"chroma planes must be {(ch_h, ch_w)}, got {cb.shape}/{cr.shape}"
        )
    if sorted(scan_order) != [0, 1, 2]:
        raise ValueError(f"scan_order must permute (0, 1, 2): {scan_order}")

    qluma = np.array(QUANT_LUMA, dtype=np.int64)
    qchroma = np.array(QUANT_CHROMA, dtype=np.int64)
    # frame order: Y (id 1, hs x vs), Cb (id 2, 1x1), Cr (id 3, 1x1)
    comps = [
        {"id": 1, "h": hs, "v": vs, "tq": 0, "plane": y.astype(np.float64),
         "q": qluma, "td": 0, "ta": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb.astype(np.float64),
         "q": qchroma, "td": 1, "ta": 1},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr.astype(np.float64),
         "q": qchroma, "td": 1, "ta": 1},
    ]
    dc_enc = [
        _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_enc = [
        _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]

    mcus_x = -(-w // (8 * hs))
    mcus_y = -(-h // (8 * vs))
    writer = _BitWriter()
    pred = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for fi in scan_order:
                c = comps[fi]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _edge_block(
                            c["plane"],
                            (my * c["v"] + by) * 8,
                            (mx * c["h"] + bx) * 8,
                        )
                        pred[fi] = _encode_block(
                            writer, block, c["q"],
                            dc_enc[c["td"]], ac_enc[c["ta"]], pred[fi],
                        )
    writer.flush()

    def dqt_payload(tq, flat):
        arr = [flat[ZIGZAG[i]] for i in range(64)]
        return bytes([tq]) + bytes(arr)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, dqt_payload(0, QUANT_LUMA))
    out += _seg(0xDB, dqt_payload(1, QUANT_CHROMA))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out += _seg(0xC0, sof)

    def dht_payload(tc, th, bits, vals):
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out += _seg(0xC4, dht_payload(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, dht_payload(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    out += _seg(0xC4, dht_payload(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    out += _seg(0xC4, dht_payload(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([3])
    for fi in scan_order:
        c = comps[fi]
        sos += bytes([c["id"], (c["td"] << 4) | c["ta"]])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
