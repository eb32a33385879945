"""Pure-stdlib GIF codec (GIF87a/89a, LZW).

GIFs are the third big format in scraped multimodal corpora after JPEG
and PNG, and the container ships no imaging library — so the decode
path is real: header + logical-screen parse, global/local color tables,
extension-block skipping (GCE/comment/application), full variable-width
LZW decompression (clear/EOI codes, dictionary growth to 4096 with
deferred-clear handling), four-pass interlace reordering, and palette
expansion to ``(h, w, 3)`` uint8. Multi-frame animations decode their
FIRST frame (the representative image for feature extraction);
transparency indices are expanded to their palette color (features
operate on RGB). Malformed streams raise ``ValueError``.

The encoder exists for test fixtures: GIF87a (or 89a when interlaced is
requested — both parse paths covered), one frame, global palette, REAL
LZW compression (dictionary build, width growth, 4096 reset via CLEAR).
It shares only the spec constants with the decoder; round-trip must be
lossless for any palette image (GIF is lossless), and the catalog
oracle computes expected pixels closed-form without touching LZW at
all, so an encoder/decoder pair cannot hide a shared compression bug
behind the oracle.

Spark never sees any of this directly: decoding runs inside the same
Arrow-batched ``mapInPandas`` plumbing as the other decoders
(``operators/multimodal.py``).

Reference parity note: the reference framework (C#/.NET ingestion
library) has no image path — SURVEY §2.9 extension surface (X94).
"""

from __future__ import annotations

import struct

#: Interlace passes: (start row, row step) per GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE = 4096


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """Variable-width LZW (GIF flavor, LSB-first bit packing)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev: int | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # missing explicit EOI: tolerated iff all pixels arrived
                if len(out) >= n_pixels:
                    return out[:n_pixels]
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before dictionary entry")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("LZW code skips dictionary")
            out += entry
            if len(table) < _MAX_CODE:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        prev = code
        if len(out) >= n_pixels:
            # image data complete; trailing codes/EOI are ignored
            return out[:n_pixels]
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW underrun: {len(out)} of {n_pixels} pixels"
        )
    return out[:n_pixels]


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF LZW encoder (real dictionary build, not literal-only)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # the decoder mirrors this insert one code LATER (while
            # processing the code just emitted), so its table reaches
            # 1<<width — and its read width grows — exactly when
            # next_code == (1<<width) + 1 here
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (payload, position after the 0-size terminator)."""
    chunks = []
    n = len(data)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        chunks.append(data[pos:pos + size])
        pos += size


def decode_gif(content: bytes) -> "object":
    """Decode the first frame of a GIF87a/89a to ``(h, w, 3)`` uint8."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, flags, _bg, _aspect = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        end = pos + 3 * n_colors
        if end > len(content):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(content[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end
    n = len(content)
    while pos < n:
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image data")
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= n:
                raise ValueError("truncated GIF extension")
            pos += 1
            _, pos = _sub_blocks(content, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if w == 0 or h == 0 or left + w > sw or top + h > sh:
            raise ValueError("degenerate GIF frame geometry")
        table = gct
        if iflags & 0x80:  # local color table
            n_colors = 2 << (iflags & 0x07)
            end = pos + 3 * n_colors
            if end > len(content):
                raise ValueError("truncated local color table")
            table = np.frombuffer(
                content[pos:end], dtype=np.uint8
            ).reshape(-1, 3)
            pos = end
        if table is None:
            raise ValueError("GIF frame has no color table")
        if pos >= n:
            raise ValueError("truncated GIF image block")
        min_code_size = content[pos]
        pos += 1
        data, pos = _sub_blocks(content, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(min_code_size, data, w * h)), dtype=np.uint8
        )
        if idx.max(initial=0) >= len(table):
            raise ValueError("GIF pixel index outside color table")
        rows = idx.reshape(h, w)
        if iflags & 0x40:  # four-pass interlace: reorder stored rows
            out_rows = np.empty_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    out_rows[r] = rows[src]
                    src += 1
            rows = out_rows
        return table[rows]  # palette expansion -> (h, w, 3)
    raise ValueError("no image descriptor in GIF")


def encode_gif(img: "object", palette: "object",
               interlace: bool = False) -> bytes:
    """Encode a palette-index image as a single-frame GIF fixture.

    ``img`` is ``(h, w)`` uint8 palette indices; ``palette`` is
    ``(n, 3)`` uint8 with ``n`` a power of two >= 4. Deterministic:
    same input, same bytes. Interlaced output stores rows in the
    four-pass order (and stamps GIF89a, exercising both header paths).
    """
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = img.shape
    n_colors = len(palette)
    if n_colors < 4 or n_colors & (n_colors - 1):
        raise ValueError("palette size must be a power of two >= 4")
    if int(img.max(initial=0)) >= n_colors:
        raise ValueError("pixel index outside palette")
    depth = n_colors.bit_length() - 1  # 2^depth colors
    out = bytearray(b"GIF89a" if interlace else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        img = img[order]
    min_code_size = max(2, depth)
    out.append(min_code_size)
    payload = _lzw_encode(min_code_size, img.tobytes())
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
