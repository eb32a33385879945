"""Multimodal (image/audio/video) column handling.

Design (SURVEY.md north star): media assets travel as opaque ``binary``
columns with typed metadata alongside — the table stays a plain DataFrame,
so partitioning, predicate pushdown on the metadata columns, and columnar
parquet storage all keep working at 100 TB. Heavy per-asset work (decode,
resize, frame-sample, feature-extract) runs in Arrow-batched Pandas UDFs via
``mapInPandas``: one Python worker per partition, zero driver involvement,
batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Decode support: uncompressed 24-bit BMP, binary PPM (P6), 8-bit
gray/RGB/RGBA PNG, sequential-baseline JPEG (Huffman + IDCT,
``operators/jpeg.py``), and GIF87a/89a (full LZW + interlace,
``operators/gif.py``) decode for REAL via pure numpy + stdlib
(``decode_bmp`` / ``decode_ppm`` / ``decode_png`` / ``decode_jpeg`` /
``decode_gif`` — no imaging libraries needed), feeding genuine header
dimensions and pixel statistics into ``extract_features``. Remaining
formats (progressive JPEG, WebP, TIFF) are STUBBED (``decode_image``
raises ``NotImplementedError`` unless PIL is installed — the container
has no image libs); everything around the stub — schema, batching, UDF
signature, deterministic byte-level features — is real and
oracle-tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Output schema of ``extract_features`` — fixed, so downstream plans and
#: the streaming variant bind to a stable contract. ``pixel_mean`` is
#: null for assets without a real decoder (everything but 24-bit BMP).
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_mean", DoubleType()),
    ]
)


def documents_as_assets(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Model the documents table as a binary-asset table.

    (id, content: binary, mime) — the testdata has no media files, so the
    text bytes stand in for an encoded asset; the downstream plumbing is
    identical for real media.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def fake_dimensions(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded media dimensions.

    Derived from the byte length only, so the DuckDB oracle can reproduce it
    in SQL; a real decoder would read the container header instead.
    """
    return n_bytes % 640 + 16, (n_bytes * 7) % 480 + 16


def decode_bmp(content: bytes) -> "object":
    """Pure-numpy decoder for uncompressed 24-bit BI_RGB BMP files.

    Returns an ``(height, width, 3)`` uint8 RGB array. Handles the
    standard 54-byte header layout: pixel-data offset at byte 10, signed
    width/height at 18/22 (positive height = bottom-up row order), 4-byte
    row stride padding, BGR channel order. Raises ``ValueError`` for
    malformed input and ``NotImplementedError`` for other bit depths or
    compression — those need a real imaging library.
    """
    import numpy as np

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", content, 10)
    width, height = struct.unpack_from("<ii", content, 18)
    (bitcount,) = struct.unpack_from("<H", content, 28)
    (compression,) = struct.unpack_from("<I", content, 30)
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BI_RGB supported "
            f"(got {bitcount}-bit, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    row_stride = (width * 3 + 3) & ~3
    if len(content) < data_offset + row_stride * height:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(
        content, dtype=np.uint8, offset=data_offset,
        count=row_stride * height,
    )
    rows = raw.reshape(height, row_stride)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def decode_ppm(content: bytes) -> "object":
    """Pure-numpy decoder for binary PPM (P6) images.

    Returns an ``(height, width, 3)`` uint8 RGB array. Handles the
    standard header grammar: ``P6``, then width/height/maxval tokens
    separated by whitespace, with ``#``-comments allowed between tokens,
    a single whitespace byte after maxval, then ``w*h*3`` raw samples
    (maxval <= 255, with sub-255 maxval samples rescaled to the uint8
    range; 2-byte-sample images raise ``NotImplementedError``).
    PPM is stored top-down RGB — no row flip or channel swap needed,
    which is exactly why it is the second real decoder next to BMP: the
    two formats pin opposite orientation/channel conventions.
    """
    import numpy as np

    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and #-comments between header tokens
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if pos < len(content) and content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        try:
            tokens.append(int(content[start:pos]))
        except ValueError as exc:
            raise ValueError("malformed PPM header token") from exc
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ValueError("degenerate PPM dimensions")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM samples not supported")
    if maxval <= 0:
        raise ValueError("degenerate PPM maxval")
    pos += 1  # exactly one whitespace byte after maxval
    n = width * height * 3
    if len(content) < pos + n:
        raise ValueError("truncated PPM pixel data")
    raw = np.frombuffer(content, dtype=np.uint8, offset=pos, count=n)
    if maxval != 255:
        # Samples are stored in [0, maxval]; rescale to the uint8 range
        # (round-half-up, matching netpbm's value * 255 / maxval).
        raw = (
            (raw.astype(np.uint32) * 255 + maxval // 2) // maxval
        ).astype(np.uint8)
    return raw.reshape(height, width, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Bytes-per-pixel by PNG color type (8-bit depth): 0=grayscale,
#: 2=truecolor RGB, 6=truecolor+alpha RGBA.
_PNG_BPP = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _zlib_stored(data: bytes) -> bytes:
    """A zlib stream of STORED (uncompressed) deflate blocks.

    Deterministic by construction — output length is exactly
    ``2 + 5*nblocks + len(data) + 4`` with ``nblocks =
    max(1, ceil(len/65535))`` — which is what lets a SQL oracle compute a
    synthetic PNG's byte size in closed form (zlib.compress at any real
    level has no closed-form size)."""
    import zlib

    out = bytearray(b"\x78\x01")  # CMF/FLG for window=32k, no preset dict
    n, i = len(data), 0
    if n == 0:
        out += b"\x01\x00\x00\xff\xff"
    while i < n:
        block = data[i:i + 65535]
        i += len(block)
        out.append(1 if i >= n else 0)  # BFINAL bit, BTYPE=00 (stored)
        out += struct.pack("<HH", len(block), 0xFFFF ^ len(block))
        out += block
    out += struct.pack(">I", zlib.adler32(bytes(data)) & 0xFFFFFFFF)
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6), scalar form."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes) -> "object":
    """Pure-stdlib PNG decoder: ``zlib`` inflate + numpy scanline
    un-filtering — no imaging library.

    Supports 8-bit-depth, non-interlaced grayscale (color type 0), RGB
    (2), and RGBA (6); all five scanline filters (None/Sub/Up/Average/
    Paeth); chunk CRCs are verified so corruption raises ``ValueError``
    instead of decoding garbage. Palette, 16-bit, and Adam7-interlaced
    images raise ``NotImplementedError`` (they need a real imaging
    library to be worth doing). Returns ``(height, width, channels)``
    uint8 — top-down rows, RGB channel order (PNG's native layout, the
    opposite corner of the convention square from BMP's bottom-up BGR).
    """
    import zlib

    import numpy as np

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(content):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"PLTE":
            raise NotImplementedError("palette PNGs not supported")
        elif ctype == b"IEND":
            break
        pos += 12 + length
    else:
        raise ValueError("missing IEND chunk")
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing or malformed IHDR")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width == 0 or height == 0:
        raise ValueError("degenerate PNG dimensions")
    if depth != 8 or color not in _PNG_BPP:
        raise NotImplementedError(
            f"only 8-bit gray/RGB/RGBA supported "
            f"(got depth={depth}, color type={color})"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7 interlacing not supported")
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    bpp = _PNG_BPP[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG image data: {exc}") from exc
    stride = 1 + width * bpp
    if len(raw) != height * stride:
        raise ValueError("PNG image data has wrong decompressed size")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    ftypes = arr[:, 0]
    filtered = arr[:, 1:].astype(np.int64).reshape(height, width, bpp)
    out = np.zeros((height, width, bpp), dtype=np.int64)
    prev = np.zeros((width, bpp), dtype=np.int64)
    zero = np.zeros(bpp, dtype=np.int64)
    for y in range(height):
        f, cur = int(ftypes[y]), filtered[y]
        if f == 0:  # None
            rec = cur.copy()
        elif f == 1:  # Sub: recon = prefix sum along x, per channel
            rec = np.cumsum(cur, axis=0) % 256
        elif f == 2:  # Up: vector add of the previous reconstructed row
            rec = (cur + prev) % 256
        elif f == 3:  # Average: left-dependent → scan x, vectorize channels
            rec = np.zeros_like(cur)
            left = zero
            for x in range(width):
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
                left = rec[x]
        elif f == 4:  # Paeth: same left dependency
            rec = np.zeros_like(cur)
            for x in range(width):
                a = rec[x - 1] if x else zero
                b = prev[x]
                c = prev[x - 1] if x else zero
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def encode_png(img: "object", filters: "object" = None) -> bytes:
    """Minimal deterministic PNG writer (8-bit gray/RGB/RGBA, stored-
    deflate IDAT).

    ``filters`` selects the scanline filter per row (default: cycle
    0,1,2,3,4 by row index so a round-trip exercises EVERY filter's
    un-filtering path, not just the trivial one). Stored-deflate keeps
    the output size closed-form (see :func:`_zlib_stored`) — this is a
    test/oracle fixture writer, not a space-efficient encoder.
    """
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    height, width, channels = img.shape
    color = {1: 0, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    pix = img.astype(np.int64)
    raw = bytearray()
    prev = np.zeros((width, channels), dtype=np.int64)
    zero = np.zeros(channels, dtype=np.int64)
    for y in range(height):
        f = (y % 5) if filters is None else int(filters[y])
        cur = pix[y]
        if f == 0:
            filt = cur
        elif f == 1:
            left = np.vstack([zero, cur[:-1]])
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            left = np.vstack([zero, cur[:-1]])
            filt = cur - (left + prev) // 2
        elif f == 4:
            filt = np.zeros_like(cur)
            for x in range(width):
                a = cur[x - 1] if x else zero
                b = prev[x]
                c = prev[x - 1] if x else zero
                filt[x] = cur[x] - np.array(
                    [_paeth(int(a[k]), int(b[k]), int(c[k]))
                     for k in range(channels)]
                )
        else:
            raise ValueError(f"unknown PNG scanline filter {f}")
        raw.append(f)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib_stored(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def synth_image_bytes(seed: int, width: int, height: int,
                      fmt: str) -> bytes:
    """Deterministic synthetic image: pixel ``(r, c, ch)`` in the DECODED
    top-down RGB orientation has value ``(seed + r*7 + c*3 + ch) % 256``.

    ``fmt='bmp'`` writes bottom-up BGR with 4-byte row padding (the BMP
    file convention); ``fmt='ppm'`` writes the P6 header + top-down RGB;
    ``fmt='png'`` writes a real zlib-deflated PNG whose per-row scanline
    filters cycle through all five types (stored-deflate IDAT, so the
    byte size stays closed-form: ``68 + height*(1 + 3*width)`` while one
    deflate block suffices). All three decode to the SAME array — and
    the closed-form pixel rule means a SQL oracle can compute the
    expected size/mean/corner pixel without constructing the binary.
    """
    import numpy as np

    r = np.arange(height, dtype=np.int64)[:, None, None] * 7
    c = np.arange(width, dtype=np.int64)[None, :, None] * 3
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    img = ((seed + r + c + ch) % 256).astype(np.uint8)
    if fmt == "ppm":
        return b"P6\n%d %d\n255\n" % (width, height) + img.tobytes()
    if fmt == "png":
        return encode_png(img)
    if fmt != "bmp":
        raise ValueError(f"unknown synthetic format {fmt!r}")
    row_stride = (width * 3 + 3) & ~3
    body = np.zeros((height, row_stride), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channels
    body[:, : width * 3] = bgr.reshape(height, width * 3)
    pixel_bytes = body.tobytes()
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(pixel_bytes), 0, 0, 54,
        40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0,
    )
    return header + pixel_bytes


def synth_jpeg_bytes(seed: int, width: int, height: int) -> bytes:
    """Deterministic synthetic baseline JPEG: grayscale, block-constant —
    the 8x8 block at block-index ``(bi, bj)`` holds the EVEN value
    ``(2*seed + bi*14 + bj*6) % 256`` in every pixel.

    Even block-constant values survive JPEG's quantization EXACTLY with
    the Annex K luminance table: a constant block has only a DC
    coefficient, ``F00 = 8*(v-128)``, and ``round(8*(v-128)/16)*16/8 =
    v-128`` when ``v`` is even (Q00=16). So the decoded image equals
    the source bit-for-bit and a SQL oracle can recompute the decoded
    mean/corner pixel in closed form — through a REAL lossy bitstream
    (Huffman DC-difference coding across blocks, byte stuffing, the full
    marker structure)."""
    import numpy as np

    from arcane_framework_spark.operators.jpeg import encode_jpeg

    bi = np.arange(height, dtype=np.int64)[:, None] // 8
    bj = np.arange(width, dtype=np.int64)[None, :] // 8
    img = ((2 * seed + bi * 14 + bj * 6) % 256).astype(np.uint8)
    return encode_jpeg(img)


def synth_jpeg_color_planes(seed: int, width: int, height: int,
                            sampling: tuple[int, int]):
    """The (y, cb, cr) planes of the SUBSAMPLED color synthetic — shared
    by the fixture writer and the test's closed-form expectation.

    Luma is block-constant EVEN (``64 + (2*seed + bi*14 + bj*6) % 128``,
    exactly invertible with Q00=16); chroma planes at chroma resolution
    are block-constant ``128 + 17*m`` with ``m in [-2, 2]`` (exactly
    invertible with Q00=17: ``round(8*17m/17)*17/8 = 17m``). The ranges
    keep every converted RGB value inside [0, 255], so the decoded pixel
    is the UNCLIPPED rounded color transform — closed-form for SQL."""
    import numpy as np

    hs, vs = sampling
    i = np.arange(height, dtype=np.int64)[:, None]
    j = np.arange(width, dtype=np.int64)[None, :]
    y = (64 + ((2 * seed + (i // 8) * 14 + (j // 8) * 6) % 128))
    ch_h, ch_w = -(-height // vs), -(-width // hs)
    ci = np.arange(ch_h, dtype=np.int64)[:, None] // 8
    cj = np.arange(ch_w, dtype=np.int64)[None, :] // 8
    cb = 128 + 17 * (((seed + ci + cj) % 5) - 2)
    cr = 128 + 17 * (((2 * seed + ci + 2 * cj) % 5) - 2)
    return (y.astype(np.uint8), cb.astype(np.uint8), cr.astype(np.uint8))


def synth_jpeg_color_bytes(seed: int, width: int, height: int,
                           sampling: tuple[int, int]) -> bytes:
    """Deterministic SUBSAMPLED color JPEG (4:2:0 or 4:2:2) whose decoded
    RGB is closed-form (``synth_jpeg_color_planes``) — exercises the
    decoder's chroma upsampling + YCbCr->RGB path through a real
    MCU-interleaved bitstream."""
    from arcane_framework_spark.operators.jpeg import encode_jpeg_ycbcr

    y, cb, cr = synth_jpeg_color_planes(seed, width, height, sampling)
    return encode_jpeg_ycbcr(y, cb, cr, sampling=sampling)


#: GIF synthetic palette rule: channel c of palette index i is
#: (GIF_MUL[c]*i + GIF_ADD[c]) % 256 — closed-form for the SQL oracle.
GIF_COLORS = 64
GIF_MUL = (3, 7, 11)
GIF_ADD = (5, 11, 23)


def synth_gif_bytes(seed: int, width: int, height: int,
                    interlace: bool) -> bytes:
    """Deterministic GIF: pixel (i, j) holds palette index
    ``(seed + 5*i + 3*j) % 64`` with the closed-form palette above.
    GIF is lossless, so the decoded RGB is exactly the palette lookup —
    through a REAL LZW bitstream (and the four-pass interlace reorder
    when requested), which is what the oracle cannot fake."""
    import numpy as np

    from arcane_framework_spark.operators.gif import encode_gif

    i = np.arange(height, dtype=np.int64)[:, None]
    j = np.arange(width, dtype=np.int64)[None, :]
    img = ((seed + 5 * i + 3 * j) % GIF_COLORS).astype(np.uint8)
    pal = np.stack(
        [
            (GIF_MUL[c] * np.arange(GIF_COLORS, dtype=np.int64)
             + GIF_ADD[c]) % 256
            for c in range(3)
        ],
        axis=1,
    ).astype(np.uint8)
    return encode_gif(img, pal, interlace=interlace)


def synth_gif_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One deterministic GIF per id: dims ``(11 + id%6) x (9 + id%4)``,
    seed ``id % 256``, interlaced when ``id % 2 == 1`` (the decoded
    pixels are identical either way — the de-interlace proof)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids_col = pdf[id_col].astype("int64")
            content = [
                synth_gif_bytes(
                    int(i) % 256, 11 + int(i) % 6, 9 + int(i) % 4,
                    interlace=(int(i) % 2 == 1),
                )
                for i in ids_col
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids_col,
                    "content": pd.Series(content, dtype="object"),
                    "fmt": ["gif"] * len(ids_col),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema
    )


def synth_jpeg_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One deterministic baseline JPEG per id, variant by ``id % 3``:
    0 = grayscale 4:4:4 (``synth_jpeg_bytes``, dims ``(8+id%5) x
    (8+id%3)``), 1 = color 4:2:0, 2 = color 4:2:2 (both
    ``synth_jpeg_color_bytes``, dims ``(16+id%7) x (16+id%5)`` — at
    least two MCUs so the DC prediction chain crosses MCU boundaries).
    Same Arrow-batched born-distributed shape as ``synth_image_assets``."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def one(i: int) -> bytes:
            seed = i % 256
            if i % 3 == 0:
                return synth_jpeg_bytes(seed, 8 + i % 5, 8 + i % 3)
            sampling = (2, 2) if i % 3 == 1 else (2, 1)
            return synth_jpeg_color_bytes(seed, 16 + i % 7, 16 + i % 5,
                                          sampling)

        for pdf in it:
            ids_col = pdf[id_col].astype("int64")
            content = [one(int(i)) for i in ids_col]
            yield pd.DataFrame(
                {
                    "doc_id": ids_col,
                    "content": pd.Series(content, dtype="object"),
                    "fmt": ["jpeg"] * len(ids_col),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched per-asset feature extraction over the binary column.

    Assets that decode as 24-bit BMPs report their REAL header dimensions
    and mean pixel value (``pixel_mean``, all channels, rounded to 4);
    everything else gets the deterministic byte-derived stand-in
    dimensions and a null ``pixel_mean``. The Pandas iterator keeps
    per-batch memory bounded regardless of partition size — the pattern
    scales to arbitrarily large asset tables.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def features(b) -> tuple[int, int, float | None]:
            # b is bytes/bytearray straight from Arrow — no copy needed;
            # slicing, len, struct.unpack_from, and np.frombuffer all
            # take the buffer as-is.
            if b[:2] in (b"BM", b"P6"):
                try:
                    img = decode_bmp(b) if b[:2] == b"BM" else decode_ppm(b)
                    return (
                        img.shape[1],
                        img.shape[0],
                        round(float(img.mean()), 4),
                    )
                except (ValueError, NotImplementedError):
                    pass  # malformed/unsupported: byte-derived fallback
            w, h = fake_dimensions(len(b))
            return w, h, None

        for pdf in it:
            content = pdf["content"]
            n_bytes = content.map(len)
            dims = [features(b) for b in content]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": pd.Series(
                        [d[0] for d in dims], dtype="int32"
                    ),
                    "height": pd.Series(
                        [d[1] for d in dims], dtype="int32"
                    ),
                    "pixel_mean": pd.Series(
                        [d[2] for d in dims], dtype="float64"
                    ),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


#: Output schema of ``image_decode_features`` — every column is REAL
#: decode output (no fallbacks): dims from the container header, mean
#: over all samples, and the decoded top-left red sample, which pins the
#: orientation/channel unscrambling (BMP stores bottom-up BGR, PPM
#: top-down RGB; both must decode to the same logical array).
IMAGE_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixel_mean", DoubleType()),
        StructField("first_pixel", IntegerType()),
    ]
)


#: Per-id synthetic format assignment: three real decoders, three
#: opposite corners of the layout-convention square (bottom-up BGR /
#: top-down RGB raw / top-down RGB zlib-filtered).
_SYNTH_FMTS = ("bmp", "ppm", "png")


def synth_image_assets(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-id synthetic image assets: ``id % 3`` selects
    24-bit BMP / binary PPM / filtered PNG (``synth_image_bytes``),
    dimensions ``(8 + id%5) x (8 + id%3)``, seed ``id % 256``.
    Arrow-batched map-only pass — the binary column is born distributed,
    exactly like a real media table read from object storage."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids_col = pdf[id_col].astype("int64")
            content = [
                synth_image_bytes(
                    int(i) % 256, 8 + int(i) % 5, 8 + int(i) % 3,
                    _SYNTH_FMTS[int(i) % 3],
                )
                for i in ids_col
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids_col,
                    "content": pd.Series(content, dtype="object"),
                    "fmt": [_SYNTH_FMTS[int(i) % 3] for i in ids_col],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, schema
    )


def image_decode_features(assets: DataFrame) -> DataFrame:
    """REAL image decode over a binary asset column (BMP + PPM).

    Unlike ``extract_features`` (which falls back to byte-derived stand-in
    dims for undecodable payloads), every row here must decode — a
    malformed payload raises, because this operator's contract is the
    decode itself. ``pixel_mean`` uses the engine-stable
    ``floor(x*1e4 + 0.5)/1e4`` rounding so a SQL oracle reproduces it
    bit-for-bit.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, content, fmt in zip(
                pdf["doc_id"], pdf["content"], pdf["fmt"]
            ):
                img = decode_image(bytes(content))
                mean = float(img.mean())
                rows.append(
                    (
                        int(doc_id),
                        fmt,
                        len(content),
                        img.shape[1],
                        img.shape[0],
                        math.floor(mean * 1e4 + 0.5) / 1e4,
                        int(img[0, 0, 0]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "n_bytes", "width", "height",
                    "pixel_mean", "first_pixel",
                ],
            )

    return assets.mapInPandas(batches, IMAGE_DECODE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_assets(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: Arrow-batched pass emitting resized assets.

    The real pixel resample needs an imaging library (absent here), so the
    byte payload passes through unchanged and only the declared dimensions
    change — the schema, batching, and partition behavior are exactly what
    a real resampler plugs into (swap the body, keep the signature).
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "content": pdf["content"],  # stub: no real resample
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                }
            )

    return assets.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_sha256", StringType()),
    ]
)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled "frame".

    A real video decoder would emit per-frame images; the deterministic
    stand-in slices the byte payload every ``every_n_bytes`` and hashes each
    slice. The one-to-many row fan-out (the part that matters for Spark —
    schema, ordering, partition locality) is real.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                for i in range(min(max_frames, max(len(raw), 1) // every_n_bytes + 1)):
                    chunk = raw[i * every_n_bytes:(i + 1) * every_n_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_sha256": pd.Series(hashes, dtype="object"),
                }
            )

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def decode_image(content: bytes):
    """Decode an image asset to a pixel array.

    Uncompressed 24-bit BMPs, binary PPMs (P6), 8-bit gray/RGB/RGBA
    PNGs, sequential-baseline JPEGs, and GIF87a/89a (full LZW,
    interlace, first frame of animations) decode natively
    (``decode_bmp`` / ``decode_ppm`` / ``decode_png`` / ``decode_jpeg``
    / ``decode_gif`` — pure numpy + stdlib). Every other format
    (progressive JPEG, WebP, TIFF) needs PIL, which the execution
    container does not ship — those raise ``NotImplementedError``
    honestly instead of faking pixels."""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:8] == _PNG_SIG:
        return decode_png(content)
    if content[:2] == b"\xff\xd8":
        from arcane_framework_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(content)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from arcane_framework_spark.operators.gif import decode_gif

        return decode_gif(content)
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "non-BMP image decode requires an imaging library (PIL) not "
            "present in this environment; byte-level features remain "
            "available"
        ) from exc
    return Image.open(io.BytesIO(content))  # pragma: no cover


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM16 — real synthesis, real decode, real features
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000

AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def synthesize_wav(doc_id: int, n_chars: int) -> bytes:
    """Deterministic PCM16 mono square-wave WAV derived from (doc_id,
    n_chars): ``n = 256 + n_chars % 256`` samples at 8 kHz, half-period
    ``1 + doc_id % 8`` samples, amplitude ``8192 + doc_id % 8192``.

    The closed-form signal is what lets the DuckDB oracle predict the
    decoded features exactly (rms == amplitude for a square wave;
    zero crossings == floor((n-1)/half)) — so the WAV writer, the chunk
    parser, and the feature math are all genuinely exercised end-to-end.
    """
    import numpy as np

    n = 256 + (n_chars % 256)
    half = 1 + (doc_id % 8)
    amp = 8192 + (doc_id % 8192)
    i = np.arange(n)
    samples = np.where((i // half) % 2 == 0, amp, -amp).astype("<i2")
    data = samples.tobytes()
    byte_rate = WAV_SAMPLE_RATE * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_SAMPLE_RATE, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(content: bytes):
    """Parse a RIFF/WAVE container; return (sample_rate, n_channels,
    int16 numpy samples). Walks the chunk list (not fixed offsets, so
    files with extra chunks — LIST/INFO metadata — decode too). Raises
    ``ValueError`` on malformed input, ``NotImplementedError`` for
    non-PCM16 encodings (those need an audio library)."""
    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        # Validate the declared size against the buffer BEFORE slicing:
        # a lying size field must surface as the documented ValueError,
        # not a silent truncation or a struct/numpy error downstream.
        if pos + 8 + size > len(content):
            raise ValueError(
                f"chunk {cid!r} declares {size} bytes but only "
                f"{len(content) - pos - 8} remain"
            )
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if size % 2:
                raise ValueError("odd-length PCM16 data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 supported (got format={audio_format}, bits={bits})"
        )
    if rate <= 0 or channels <= 0:
        raise ValueError(
            f"degenerate fmt chunk (rate={rate}, channels={channels})"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return rate, channels, samples


def documents_as_wav_assets(df: DataFrame, id_col: str = "doc_id",
                            chars_col: str = "n_chars") -> DataFrame:
    """(doc_id, content: binary) with a synthesized WAV per document —
    the audio stand-in for a corpus whose assets live in object storage.
    Arrow-batched; synthesis is per-row numpy, no driver involvement."""
    def batches(it):
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "content": [
                        synthesize_wav(int(d), int(c))
                        for d, c in zip(pdf[id_col], pdf[chars_col])
                    ],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    return df.select(id_col, chars_col).mapInPandas(batches, schema)


def wav_audio_features(assets: DataFrame) -> DataFrame:
    """Decode WAV assets and emit per-asset audio statistics:
    (doc_id, sample_rate, n_samples, duration_ms, rms, zero_crossings).

    All stats are integer-exact for PCM16 input: the squared-sample mean
    is computed in int64 before the final sqrt, and a square wave's rms
    is its amplitude exactly (amp < 2^15 so amp^2 fits a double with no
    rounding) — which is what lets the oracle predict the output to the
    bit. Arrow-batched mapInPandas; per-batch memory bounded."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        rows: dict[str, list] = {k.name: [] for k in AUDIO_FEATURE_SCHEMA}

        def flush():
            out = pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(
                        rows["sample_rate"], dtype="int32"
                    ),
                    "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
                    "duration_ms": pd.Series(
                        rows["duration_ms"], dtype="int64"
                    ),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                    "zero_crossings": pd.Series(
                        rows["zero_crossings"], dtype="int64"
                    ),
                }
            )
            for v in rows.values():
                v.clear()
            return out

        for pdf in it:
            import numpy as np

            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                rate, channels, s = decode_wav(bytes(content))
                if channels != 1:
                    # Interleaved multi-channel stats would be silently
                    # wrong (2x frames, L/R sign flips); reject instead.
                    raise NotImplementedError(
                        f"doc {doc_id}: {channels}-channel WAV; "
                        "per-channel stats need de-interleaving"
                    )
                n = len(s)
                s64 = s.astype("int64")
                mean_sq = int((s64 * s64).sum()) / n if n else 0.0
                zc = int((np.diff(np.signbit(s)) != 0).sum()) if n else 0
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["rms"].append(
                    math.floor(math.sqrt(mean_sq) * 1e4 + 0.5) / 1e4
                )
                rows["zero_crossings"].append(zc)
            yield flush()

    return assets.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio spectral features: FFT dominant frequency over integer-period tones
# ---------------------------------------------------------------------------

SPECTRAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("dominant_bin", LongType()),
        StructField("dominant_freq_hz", DoubleType()),
        StructField("rms", DoubleType()),
    ]
)


def synthesize_tone_wav(doc_id: int) -> bytes:
    """Deterministic square TONE with an INTEGER number of periods:
    half-period ``1 + doc_id % 8`` samples, ``24 + doc_id % 40`` full
    cycles, amplitude ``4096 + doc_id % 8192``, 8 kHz PCM16.

    Integer periods mean zero spectral leakage: the DFT magnitude is an
    odd-harmonic comb whose argmax is EXACTLY the cycle count, so a SQL
    oracle can predict the numpy rfft's answer closed-form — the honest
    way to gate a real spectral feature extractor without shipping an
    FFT in SQL."""
    import numpy as np

    half = 1 + (doc_id % 8)
    cycles = 24 + (doc_id % 40)
    amp = 4096 + (doc_id % 8192)
    n = 2 * half * cycles
    i = np.arange(n)
    samples = np.where((i // half) % 2 == 0, amp, -amp).astype("<i2")
    data = samples.tobytes()
    byte_rate = WAV_SAMPLE_RATE * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_SAMPLE_RATE, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def documents_as_tone_assets(df: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, content): one synthesized tone WAV per document."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "content": [
                        synthesize_tone_wav(int(d)) for d in pdf[id_col]
                    ],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    return df.select(id_col).mapInPandas(batches, schema)


def wav_spectral_features(assets: DataFrame) -> DataFrame:
    """REAL spectral analysis over WAV assets: numpy rfft per asset,
    emitting (doc_id, sample_rate, n_samples, dominant_bin,
    dominant_freq_hz, rms).

    ``dominant_bin`` is the argmax of the magnitude spectrum over bins
    1..n/2 (DC excluded); ``dominant_freq_hz = rate * bin / n`` with the
    integer product exact and ONE double division, so the oracle's
    arithmetic is bit-identical; ``rms`` uses the exact int64
    squared-sample mean. Arrow-batched ``mapInPandas`` — the FFT runs
    where the bytes are, one Python worker per partition, nothing
    collected to the driver."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                rate, channels, samples = decode_wav(bytes(content))
                if channels != 1:
                    raise ValueError("spectral features expect mono")
                n = len(samples)
                mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
                bin_ = int(np.argmax(mag[1:])) + 1
                sq = samples.astype(np.int64)
                rms = math.sqrt(int((sq * sq).sum()) / n)
                freq = math.floor(
                    (rate * bin_) / n * 1e4 + 0.5
                ) / 1e4
                rows.append(
                    (int(doc_id), rate, n, bin_, freq, rms)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "dominant_bin",
                    "dominant_freq_hz", "rms",
                ],
            )

    return assets.mapInPandas(batches, SPECTRAL_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual hashing (dHash) — image near-dup blocking
# ---------------------------------------------------------------------------

#: dHash grid: 8 cell rows x 9 cell columns -> 8 adjacent-column
#: comparisons per row = 64 bits, emitted as two 32-bit halves so
#: neither engine touches the int64 sign bit.
DHASH_ROWS = 8
DHASH_COLS = 9

DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("hash_hi", LongType()),
        StructField("hash_lo", LongType()),
    ]
)


def image_dhash(assets: DataFrame) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint per image asset —
    the blocking key for image near-dup detection (a brightness shift
    or re-encode keeps the hash; different content changes it).

    The asset decodes through the repo's pure-numpy decoders
    (``decode_image``), pixels sum to an 8x9 grid of integer CELL SUMS
    (channel-summed — never a float mean), and bit (r, c) is the exact
    integer comparison ``cell[r][c] < cell[r][c+1]``. Image dimensions
    must be multiples of the grid (the caller controls synthesis /
    resize). Arrow-batched map-only pass; the output is one 3-long row
    per image, groupable/joinable at any corpus size."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                img = decode_image(bytes(content)).astype(np.int64)
                h, w = img.shape[0], img.shape[1]
                if h % DHASH_ROWS or w % DHASH_COLS:
                    raise ValueError(
                        f"dhash needs dims divisible by "
                        f"{DHASH_ROWS}x{DHASH_COLS}, got {h}x{w}"
                    )
                bh, bw = h // DHASH_ROWS, w // DHASH_COLS
                cells = img.reshape(
                    DHASH_ROWS, bh, DHASH_COLS, bw, img.shape[2]
                ).sum(axis=(1, 3, 4))
                bits = cells[:, :-1] < cells[:, 1:]
                hi = lo = 0
                for r in range(DHASH_ROWS):
                    for c in range(DHASH_COLS - 1):
                        if bits[r, c]:
                            if r < 4:
                                hi |= 1 << (r * 8 + c)
                            else:
                                lo |= 1 << ((r - 4) * 8 + c)
                out.append((int(doc_id), hi, lo))
            yield pd.DataFrame(
                out, columns=["doc_id", "hash_hi", "hash_lo"]
            )

    return assets.mapInPandas(batches, DHASH_SCHEMA)


def synth_dhash_assets(ids: DataFrame, width: int = 18, height: int = 16,
                       id_col: str = "doc_id") -> DataFrame:
    """Synthetic assets sized for the dHash grid (dims multiples of
    8x9), format cycling bmp/ppm/png by id, seed ``id % 256`` — the
    closed-form pixel rule keeps the hash SQL-computable."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids_col = pdf[id_col].astype("int64")
            seeds = pdf["seed"].astype("int64")
            content = [
                synth_image_bytes(
                    int(s), width, height, _SYNTH_FMTS[int(i) % 3]
                )
                for i, s in zip(ids_col, seeds)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids_col,
                    "content": pd.Series(content, dtype="object"),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )
    return ids.mapInPandas(batches, schema)
