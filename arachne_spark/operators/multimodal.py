"""Multimodal binary-column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with
typed metadata, following the mediainfo (M-entity) capability of the
reference (commons endpoint selection, /root/reference/src/
pheidippides.cpp:36-39).  Everything that is pure structure or
lossless coding decodes FOR REAL from the public specs — no codec
library in this container, none needed; only the perceptual entropy
coders (MP3/AAC/OGG samples, non-MJPEG video pixels) keep
clearly-labeled stubs.  Every decoder bounds allocations by the
declared pixel cap and never raises on adversarial bytes.  The
Spark side — schema, Arrow batch shape, ``mapInPandas`` iterator
signature, fan-out row production, binary output columns, partition
preservation — is real and tested throughout:

* ``binary_meta``       — per-payload typed metadata (1 row / input);
* ``frame_sample``      — every-nth frame extraction (N rows / input
  — the fan-out shape of real video sampling), hash-checked against
  a byte-level DuckDB oracle (q42); REAL frames for AVI (movi
  chunks), MP4 (sample-table byte ranges) and animated GIF
  (re-wrapped standalone frames), fixed-stride slicing stub
  otherwise;
* ``resize_meta``       — decode → target-dimension computation with
  aspect preserved; thumbnail bytes are REAL nearest-neighbor
  resampled pixels for every pixel-decodable format (every legal
  PNG via ``decode_png_pixels`` — stdlib-zlib inflate + per-row
  unfilter, palette/16-bit/sub-byte/Adam7 included — binary PPM,
  GIF via pure-Python LZW, TIFF — uncompressed, LZW, Deflate,
  PackBits and JPEG strips, Predictor-2 undone — and JPEG —
  sequential AND progressive — via a from-spec T.81 decoder: Huffman
  entropy decode, Annex-G multi-scan coefficient accumulation,
  dequantize + numpy IDCT + YCbCr→RGB) and BMP; REAL SAMPLE decode
  for WAV PCM/IEEE-float AND lossless FLAC (rice-coded residuals,
  fixed/LPC predictors, stereo decorrelation — RFC 9639);
  payload-prefix stub only for the remaining entropy-coded formats
  (MP3/AAC/OGG samples);
* ``extract_features``  — payload → float feature vector: REAL
  grid-pooled luminance features for the pixel-decodable formats and
  a REAL byte-distribution gist (per-bin byte counts; cosine-
  compatible by scale invariance) for everything else — no stubbed
  feature path remains; the output column shape (array<float>) feeds
  the ANN operators directly (operators/ann.py) — binary in,
  searchable embedding out, end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(payload: bytes) -> dict | None:
    """PNG IHDR decode with structural validation, no codec library:
    fixed 8-byte magic, first chunk must be a 13-byte IHDR whose CRC32
    verifies (zlib.crc32 over type+data — stdlib, not a codec), field
    ranges per the spec, and the chunk table must actually contain an
    IDAT before IEND (header-only walk, skipping each chunk by its
    declared length — no inflation)."""
    import zlib

    n = len(payload)
    if n < 33 or bytes(payload[:8]) != PNG_MAGIC:
        return None
    if int.from_bytes(payload[8:12], "big") != 13:
        return None
    if bytes(payload[12:16]) != b"IHDR":
        return None
    crc = int.from_bytes(payload[29:33], "big")
    if zlib.crc32(bytes(payload[12:29])) != crc:
        return None
    w = int.from_bytes(payload[16:20], "big")
    h = int.from_bytes(payload[20:24], "big")
    bit_depth, color_type, compression, filt, interlace = payload[24:29]
    if not (0 < w < 2**31 and 0 < h < 2**31):
        return None
    legal_depths = {
        0: (1, 2, 4, 8, 16),  # greyscale
        2: (8, 16),           # truecolour
        3: (1, 2, 4, 8),      # indexed
        4: (8, 16),           # grey+alpha
        6: (8, 16),           # truecolour+alpha
    }
    if color_type not in legal_depths:
        return None
    if bit_depth not in legal_depths[color_type]:
        return None
    if compression != 0 or filt != 0 or interlace not in (0, 1):
        return None
    # walk the chunk table: every chunk's declared length must FIT the
    # payload (a truncated-mid-chunk or bogus-length file must fail,
    # same contract as the PPM pixel-length check), an IDAT must
    # appear, and the walk must reach IEND
    i, saw_idat, saw_iend = 33, False, False
    while i + 8 <= n:
        clen = int.from_bytes(payload[i:i + 4], "big")
        ctype = bytes(payload[i + 4:i + 8])
        if ctype == b"IEND":
            saw_iend = True
            break
        if i + 12 + clen > n:  # len + type + data + crc must fit
            return None
        if ctype == b"IDAT":
            saw_idat = True
        i += 12 + clen
    if not saw_idat or not saw_iend:
        return None
    return {"format": "png", "width": w, "height": h}


def _png_unfilter(
    raw: bytes, h: int, stride: int, bpp: int, off: int
) -> tuple[bytes, int] | None:
    """Invert the five per-row PNG filters (None/Sub/Up/Average/Paeth,
    spec §9) over ``h`` scanlines of ``stride`` bytes starting at
    ``raw[off]`` — one Adam7 pass, or the whole image when
    non-interlaced.  Returns (unfiltered rows, next offset), or None
    on truncation / an illegal filter byte."""
    need = h * (stride + 1)
    if off + need > len(raw):
        return None
    out = bytearray(h * stride)
    prev = bytes(stride)
    for y in range(h):
        base = off + y * (stride + 1)
        ft = raw[base]
        row = bytearray(raw[base + 1:base + 1 + stride])
        if ft == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = (
                    a
                    if pa <= pb and pa <= pc
                    else (b if pb <= pc else c)
                )
                row[x] = (row[x] + pr) & 0xFF
        elif ft != 0:
            return None
        out[y * stride:(y + 1) * stride] = row
        prev = row
    return bytes(out), off + need


# Adam7 pass origins/steps (x0, y0, dx, dy), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png_pixels(payload: bytes | None) -> dict | None:
    """REAL PNG pixel decode via stdlib zlib — no codec library:
    inflate the concatenated IDAT stream and invert the five per-row
    filters (None/Sub/Up/Average/Paeth, PNG spec §9) scanline by
    scanline.  Covers every legal PNG format: the 8-bit
    direct formats (color types 0 grey, 2 RGB, 4 grey+alpha, 6 RGBA),
    palette images (color type 3 at bit depths 1/2/4/8: MSB-first
    index unpack + PLTE lookup → RGB), sub-byte grayscale (depths
    1/2/4, rescaled to 8-bit by v*255/(2^d-1)), 16-bit samples
    (reduced to 8-bit by the high byte, the spec's sample-depth
    scaling), and Adam7 interlace (spec §8.2: seven independently
    filtered reduced images scattered back onto the pixel grid; empty
    passes contribute zero stream bytes).  Returns
    ``{"width", "height", "channels", "pixels"}`` with ``pixels`` =
    height rows of width*channels bytes, or None; never raises on
    adversarial bytes (structural validation via ``_decode_png``,
    zlib/length failures → None).  Per-byte Python is fine here: this
    runs inside Arrow batches on THUMBNAIL-SCALE work (a deployment
    decoding full-size photos swaps in an Arrow-native codec, same
    mapInPandas plumbing)."""
    import zlib

    if not payload:
        return None
    meta = _decode_png(payload)
    if meta is None:
        return None
    bit_depth, color_type, interlace = (
        payload[24],
        payload[25],
        payload[28],
    )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    # legal (color type, bit depth) combinations, PNG spec §11.2.2
    if color_type == 3:
        if bit_depth not in (1, 2, 4, 8):
            return None
    elif channels is None:
        return None
    elif color_type == 0:
        if bit_depth not in (1, 2, 4, 8, 16):
            return None
    elif bit_depth not in (8, 16):
        return None
    w, h = meta["width"], meta["height"]
    if w * h > _JPEG_MAX_PIXELS:
        # adversarial-dimension guard: a CRC-valid IHDR can still
        # claim huge dims over a tiny (or zip-bomb) IDAT; bound the
        # pixel grid before any allocation, like _JPEG_MAX_PIXELS
        return None
    i, n, idat, plte = 33, len(payload), [], None
    while i + 8 <= n:  # chunk table already validated by _decode_png
        clen = int.from_bytes(payload[i:i + 4], "big")
        ctype = bytes(payload[i + 4:i + 8])
        if ctype == b"IEND":
            break
        if ctype == b"IDAT":
            idat.append(bytes(payload[i + 8:i + 8 + clen]))
        elif ctype == b"PLTE":
            plte = bytes(payload[i + 8:i + 8 + clen])
        i += 12 + clen
    try:
        # cap the inflate at the largest legal filtered-stream size
        # (≤ 8 bytes/pixel + one filter byte per scanline, interlace
        # adds at most one short row per pass) so a zip-bomb IDAT
        # cannot expand past the declared image
        max_raw = (w * 8 + 2) * h + 4096
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), max_raw)
        if d.unconsumed_tail:
            return None
    except zlib.error:
        return None
    # packed formats (palette at any depth, sub-byte grayscale) carry
    # one sample VALUE per pixel; byte-aligned formats carry bpp raw
    # bytes per pixel — decode each pass and scatter onto the full
    # pixel grid (the non-interlaced image is a single full-size pass)
    packed = color_type == 3 or bit_depth < 8
    if color_type == 3 and (plte is None or not plte or len(plte) % 3):
        return None
    if packed:
        vals = bytearray(w * h)  # one sample value per pixel
        mask = (1 << bit_depth) - 1
        per_byte = 8 // bit_depth
    else:
        sample_bytes = bit_depth // 8
        bpp = channels * sample_bytes
        out = bytearray(w * h * bpp)  # full-image sample bytes
    passes = ((0, 0, 1, 1),) if interlace == 0 else _ADAM7
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        if packed:
            # filters act on the packed index bytes: bpp = 1, stride =
            # the scanline's packed byte length (PNG spec §9: "bpp is
            # rounded up to one" for sub-byte depths)
            stride_p, bpp_p = (pw * bit_depth + 7) // 8, 1
        else:
            stride_p, bpp_p = pw * bpp, bpp
        res = _png_unfilter(raw, ph, stride_p, bpp_p, off)
        if res is None:
            return None
        rows, off = res
        if packed:
            for py in range(ph):
                base = py * stride_p
                trow = (y0 + py * dy) * w + x0
                for px in range(pw):
                    b = rows[base + px // per_byte]
                    shift = 8 - bit_depth * (px % per_byte + 1)
                    vals[trow + px * dx] = (b >> shift) & mask
        else:
            for py in range(ph):
                base = py * stride_p
                trow = (y0 + py * dy) * w + x0
                for px in range(pw):
                    t = (trow + px * dx) * bpp
                    s = base + px * bpp
                    out[t:t + bpp] = rows[s:s + bpp]
    if off != len(raw):  # the passes must tile the stream exactly
        return None
    if color_type == 3:
        n_entries = len(plte) // 3
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(vals):
            if idx >= n_entries:
                return None  # spec: out-of-range index is an error
            rgb[i * 3:i * 3 + 3] = plte[idx * 3:idx * 3 + 3]
        return {
            "width": w, "height": h, "channels": 3,
            "pixels": bytes(rgb),
        }
    if bit_depth < 8:  # sub-byte grayscale → 8-bit rescale
        return {
            "width": w, "height": h, "channels": 1,
            "pixels": bytes(v * 255 // mask for v in vals),
        }
    if bit_depth == 16:  # high byte = the spec's depth rescale
        return {
            "width": w, "height": h, "channels": channels,
            "pixels": bytes(out[::2]),
        }
    return {
        "width": w,
        "height": h,
        "channels": channels,
        "pixels": bytes(out),
    }


def _ppm_pixels(payload: bytes | None) -> dict | None:
    """Raw pixel extraction for binary PPM (P6, maxval <= 255): the
    header parse is ``decode_image``'s tolerant netpbm walk; pixels
    are the w*h*3 bytes after the single whitespace following maxval.
    Same return shape as ``decode_png_pixels``."""
    if not payload or bytes(payload[:2]) != b"P6":
        return None
    img = decode_image(payload)
    if img is None or img["format"] != "ppm":
        return None
    # re-walk the header for the maxval and the pixel offset
    # (decode_image already validated structure + pixel length)
    toks: list[bytes] = []
    i, n = 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while (
                j < n
                and not payload[j:j + 1].isspace()
                and payload[j:j + 1] != b"#"
            ):
                j += 1
            toks.append(bytes(payload[i:j]))
            i = j
    if int(toks[2]) > 255:  # 2-byte samples out of scope (like 16-bit PNG)
        return None
    w, h = img["width"], img["height"]
    start = i + 1  # one whitespace byte after maxval
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "pixels": bytes(payload[start:start + w * h * 3]),
    }


def _nn_resize(
    pixels: bytes, w: int, h: int, ch: int, ow: int, oh: int
) -> bytes:
    """Deterministic nearest-neighbor resample (source index =
    floor(out_index * in_size / out_size)) — the thumbnail codec."""
    out = bytearray(ow * oh * ch)
    for oy in range(oh):
        sy = oy * h // oh
        for ox in range(ow):
            si = (sy * w + ox * w // ow) * ch
            oi = (oy * ow + ox) * ch
            out[oi:oi + ch] = pixels[si:si + ch]
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int, npix: int) -> bytes | None:
    """GIF-variant LZW decode (LSB-first variable-width codes, CLEAR /
    END control codes, 12-bit ceiling) — pure algorithm, no codec
    library.  Returns exactly ``npix`` index bytes or None."""
    if not 2 <= min_code <= 8:
        return None
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while len(out) < npix:
        if bitpos + code_size > total_bits:
            return None
        byte_i = bitpos // 8
        window = int.from_bytes(data[byte_i:byte_i + 4], "little")
        code = (window >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # the KwKwK case
                entry = prev + prev[:1]
            else:
                return None
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return bytes(out[:npix]) if len(out) >= npix else None


def decode_gif_pixels(payload: bytes | None) -> dict | None:
    """REAL GIF pixel decode — LZW is pure bit-twiddling, no codec
    library: walk to the FIRST image descriptor, choose its local or
    the global color table, concatenate the LZW sub-blocks, decode the
    index stream (``_lzw_decode``), undo interlacing if flagged, and
    map indices through the palette to RGB bytes.  Frames after the
    first (animation) are out of scope — the first frame is the
    thumbnail/feature source.  Same return shape as
    ``decode_png_pixels`` (channels = 3); None on anything malformed,
    never raises."""
    if not payload:
        return None
    img = decode_image(payload)
    if img is None or img["format"] != "gif":
        return None
    n = len(payload)
    flags = payload[10]
    gct = None
    i = 13
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        gct = bytes(payload[13:13 + size])
        i = 13 + size
    while i < n:
        b = payload[i]
        if b == 0x21:
            i = _skip_subblocks(payload, i + 2)
        elif b == 0x2C:
            # image descriptor: left, top, w, h (little-endian), flags
            iw = int.from_bytes(payload[i + 5:i + 7], "little")
            ih = int.from_bytes(payload[i + 7:i + 9], "little")
            lflags = payload[i + 9]
            j = i + 10
            pal = gct
            if lflags & 0x80:
                size = 3 * (2 << (lflags & 0x07))
                pal = bytes(payload[j:j + size])
                j += size
            if pal is None or iw <= 0 or ih <= 0:
                return None
            if iw * ih > _JPEG_MAX_PIXELS:
                return None  # bound the LZW output target (hostile
                # dims would otherwise let a small stream of max-length
                # dictionary entries expand ~4096x the payload)
            min_code = payload[j]
            j += 1
            # concatenate the LZW sub-blocks
            data = bytearray()
            while j < n:
                sz = payload[j]
                j += 1
                if sz == 0:
                    break
                data.extend(payload[j:j + sz])
                j += sz
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            if idx is None or max(idx) * 3 + 2 >= len(pal):
                return None
            if lflags & 0x40:  # interlaced: rows arrive in 4 passes
                rows = [idx[r * iw:(r + 1) * iw] for r in range(ih)]
                order = (
                    list(range(0, ih, 8))
                    + list(range(4, ih, 8))
                    + list(range(2, ih, 4))
                    + list(range(1, ih, 2))
                )
                deinter: list[bytes] = [b""] * ih
                for src, dst in enumerate(order):
                    deinter[dst] = rows[src]
                idx = b"".join(deinter)
            pixels = bytes(
                v for k in idx for v in pal[3 * k:3 * k + 3]
            )
            return {
                "width": iw,
                "height": ih,
                "channels": 3,
                "pixels": pixels,
            }
        else:
            return None
        if i is None:
            return None
    return None


# SOF markers that carry frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
# (C4 = DHT, C8 = JPG extension, CC = DAC — no dimensions)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _skip_subblocks(payload: bytes, i: int) -> int | None:
    """Advance past a GIF sub-block chain (size-prefixed blocks ending
    at a 0 terminator); None if the chain runs off the payload."""
    n = len(payload)
    while i < n:
        sz = payload[i]
        i += 1
        if sz == 0:
            return i
        i += sz
    return None


def _decode_gif(payload: bytes) -> dict | None:
    """GIF logical-screen decode with a full block walk: header +
    screen descriptor give (width, height); the walk skips the global
    color table, extension and image blocks (each sub-block chain
    bounds-checked) and must find at least one image descriptor AND
    the 0x3B trailer — "GIF89a" followed by junk fails, same contract
    as the PNG chunk walk."""
    n = len(payload)
    if n < 14 or bytes(payload[:6]) not in (b"GIF87a", b"GIF89a"):
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    if w <= 0 or h <= 0:
        return None
    flags = payload[10]
    i = 13
    if flags & 0x80:  # global color table: 3 bytes x 2^(bits+1)
        i += 3 * (2 << (flags & 0x07))
    saw_image = False
    while i < n:
        b = payload[i]
        if b == 0x3B:  # trailer
            if saw_image:
                return {"format": "gif", "width": w, "height": h}
            return None
        if b == 0x21:  # extension: introducer + label + sub-blocks
            nxt = _skip_subblocks(payload, i + 2)
        elif b == 0x2C:  # image descriptor
            if i + 10 > n:
                return None
            lflags = payload[i + 9]
            j = i + 10
            if lflags & 0x80:  # local color table
                j += 3 * (2 << (lflags & 0x07))
            nxt = _skip_subblocks(payload, j + 1)  # +1: LZW code size
            saw_image = True
        else:
            return None
        if nxt is None:
            return None
        i = nxt
    return None  # ran out of payload before the trailer


def _decode_jpeg(payload: bytes) -> dict | None:
    """JPEG frame-header decode via the marker-segment walk, no codec
    library: SOI, then FF-prefixed segments skipped by their declared
    big-endian lengths until a SOF marker yields (precision, height,
    width, components).  The walk itself is the structural validation:
    every segment must start with 0xFF and carry a sane length —
    arbitrary text after an SOI prefix fails the walk."""
    n = len(payload)
    if n < 4 or bytes(payload[:2]) != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
            return None
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if marker in _JPEG_SOF:
            if seg_len < 8:
                return None
            precision = payload[i + 4]
            h = int.from_bytes(payload[i + 5:i + 7], "big")
            w = int.from_bytes(payload[i + 7:i + 9], "big")
            ncomp = payload[i + 9]
            if w <= 0 or h <= 0:
                return None
            if precision not in (8, 12, 16) or ncomp not in (1, 3, 4):
                return None
            return {"format": "jpeg", "width": w, "height": h}
        i += 2 + seg_len
    return None


# Baseline-JPEG pixel decode (ITU-T T.81 sequential DCT, Huffman):
# zigzag scan order, the 8x8 DCT-III basis, canonical Huffman tables
# from the DHT BITS/HUFFVAL encoding, and an MSB-first bit reader over
# the byte-stuffed entropy-coded segment.  Everything below is from
# the public spec — no codec library.

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_dct_basis() -> "np.ndarray":
    c = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_JPEG_DCT_C = _jpeg_dct_basis()

# adversarial dimension-claim bound for the full pixel decode (the
# header-only walk above has no such bound — metadata is cheap)
_JPEG_MAX_PIXELS = 1 << 22


def _jpeg_huff_table(
    bits: list[int], vals: bytes
) -> dict[tuple[int, int], int]:
    """(code length, code value) -> symbol, from DHT's BITS/HUFFVAL
    canonical encoding (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("huffman vals underrun")
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first reader over an entropy-coded segment: removes 0xFF00
    byte stuffing, pads with 1-bits at a real marker (spec-legal scan
    tail), raises ValueError on payload underrun; restart markers are
    consumed byte-aligned via ``align_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise ValueError("scan underrun")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2
                elif nxt is None:
                    raise ValueError("scan underrun")
                else:
                    b = 0xFF  # marker reached: 1-bit padding, stay put
                    self.acc = (self.acc << 8) | b
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff_decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad huffman code")

    def align_restart(self, n: int) -> None:
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        if p + 2 > len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + (n & 7):
            raise ValueError("missing restart marker")
        self.pos = p + 2


def _jpeg_extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(payload: bytes | None) -> dict | None:
    """REAL baseline-JPEG pixel decode from the public T.81 spec — no
    codec library: the marker walk collects DQT/DHT/SOF/DRI, the scan
    is Huffman-decoded MCU by MCU (DC prediction + AC run/size codes,
    restart markers honored), coefficients are dequantized,
    un-zigzagged and IDCT'd with the exact 8x8 float basis (numpy),
    chroma planes are nearest-upsampled, and YCbCr converts to RGB by
    the JFIF matrix.  PROGRESSIVE frames (SOF2) decode too: T.81
    Annex G coefficient accumulation across scans — DC first and
    refinement scans (interleaved MCU order or per-component tight
    grids), AC first scans with EOB runs and ZRL, and AC refinement
    scans with position-synchronized correction bits — then one
    shared dequantize + IDCT + assemble pass at EOI.  Scope: Huffman
    8-bit (SOF0/1/2), 1 or 3 components, sampling factors 1-4 — the
    overwhelming majority of web JPEGs; arithmetic, 12-bit and CMYK
    return None and stay on the metadata-only path.  Same return
    shape as ``decode_png_pixels``; never raises on adversarial bytes
    (dimension claims bounded by ``_JPEG_MAX_PIXELS``).  Per-symbol
    Python bit-reading is fine here: thumbnail-scale work inside
    Arrow batches, same contract as the PNG unfilter loop."""
    if not payload or len(payload) < 4:
        return None
    try:
        return _jpeg_pixels(bytes(payload))
    except (ValueError, IndexError, KeyError, struct.error,
            OverflowError):
        return None


def _jpeg_pixels(p: bytes) -> dict | None:
    if p[0] != 0xFF or p[1] != 0xD8:
        return None
    n = len(p)
    i = 2
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] | None = None
    w = h = 0
    dri = 0
    progressive = False
    coefs = grids = None  # per-component coefficient store (SOF2)
    n_scans = 0
    while i + 2 <= n:
        if p[i] != 0xFF:
            return None
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:  # EOI: ends a progressive frame
            if progressive and n_scans:
                return _jpeg_prog_finish(w, h, comps, coefs, grids, qt)
            return None
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(p[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        body = p[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                step = 128 if pq else 64
                if pq > 1 or j + 1 + step > len(body):
                    return None
                if pq:
                    tbl = [
                        int.from_bytes(
                            body[j + 1 + 2 * k:j + 3 + 2 * k], "big"
                        )
                        for k in range(64)
                    ]
                else:
                    tbl = list(body[j + 1:j + 65])
                q = np.zeros((8, 8))
                for k in range(64):
                    q.flat[_JPEG_ZIGZAG[k]] = tbl[k]
                qt[tq] = q
                j += 1 + step
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = bytes(body[j + 17:j + 17 + nv])
                if len(vals) < nv or tc > 1:
                    return None
                (huff_dc if tc == 0 else huff_ac)[th] = (
                    _jpeg_huff_table(bits, vals)
                )
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # Huffman DCT frames
            if len(body) < 6 or body[0] != 8:
                return None
            progressive = marker == 0xC2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if not w or not h or w * h > _JPEG_MAX_PIXELS:
                return None
            if nc not in (1, 3) or len(body) < 6 + 3 * nc:
                return None
            comps = []
            for c in range(nc):
                hv = body[7 + 3 * c]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    return None
                comps.append((body[6 + 3 * c], ch, cv, body[8 + 3 * c]))
            if progressive:  # coefficients accumulate across scans
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = -(-w // (8 * hmax))
                mcus_y = -(-h // (8 * vmax))
                grids, coefs = [], []
                for _, ch, cv, _ in comps:
                    pw, ph = mcus_x * ch, mcus_y * cv  # padded grid
                    # tight grid for non-interleaved scans:
                    # ceil(ceil(dim * sampling / max_sampling) / 8)
                    tw = -(-(-(-w * ch // hmax)) // 8)
                    th_ = -(-(-(-h * cv // vmax)) // 8)
                    grids.append((pw, ph, tw, th_, ch, cv))
                    coefs.append(np.zeros((ph, pw, 64), dtype=np.int32))
        elif marker in _JPEG_SOF:  # arithmetic/lossless/12-bit
            return None
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if comps is None:
                return None
            if progressive:
                n_scans += 1
                if n_scans > 64:  # bound adversarial scan counts
                    return None
                i = _jpeg_prog_sos(
                    p, i + 2 + seg_len, body, comps, grids, coefs,
                    huff_dc, huff_ac, dri,
                )
                continue
            ns = body[0] if body else 0
            if ns != len(comps) or len(body) < 1 + 2 * ns + 3:
                return None
            scan = []
            for s in range(ns):
                cs = body[1 + 2 * s]
                td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
                idx = next(
                    (k for k, c in enumerate(comps) if c[0] == cs),
                    None,
                )
                if idx is None or td not in huff_dc or ta not in huff_ac:
                    return None
                scan.append((idx, huff_dc[td], huff_ac[ta]))
            return _jpeg_scan(
                p, i + 2 + seg_len, w, h, comps, scan, qt, dri
            )
        i += 2 + seg_len
    return None


def _jpeg_next_marker(p: bytes, pos: int) -> int:
    """Position of the next non-stuffed, non-restart marker at or
    after ``pos`` (the resume point after a progressive scan's
    entropy-coded segment)."""
    n = len(p)
    i = pos
    while i + 1 < n:
        if p[i] == 0xFF and p[i + 1] != 0x00:
            if 0xD0 <= p[i + 1] <= 0xD7:
                i += 2
                continue
            return i
        i += 1
    raise ValueError("no terminating marker after scan")


def _jpeg_prog_sos(p, pos, body, comps, grids, coefs, huff_dc,
                   huff_ac, dri):
    """Decode one progressive scan (T.81 Annex G) into the
    coefficient store: DC first/refinement scans (interleaved MCU
    order or a single component's tight block grid) and AC
    first/refinement scans (single component, EOB runs, correction
    bits).  Returns the payload position of the next marker."""
    ns = body[0] if body else 0
    if ns < 1 or len(body) < 1 + 2 * ns + 3:
        raise ValueError("bad SOS")
    ss = body[1 + 2 * ns]
    se = body[2 + 2 * ns]
    a = body[3 + 2 * ns]
    ah, al = a >> 4, a & 15
    if ss > se or se > 63 or al > 13:
        raise ValueError("bad spectral range")
    scan = []
    for s in range(ns):
        cs = body[1 + 2 * s]
        td, ta = body[2 + 2 * s] >> 4, body[2 + 2 * s] & 15
        idx = next((k for k, c in enumerate(comps) if c[0] == cs), None)
        if idx is None:
            raise ValueError("unknown component in scan")
        scan.append((idx, td, ta))
    reader = _JpegBits(p, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        for _, td, _ in scan:
            if ah == 0 and td not in huff_dc:
                raise ValueError("missing DC table")
        _jpeg_prog_dc(reader, scan, grids, coefs, huff_dc, ah, al, dri)
    else:
        if ns != 1:
            raise ValueError("interleaved AC scan")
        ci, _, ta = scan[0]
        if ta not in huff_ac:
            raise ValueError("missing AC table")
        _jpeg_prog_ac(reader, grids[ci], coefs[ci], huff_ac[ta], ss,
                      se, ah, al, dri)
    return _jpeg_next_marker(p, reader.pos)


def _jpeg_prog_dc(reader, scan, grids, coefs, huff_dc, ah, al, dri):
    preds = {ci: 0 for ci, _, _ in scan}
    rst_n = 0
    count = 0

    def block(ci, td, by, bx):
        if ah == 0:  # first scan: diff at precision al
            t = reader.huff_decode(huff_dc[td])
            if t > 11:
                raise ValueError("bad DC category")
            preds[ci] += _jpeg_extend(reader.receive(t), t)
            coefs[ci][by, bx, 0] = preds[ci] << al
        elif reader.read_bit():  # refinement: one bit per block
            coefs[ci][by, bx, 0] |= 1 << al

    if len(scan) == 1:  # non-interleaved: the tight block grid
        ci, td, _ = scan[0]
        _, _, tw, th_, _, _ = grids[ci]
        for by in range(th_):
            for bx in range(tw):
                if dri and count and count % dri == 0:
                    reader.align_restart(rst_n)
                    rst_n = (rst_n + 1) & 7
                    preds[ci] = 0
                block(ci, td, by, bx)
                count += 1
        return
    pw0, ph0, _, _, ch0, cv0 = grids[scan[0][0]]
    mcus_x, mcus_y = pw0 // ch0, ph0 // cv0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and count and count % dri == 0:
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = {ci: 0 for ci, _, _ in scan}
            for ci, td, _ in scan:
                _, _, _, _, ch, cv = grids[ci]
                for by in range(cv):
                    for bx in range(ch):
                        block(ci, td, my * cv + by, mx * ch + bx)
            count += 1


def _jpeg_prog_ac(reader, grid, coef, tbl, ss, se, ah, al, dri):
    _, _, tw, th_, _, _ = grid
    eobrun = 0
    rst_n = 0
    count = 0
    p1 = 1 << al
    m1 = -p1
    for by in range(th_):
        for bx in range(tw):
            if dri and count and count % dri == 0:
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                eobrun = 0
            count += 1
            blk = coef[by, bx]
            if ah == 0:  # AC first scan at precision al
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.huff_decode(tbl)
                    r, s = rs >> 4, rs & 15
                    if s:
                        k += r
                        if k > se:
                            raise ValueError("AC index overrun")
                        blk[k] = _jpeg_extend(reader.receive(s), s) << al
                        k += 1
                    else:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.receive(r)
                            break
                        k += 16  # ZRL
                continue
            # AC refinement scan (T.81 G.1.2.3 / libjpeg semantics)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.huff_decode(tbl)
                    r, s = rs >> 4, rs & 15
                    if s:
                        if s != 1:
                            raise ValueError("bad refinement size")
                        s = p1 if reader.read_bit() else m1
                    else:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        s = 0  # ZRL: pass 16 zero-history positions
                    while k <= se:
                        c = int(blk[k])
                        if c != 0:  # history coef: correction bit
                            if reader.read_bit() and (c & p1) == 0:
                                blk[k] = c + (p1 if c >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if s and k <= se:
                        blk[k] = s
                    k += 1
            if eobrun > 0:  # correction bits for the EOB-run tail
                while k <= se:
                    c = int(blk[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            blk[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1


def _jpeg_prog_finish(w, h, comps, coefs, grids, qt):
    """Dequantize + IDCT the accumulated progressive coefficients and
    assemble the pixel output (shared tail with the sequential path)."""
    zz = list(_JPEG_ZIGZAG)
    basis, basis_t = _JPEG_DCT_C, _JPEG_DCT_C.T
    planes = []
    for ci, (_, ch, cv, tq) in enumerate(comps):
        if tq not in qt:
            return None
        q = qt[tq]
        pw, ph, _, _, _, _ = grids[ci]
        plane = np.zeros((ph * 8, pw * 8))
        for by in range(ph):
            for bx in range(pw):
                nat = np.zeros(64)
                nat[zz] = coefs[ci][by, bx]
                block = basis_t @ (nat.reshape(8, 8) * q) @ basis
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = block
        planes.append(plane)
    return _jpeg_assemble(w, h, comps, planes)


def _jpeg_scan(p, pos, w, h, comps, scan, qt, dri):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for _, _, _, tq in comps:
        if tq not in qt:
            raise ValueError("missing quant table")
    planes = [
        np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
        for _, ch, cv, _ in comps
    ]
    reader = _JpegBits(p, pos)
    preds = [0] * len(comps)
    rst_n = 0
    mcu_count = 0
    zz = _JPEG_ZIGZAG
    basis, basis_t = _JPEG_DCT_C, _JPEG_DCT_C.T
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.align_restart(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * len(comps)
            for ci, dc_tbl, ac_tbl in scan:
                _, ch, cv, tq = comps[ci]
                q = qt[tq]
                for by in range(cv):
                    for bx in range(ch):
                        coef = np.zeros((8, 8))
                        t = reader.huff_decode(dc_tbl)
                        if t > 11:
                            raise ValueError("bad DC category")
                        preds[ci] += _jpeg_extend(reader.receive(t), t)
                        coef.flat[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff_decode(ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            coef.flat[zz[k]] = _jpeg_extend(
                                reader.receive(s), s
                            )
                            k += 1
                        block = basis_t @ (coef * q) @ basis
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    return _jpeg_assemble(w, h, comps, planes)


def _jpeg_assemble(w, h, comps, planes):
    """Level-shift, crop, nearest-upsample and color-convert the
    per-component IDCT planes — shared by the sequential and
    progressive paths."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for ci, (_, ch, cv, _) in enumerate(comps):
        plane = planes[ci] + 128.0
        ys = (np.arange(h) * cv) // vmax
        xs = (np.arange(w) * ch) // hmax
        full.append(plane[np.ix_(ys, xs)])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return {
            "width": w, "height": h, "channels": 1,
            "pixels": out.tobytes(),
        }
    y, cb, cr = full
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {
        "width": w, "height": h, "channels": 3, "pixels": out.tobytes(),
    }


def _decode_tiff(payload: bytes) -> dict | None:
    """TIFF baseline header decode, both byte orders: magic (II*\\0 /
    MM\\0*), first-IFD offset, then the IFD entry table (12-byte
    entries) read for ImageWidth (256) / ImageLength (257) as SHORT or
    LONG; structural validation = the IFD must fit the payload, both
    dimensions must be present and positive, and the image must
    declare pixel data (StripOffsets 273 or TileOffsets 324) — "II*"
    followed by junk fails.  Inline values are left-justified in the
    4-byte value field per the spec, so a SHORT reads from the field's
    first two bytes in either byte order."""
    n = len(payload)
    if n < 8:
        return None
    if bytes(payload[:4]) == b"II*\x00":
        endian = "little"
    elif bytes(payload[:4]) == b"MM\x00*":
        endian = "big"
    else:
        return None
    off = int.from_bytes(payload[4:8], endian)
    if off < 8 or off + 2 > n:
        return None
    cnt = int.from_bytes(payload[off:off + 2], endian)
    if cnt == 0 or off + 2 + 12 * cnt + 4 > n:
        return None
    w = h = None
    has_data = False
    for i in range(cnt):
        e = off + 2 + 12 * i
        tag = int.from_bytes(payload[e:e + 2], endian)
        typ = int.from_bytes(payload[e + 2:e + 4], endian)
        count = int.from_bytes(payload[e + 4:e + 8], endian)
        if typ == 3:  # SHORT, inline (left-justified)
            val = int.from_bytes(payload[e + 8:e + 10], endian)
        elif typ == 4:  # LONG, inline
            val = int.from_bytes(payload[e + 8:e + 12], endian)
        else:
            val = None
        if tag == 256 and count == 1:
            w = val
        elif tag == 257 and count == 1:
            h = val
        elif tag in (273, 324):
            has_data = True
    if not w or not h or not has_data:
        return None
    return {"format": "tiff", "width": w, "height": h}


def _tiff_values(
    payload: bytes, endian: str, typ: int, count: int, field: bytes
) -> list[int] | None:
    """IFD entry values: SHORT(3)/LONG(4) arrays, inline when they fit
    the 4-byte value field, otherwise at the offset it holds."""
    size = 2 if typ == 3 else 4 if typ == 4 else None
    if size is None or count == 0:
        return None
    if count * size <= 4:
        raw = field
    else:
        off = int.from_bytes(field, endian)
        if off + count * size > len(payload):
            return None
        raw = bytes(payload[off:off + count * size])
    return [
        int.from_bytes(raw[k * size:(k + 1) * size], endian)
        for k in range(count)
    ]


def _tiff_lzw(src: bytes) -> bytes | None:
    """TIFF-variant LZW decode (TIFF 6.0 §13) — pure bit-twiddling, no
    codec library.  Unlike the GIF variant (``_lzw_decode``): codes are
    packed MSB-first, the root alphabet is always the 256 byte values
    (ClearCode 256, EOI 257, first dictionary entry 258), the stream
    must begin with a ClearCode, and the code width grows one code
    EARLY — after adding entry N the decoder widens when the next free
    index N+1 reaches 2^width - 1 (the spec's "early change", which
    keeps the decoder in lockstep with an encoder that widens at
    2^width because its dictionary runs one entry ahead).  Decodes
    until EOI (or the bits run out) and returns the byte stream, or
    None on a corrupt code."""
    clear, eoi = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(src) * 8
    first = True
    while bitpos + width <= total_bits:
        byte_i = bitpos // 8
        chunk = bytes(src[byte_i:byte_i + 4])
        window = int.from_bytes(chunk.ljust(4, b"\x00"), "big")
        code = (window >> (32 - (bitpos % 8) - width)) & ((1 << width) - 1)
        bitpos += width
        if first:
            if code != clear:  # spec: every strip begins with Clear
                return None
            first = False
        if code == clear:
            width = 9
            del table[258:]
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1  # early change
        out.extend(entry)
        prev = entry
    return bytes(out)  # bits exhausted without EOI: tolerate per §13


def _packbits(src: bytes) -> bytes | None:
    """PackBits RLE decode (TIFF spec §9 / Apple): control byte n —
    0..127 copies n+1 literal bytes, 129..255 repeats the next byte
    257-n times, 128 is a no-op.  None on truncation."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        b = src[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            if i + b + 1 > n:
                return None
            out += src[i:i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                return None
            out += src[i:i + 1] * (257 - b)
            i += 1
    return bytes(out)


def decode_tiff_pixels(payload: bytes | None) -> dict | None:
    """REAL baseline-TIFF pixel decode — no codec library: both byte
    orders, Compression 1 (none), 5 (LZW — ``_tiff_lzw``, MSB-first
    early-change variant), 8/32946 (Deflate — stdlib zlib), 32773
    (PackBits RLE — ``_packbits``), each strip decompressed
    independently per the spec, and 7 (new-style JPEG, TIFF TechNote
    2 — each strip delegated to ``decode_jpeg_pixels``, shared
    JPEGTables spliced ahead of abbreviated strip streams, decoded
    strips stitched with their SOF geometry checked against the strip
    layout); Predictor 2 (horizontal differencing, TIFF spec §14)
    undone per row per channel AT SAMPLE WIDTH; 8 or 16 bits per
    sample (16-bit samples read in the file's byte order, inverted /
    predicted at full width, then reduced by the high byte — the
    PNG-spec rescale); Photometric 0 (WhiteIsZero, inverted), 1
    (BlackIsZero), 2 (RGB) or 6 (YCbCr, JPEG strips only);
    SamplesPerPixel 1 or 3; strip offsets/byte-counts read inline or
    through their value offsets, concatenated strips must tile
    width*height*channels exactly.  TILED layouts (TIFF6 §15, tags
    322-325) decode too: full-size edge tiles decompressed
    independently, predictor undone per tile row, placement cropped
    to the image.  PLANAR layouts (PlanarConfiguration 2) decode for
    strips: plane 0's strips then plane 1's, re-interleaved.  Planar
    tiles and other bit depths return None (header metadata stays
    real via ``_decode_tiff``).  Same return shape as
    ``decode_png_pixels``; never raises."""
    if not payload:
        return None
    meta = _decode_tiff(payload)
    if meta is None:
        return None
    endian = "little" if bytes(payload[:4]) == b"II*\x00" else "big"
    off = int.from_bytes(payload[4:8], endian)
    cnt = int.from_bytes(payload[off:off + 2], endian)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(cnt):
        e = off + 2 + 12 * i
        tags[int.from_bytes(payload[e:e + 2], endian)] = (
            int.from_bytes(payload[e + 2:e + 4], endian),
            int.from_bytes(payload[e + 4:e + 8], endian),
            bytes(payload[e + 8:e + 12]),
        )

    def values(tag: int) -> list[int] | None:
        if tag not in tags:
            return None
        typ, count, field = tags[tag]
        return _tiff_values(payload, endian, typ, count, field)

    def scalar(tag: int, default: int | None = None) -> int | None:
        v = values(tag)
        return v[0] if v else default

    comp = scalar(259, 1)
    if comp not in (1, 5, 7, 8, 32946, 32773):
        return None  # none / LZW / JPEG / Deflate / PackBits
    predictor = scalar(317, 1)
    if predictor not in (1, 2):  # none / horizontal differencing
        return None
    photometric = scalar(262)
    spp = scalar(277, 1)
    bps = values(258)
    if comp == 7:  # new-style JPEG strips (TIFF TechNote 2)
        if 324 in tags or scalar(284, 1) != 1 or predictor != 1:
            return None
        if photometric not in (1, 2, 6) or spp not in (1, 3):
            return None  # grayscale / RGB / YCbCr (JPEG-native)
        if bps is None or len(bps) != spp or any(b != 8 for b in bps):
            return None
        offs, counts = values(273), values(279)
        if offs is None or counts is None or len(offs) != len(counts):
            return None
        w, h = meta["width"], meta["height"]
        rps = scalar(278, h)
        if not rps or len(offs) != -(-h // rps):
            return None
        # JPEGTables (tag 347, UNDEFINED): SOI + DQT/DHT + EOI shared
        # by abbreviated strip streams; splice ahead of each strip
        tables = b""
        if 347 in tags:
            typ, count, field = tags[347]
            if typ != 7 or count < 4:
                return None
            toff = (int.from_bytes(field, endian)
                    if count > 4 else None)
            raw = (bytes(payload[toff:toff + count])
                   if toff is not None else field[:count])
            if (len(raw) != count or raw[:2] != b"\xff\xd8"
                    or raw[-2:] != b"\xff\xd9"):
                return None
            tables = raw[2:-2]
        out = bytearray()
        rows_done = 0
        for o, c in zip(offs, counts):
            if o + c > len(payload):
                return None
            strip = bytes(payload[o:o + c])
            if tables and strip[:2] == b"\xff\xd8":
                strip = b"\xff\xd8" + tables + strip[2:]
            dec = decode_jpeg_pixels(strip)
            want_rows = min(rps, h - rows_done)
            if (dec is None or dec["width"] != w
                    or dec["height"] != want_rows
                    or dec["channels"] != spp):
                return None
            out += dec["pixels"]
            rows_done += want_rows
        if rows_done != h:
            return None
        return {"width": w, "height": h, "channels": spp,
                "pixels": bytes(out)}
    if photometric not in (0, 1, 2) or spp not in (1, 3):
        return None
    if photometric == 2 and spp != 3:
        return None
    if (bps is None or len(bps) != spp or len(set(bps)) != 1
            or bps[0] not in (8, 16)):
        return None
    bits = bps[0]
    bsz = bits // 8
    mask = (1 << bits) - 1
    planar = scalar(284, 1)
    tiled = 322 in tags and 324 in tags
    if planar not in (1, 2) or (planar == 2 and tiled):
        return None
    # adversarial-dimension guard: the tiled/planar paths preallocate
    # w*h*spp, so claimed dims must be bounded BEFORE any allocation
    # (same contract as _JPEG_MAX_PIXELS; crawl payloads are hostile)
    if meta["width"] * meta["height"] > _JPEG_MAX_PIXELS:
        return None
    offs = counts = None
    if not tiled:
        offs, counts = values(273), values(279)
        if (offs is None or counts is None
                or len(offs) != len(counts)):
            return None
    w, h = meta["width"], meta["height"]
    n = len(payload)

    def decomp(chunk: bytes) -> list[int] | None:
        """Decompress one strip/tile and return its SAMPLE values
        (16-bit samples read in the file's byte order)."""
        if comp in (8, 32946):  # Deflate: each chunk its own stream
            import zlib

            try:
                chunk = zlib.decompress(chunk)
            except zlib.error:
                return None
        elif comp == 32773:
            chunk = _packbits(chunk)
            if chunk is None:
                return None
        elif comp == 5:  # LZW: each chunk its own stream (TIFF6 §13)
            chunk = _tiff_lzw(chunk)
            if chunk is None:
                return None
        if bsz == 1:
            return list(chunk)
        if len(chunk) % 2:
            return None
        return [
            int.from_bytes(chunk[k:k + 2], endian)
            for k in range(0, len(chunk), 2)
        ]

    def undo_predictor(buf, stride: int, rows: int, step: int) -> None:
        # horizontal differencing runs at the SAMPLE width (TIFF §14)
        for y in range(rows):
            base = y * stride
            for x in range(step, stride):
                buf[base + x] = (
                    buf[base + x] + buf[base + x - step]
                ) & mask

    if tiled:
        # tiles: a 2D grid of tw x tl blocks, each compressed
        # independently and FULL-SIZED even at the right/bottom edge
        # (TIFF6 §15); predictor runs per tile row, placement crops
        tw_, tl_ = scalar(322), scalar(323)
        t_offs, t_counts = values(324), values(325)
        if (not tw_ or not tl_ or t_offs is None or t_counts is None
                or len(t_offs) != len(t_counts)):
            return None
        across = -(-w // tw_)
        down = -(-h // tl_)
        if len(t_offs) != across * down:
            return None
        data = [0] * (w * h * spp)
        for ti, (o, c) in enumerate(zip(t_offs, t_counts)):
            if o + c > n:
                return None
            tile = decomp(bytes(payload[o:o + c]))
            if tile is None or len(tile) != tw_ * tl_ * spp:
                return None
            if predictor == 2:
                undo_predictor(tile, tw_ * spp, tl_, spp)
            x0 = (ti % across) * tw_
            y0 = (ti // across) * tl_
            ncopy = min(tw_, w - x0) * spp
            for ry in range(min(tl_, h - y0)):
                src = ry * tw_ * spp
                dst = ((y0 + ry) * w + x0) * spp
                data[dst:dst + ncopy] = tile[src:src + ncopy]
    elif planar == 2:
        # separate sample planes (PlanarConfiguration 2): the strip
        # list covers plane 0's rows, then plane 1's, ... (TIFF §8);
        # predictor differences within a plane, step 1
        per_plane = -(-h // (scalar(278, h) or h))
        if len(offs) != spp * per_plane:
            return None
        planes = []
        for p in range(spp):
            plane: list[int] = []
            for o, c in zip(
                offs[p * per_plane:(p + 1) * per_plane],
                counts[p * per_plane:(p + 1) * per_plane],
            ):
                if o + c > n:
                    return None
                part = decomp(bytes(payload[o:o + c]))
                if part is None:
                    return None
                plane.extend(part)
            if len(plane) != w * h:
                return None
            if predictor == 2:
                undo_predictor(plane, w, h, 1)
            planes.append(plane)
        data = [0] * (w * h * spp)
        for p, plane in enumerate(planes):
            data[p::spp] = plane
    else:
        data = []
        for o, c in zip(offs, counts):
            if o + c > n:
                return None
            strip = decomp(bytes(payload[o:o + c]))
            if strip is None:
                return None
            data.extend(strip)
        if len(data) != w * h * spp:
            return None
        if predictor == 2:  # strips slice whole rows: undo per row
            undo_predictor(data, w * spp, h, spp)
    if photometric == 0:  # WhiteIsZero: invert at full sample width
        data = [mask - v for v in data]
    if bits == 16:  # reduce by the high byte (the PNG-spec rescale)
        data = [v >> 8 for v in data]
    return {
        "width": w,
        "height": h,
        "channels": spp,
        "pixels": bytes(data),
    }


def _bmp_rle(data, w: int, h: int, bpp: int) -> list | None:
    """BI_RLE8 / BI_RLE4 decode (Windows BMP spec): encoded runs
    (count, index — nibbles alternating for RLE4), escapes 0,0 = end
    of line, 0,1 = end of bitmap, 0,2 = delta (skipped pixels stay
    index 0), and absolute runs padded to a 16-bit boundary.  Returns
    h bottom-up rows of palette indices, or None on truncation."""
    rows = [bytearray(w) for _ in range(h)]
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt:  # encoded run
            for k in range(cnt):
                if x < w and y < h:
                    if bpp == 8:
                        rows[y][x] = val
                    else:
                        rows[y][x] = (val >> 4) if k % 2 == 0 else (
                            val & 15
                        )
                x += 1
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return rows
        elif val == 2:  # delta: move the cursor
            if i + 2 > n:
                return None
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute run of `val` literal indices
            nb = val if bpp == 8 else (val + 1) // 2
            if i + nb > n:
                return None
            for k in range(val):
                if bpp == 8:
                    idx = data[i + k]
                else:
                    b = data[i + k // 2]
                    idx = (b >> 4) if k % 2 == 0 else (b & 15)
                if x < w and y < h:
                    rows[y][x] = idx
                x += 1
            i += nb + (nb & 1)  # runs pad to a WORD boundary
    return rows  # tolerated: bitmap without the 0,1 trailer


# MS Video 1 stream fourccs, as the little-endian biCompression u32
# they appear as in an AVI strf / re-wrapped BMP info header
_MSV1_FOURCCS = frozenset(
    int.from_bytes(f, "little") for f in (b"CRAM", b"MSVC", b"WHAM")
)


def _msvideo1_pixels(
    data, w: int, h: int, bpp: int, palette: list | None,
    canvas: bytes | None = None,
) -> bytes | None:
    """REAL MS Video 1 (CRAM/MSVC/WHAM) frame decode — a plain 4x4
    block vector-quantization codec, no entropy coder (public codec
    description: multimedia.cx wiki + MSDN; reference analog: the
    frame payloads `src/pheidippides.cpp` routes to media handling).
    Blocks run left→right in BOTTOM-UP block rows, and rows inside a
    block are emitted bottom-up too.  Per block, the leading LE word
    (a=low, b=high byte) selects: skip run ((b&0xFC)==0x84, count
    includes the current block — skipped blocks keep the canvas,
    which the standalone decode initializes to black; passing the
    previous frame's RGB bytes as ``canvas`` gives true inter-frame
    persistence, which is how ``compose_video_pixels`` plays a CRAM
    sequence), 2-color (b<0x80: 16 LSB-first flag
    bits, set bit = first color), 8-color (8-bit mode b>=0x90;
    16-bit mode signaled by bit 15 of the first color word; colors
    pair up per 2x2 quadrant), else 1-color.  8-bit colors index the
    DIB palette; 16-bit colors are RGB555 expanded with the
    endpoint-exact (v<<3)|(v>>2) replication.  Returns RGB bytes
    top-down, or None on malformed/truncated streams; never raises
    (callers rely on the never-raise contract)."""
    if w <= 0 or h <= 0 or w % 4 or h % 4:
        return None
    if bpp == 8:
        if palette is None:
            return None
        black = palette[0] if palette else b"\x00\x00\x00"
    elif bpp != 16:
        return None
    else:
        black = b"\x00\x00\x00"

    def rgb555(v: int) -> bytes:
        return bytes(
            (c << 3) | (c >> 2)
            for c in ((v >> 10) & 31, (v >> 5) & 31, v & 31)
        )

    if canvas is not None and len(canvas) == 3 * w * h:
        rows = [
            bytearray(canvas[3 * w * y:3 * w * (y + 1)])
            for y in range(h)
        ]
    else:
        rows = [bytearray(black * w) for _ in range(h)]

    def put(y: int, x: int, rgb: bytes) -> None:
        rows[y][3 * x:3 * x + 3] = rgb

    data = bytes(data)
    n = len(data)
    i = 0
    skip = 0
    try:
        for by in range(h // 4 - 1, -1, -1):
            top = by * 4
            for bx in range(w // 4):
                if skip:
                    skip -= 1
                    continue
                if i + 2 > n:
                    return None  # truncated: every non-skipped
                    # block needs its code word
                a, b = data[i], data[i + 1]
                i += 2
                if (b & 0xFC) == 0x84:  # skip run, self-inclusive
                    skip = (((b - 0x84) << 8) | a) - 1
                    continue
                x0 = bx * 4
                if bpp == 8:
                    if b < 0x80:  # 2-color
                        flags = (b << 8) | a
                        if i + 2 > n:
                            return None
                        cols = (palette[data[i]], palette[data[i + 1]])
                        i += 2
                        for ry in range(4):
                            y = top + 3 - ry
                            for rx in range(4):
                                put(y, x0 + rx,
                                    cols[(flags & 1) ^ 1])
                                flags >>= 1
                    elif b >= 0x90:  # 8-color, 2 per 2x2 quadrant
                        flags = (b << 8) | a
                        if i + 8 > n:
                            return None
                        cols = [palette[c] for c in data[i:i + 8]]
                        i += 8
                        for ry in range(4):
                            y = top + 3 - ry
                            for rx in range(4):
                                q = ((ry & 2) << 1) + (rx & 2)
                                put(y, x0 + rx,
                                    cols[q + ((flags & 1) ^ 1)])
                                flags >>= 1
                    else:  # 1-color: the low byte indexes the palette
                        rgb = palette[a]
                        for ry in range(4):
                            for rx in range(4):
                                put(top + ry, x0 + rx, rgb)
                else:  # 16-bit RGB555
                    if b < 0x80:
                        flags = (b << 8) | a
                        if i + 4 > n:
                            return None
                        c0 = int.from_bytes(data[i:i + 2], "little")
                        c1 = int.from_bytes(
                            data[i + 2:i + 4], "little"
                        )
                        i += 4
                        if c0 & 0x8000:  # 8-color variant
                            if i + 12 > n:
                                return None
                            words = [c0, c1] + [
                                int.from_bytes(
                                    data[i + 2 * k:i + 2 * k + 2],
                                    "little",
                                )
                                for k in range(6)
                            ]
                            i += 12
                            cols = [rgb555(v) for v in words]
                            for ry in range(4):
                                y = top + 3 - ry
                                for rx in range(4):
                                    q = ((ry & 2) << 1) + (rx & 2)
                                    put(y, x0 + rx,
                                        cols[q + ((flags & 1) ^ 1)])
                                    flags >>= 1
                        else:  # 2-color
                            cols = (rgb555(c0), rgb555(c1))
                            for ry in range(4):
                                y = top + 3 - ry
                                for rx in range(4):
                                    put(y, x0 + rx,
                                        cols[(flags & 1) ^ 1])
                                    flags >>= 1
                    else:  # 1-color: the word IS the RGB555 color
                        rgb = rgb555(((b << 8) | a) & 0x7FFF)
                        for ry in range(4):
                            for rx in range(4):
                                put(top + ry, x0 + rx, rgb)
    except (IndexError, ValueError):
        return None
    return b"".join(bytes(r) for r in rows)


def decode_bmp_pixels(payload: bytes | None) -> dict | None:
    """REAL BMP pixel decode — BMP needs no entropy codec:
    BITMAPINFOHEADER (or larger); BI_RGB raw rows at bit depths 1/4/8
    (palettized — BGRA quads after the info header, MSB-first
    sub-byte indices) and 24/32 (BGR(A) triples), rows 4-byte aligned
    and stored bottom-up (top-down when the height is negative);
    BI_RLE8/BI_RLE4 run-length rows (``_bmp_rle``); and MS Video 1
    frames at 8/16 bpp when biCompression carries the CRAM/MSVC/WHAM
    fourcc (``_msvideo1_pixels`` — the form ``_avi_video_frames``
    re-wraps AVI video chunks into, so video frames pixel-decode
    standalone).  Emits RGB.  Bitfield compressions and 16-bit
    BI_RGB return None (header metadata stays real).  Same return
    shape as ``decode_png_pixels``; never raises."""
    if not payload or len(payload) < 54 or bytes(payload[:2]) != b"BM":
        return None
    meta = _decode_bmp(payload)
    if meta is None:
        return None
    hdr_size = int.from_bytes(payload[14:18], "little")
    w = meta["width"]
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    h = abs(h_raw)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    rle = None
    msv1 = False
    if compression == 1 and bpp == 8 and h_raw > 0:
        rle = 8  # BI_RLE8 (RLE bitmaps are always bottom-up)
    elif compression == 2 and bpp == 4 and h_raw > 0:
        rle = 4  # BI_RLE4
    elif (compression in _MSV1_FOURCCS and bpp in (8, 16)
          and h_raw > 0):
        msv1 = True  # MS Video 1 frame re-wrapped as a DIB
    elif compression != 0 or bpp == 16:  # bitfields / 16-bit: no
        return None
    if w * h > _JPEG_MAX_PIXELS:
        # RLE data is variable-length, so claimed dims are unbounded
        # by the payload size — cap them before _bmp_rle preallocates
        return None
    offset = int.from_bytes(payload[10:14], "little")
    row_bytes = ((w * bpp + 31) // 32) * 4
    palette = None
    if bpp <= 8:
        n_colors = int.from_bytes(payload[46:50], "little") or (1 << bpp)
        if n_colors > (1 << bpp):
            return None
        pal_at = 14 + hdr_size
        if pal_at + 4 * n_colors > len(payload):
            return None
        palette = [
            bytes((payload[pal_at + 4 * i + 2],
                   payload[pal_at + 4 * i + 1],
                   payload[pal_at + 4 * i]))
            for i in range(n_colors)
        ]
    if msv1:
        pixels = _msvideo1_pixels(
            payload[offset:], w, h, bpp, palette
        )
        if pixels is None:
            return None
        return {"width": w, "height": h, "channels": 3,
                "pixels": pixels}
    if rle:
        idx_rows = _bmp_rle(
            bytes(payload[offset:]), w, h, rle
        )
        if idx_rows is None:
            return None
        out = bytearray()
        for row in range(h):
            src = idx_rows[h - 1 - row]  # bottom-up storage
            for x in range(w):
                if src[x] >= len(palette):
                    return None
                out += palette[src[x]]
        return {"width": w, "height": h, "channels": 3,
                "pixels": bytes(out)}
    out = bytearray()
    for row in range(h):
        src_row = row if h_raw < 0 else h - 1 - row
        base = offset + src_row * row_bytes
        if base + row_bytes > len(payload):
            return None
        line = payload[base:base + row_bytes]
        if bpp == 24:
            for x in range(w):
                out += bytes((line[3 * x + 2], line[3 * x + 1],
                              line[3 * x]))
        elif bpp == 32:
            for x in range(w):
                out += bytes((line[4 * x + 2], line[4 * x + 1],
                              line[4 * x]))
        else:  # palettized, MSB-first sub-byte indices
            per_byte = 8 // bpp
            mask = (1 << bpp) - 1
            for x in range(w):
                b = line[x // per_byte]
                shift = 8 - bpp * (x % per_byte + 1)
                idx = (b >> shift) & mask
                if idx >= len(palette):
                    return None
                out += palette[idx]
    return {"width": w, "height": h, "channels": 3,
            "pixels": bytes(out)}


def _ico_entries(data: bytes):
    """Parse the ICONDIR + entry table of an ICO/CUR payload (the
    public favicon format): returns (kind, [(off, size)]) with every
    entry's byte range bounds-checked, or None."""
    n = len(data)
    if (n < 22 or data[0:2] != b"\x00\x00"
            or data[2:4] not in (b"\x01\x00", b"\x02\x00")):
        return None
    count = int.from_bytes(data[4:6], "little")
    if count == 0 or 6 + 16 * count > n:
        return None
    entries = []
    for k in range(count):
        e = 6 + 16 * k
        size = int.from_bytes(data[e + 8:e + 12], "little")
        off = int.from_bytes(data[e + 12:e + 16], "little")
        if size < 16 or off < 6 + 16 * count or off + size > n:
            return None
        entries.append((off, size))
    return ("ico" if data[2] == 1 else "cur"), entries


def _ico_entry_dims(data: bytes, off: int, size: int):
    """Dims of one ICO directory entry's embedded image: a full PNG
    (delegated to the CRC-verified ``_decode_png``) or a headerless
    DIB whose biHeight doubles the visual height (XOR plane + 1-bit
    AND mask).  Returns (w, h, is_png) or None."""
    sl = data[off:off + size]
    if sl[:8] == PNG_MAGIC:
        m = _decode_png(sl)
        if m is None:
            return None
        return m["width"], m["height"], True
    if len(sl) < 40:
        return None
    hdr_size = int.from_bytes(sl[0:4], "little")
    if hdr_size < 40 or hdr_size > len(sl):
        return None
    w = int.from_bytes(sl[4:8], "little", signed=True)
    dh = int.from_bytes(sl[8:12], "little", signed=True)
    planes = int.from_bytes(sl[12:14], "little")
    bpp = int.from_bytes(sl[14:16], "little")
    if w <= 0 or dh <= 0 or dh % 2 or planes != 1:
        return None
    if bpp not in (1, 4, 8, 16, 24, 32):
        return None
    if int.from_bytes(sl[16:20], "little") != 0:  # BI_RGB only
        return None
    h = dh // 2
    clr_used = int.from_bytes(sl[32:36], "little")
    pal = clr_used if clr_used else (1 << bpp if bpp <= 8 else 0)
    row = ((w * bpp + 31) // 32) * 4
    mask_row = ((w + 31) // 32) * 4
    # the XOR plane and the 1-bit AND mask must both be present
    if hdr_size + pal * 4 + (row + mask_row) * h > len(sl):
        return None
    return w, h, False


def _decode_ico(payload: bytes) -> dict | None:
    """REAL ICO/CUR (favicon) header decode: ICONDIR walk with every
    entry's embedded image structurally validated (PNG via the
    CRC-verified IHDR path, DIB via the doubled-height
    BITMAPINFOHEADER); reported dims are the LARGEST entry's — the
    one a pipeline thumbnails.  None on anything malformed; never
    raises."""
    parsed = _ico_entries(payload)
    if parsed is None:
        return None
    kind, entries = parsed
    best = None
    for off, size in entries:
        d = _ico_entry_dims(payload, off, size)
        if d is None:  # every entry must be structurally valid
            return None
        w, h, _ = d
        if best is None or w * h > best[0] * best[1]:
            best = (w, h)
    return {"format": kind, "width": best[0], "height": best[1]}


def decode_ico_pixels(payload: bytes | None) -> dict | None:
    """REAL ICO/CUR pixel decode of the largest entry: PNG entries
    delegate to ``decode_png_pixels``; DIB entries re-wrap the XOR
    plane as a standalone BMP (un-doubling biHeight, recomputing the
    data offset past the palette) and decode through
    ``decode_bmp_pixels`` — the same re-wrap pattern the AVI/GIF
    frame extractors use.  The 1-bit AND mask (transparency) is
    dropped: output is opaque RGB, same shape as every pixel decoder
    here.  Never raises."""
    if not payload:
        return None
    data = bytes(payload)
    parsed = _ico_entries(data)
    if parsed is None:
        return None
    _, entries = parsed
    best = None
    for off, size in entries:
        d = _ico_entry_dims(data, off, size)
        if d is None:
            return None
        w, h, is_png = d
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, off, size, is_png)
    w, h, off, size, is_png = best
    sl = data[off:off + size]
    if is_png:
        return decode_png_pixels(sl)
    hdr_size = int.from_bytes(sl[0:4], "little")
    bpp = int.from_bytes(sl[14:16], "little")
    compression = int.from_bytes(sl[16:20], "little")
    if compression != 0:  # ICO DIBs are BI_RGB in practice
        return None
    clr_used = int.from_bytes(sl[32:36], "little")
    pal = clr_used if clr_used else (1 << bpp if bpp <= 8 else 0)
    pix_off = hdr_size + pal * 4
    row = ((w * bpp + 31) // 32) * 4
    xor_end = pix_off + row * h  # AND mask (after) is dropped
    if xor_end > len(sl):
        return None
    hdr = bytearray(sl[:hdr_size])
    hdr[8:12] = h.to_bytes(4, "little", signed=True)  # un-double
    bmp = (b"BM" + (14 + xor_end).to_bytes(4, "little") + bytes(4)
           + (14 + pix_off).to_bytes(4, "little")
           + bytes(hdr) + sl[hdr_size:xor_end])
    return decode_bmp_pixels(bmp)


def _decode_webp(payload: bytes) -> dict | None:
    """REAL WebP container header decode (public RIFF-based spec):
    the chunk walk must tile the declared RIFF size, and dimensions
    come from whichever image-bearing chunk leads — VP8X (extended:
    24-bit LE canvas width/height, minus-one coded), 'VP8 ' (lossy:
    keyframe tag + the 9D 01 2A start code + 14-bit LE dims), or VP8L
    (lossless: 0x2F signature + 14-bit packed dims, version bits must
    be 0).  Metadata only — VP8 entropy decode needs a codec library;
    the pixel stance matches JPEG-before-round-5.  None on anything
    malformed; never raises."""
    data = bytes(payload)
    n = len(data)
    if n < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return None
    riff_size = int.from_bytes(data[4:8], "little")
    # file = 8-byte RIFF header + declared body (+1 odd-size pad)
    if 8 + riff_size not in (n, n - 1) or riff_size < 4:
        return None
    try:
        # materialize first: the whole chunk table must tile the
        # declared body even though only the leading chunk is read
        for fourcc, b0, b1 in list(
            _riff_chunks(data, 12, 8 + riff_size)
        ):
            if fourcc == b"VP8X":
                if b1 - b0 < 10:
                    return None
                w = int.from_bytes(data[b0 + 4:b0 + 7], "little") + 1
                h = int.from_bytes(data[b0 + 7:b0 + 10], "little") + 1
                return {"format": "webp", "width": w, "height": h}
            if fourcc == b"VP8 ":
                if b1 - b0 < 10:
                    return None
                if data[b0] & 1:  # not a keyframe
                    return None
                if data[b0 + 3:b0 + 6] != b"\x9d\x01\x2a":
                    return None
                w = int.from_bytes(data[b0 + 6:b0 + 8],
                                   "little") & 0x3FFF
                h = int.from_bytes(data[b0 + 8:b0 + 10],
                                   "little") & 0x3FFF
                if not w or not h:
                    return None
                return {"format": "webp", "width": w, "height": h}
            if fourcc == b"VP8L":
                if b1 - b0 < 5 or data[b0] != 0x2F:
                    return None
                bits = int.from_bytes(data[b0 + 1:b0 + 5], "little")
                if bits >> 29:  # version must be 0
                    return None
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                return {"format": "webp", "width": w, "height": h}
            return None  # first chunk must be image-bearing
    except (ValueError, IndexError, struct.error, OverflowError):
        return None
    return None


_HEIF_BRANDS = {
    b"avif": "avif", b"avis": "avif",
    b"heic": "heic", b"heix": "heic",
    b"mif1": "heif", b"msf1": "heif",
}


def _decode_heif(payload: bytes) -> dict | None:
    """REAL HEIF/AVIF still-image header decode (public ISO-BMFF
    structure, ISO 23008-12): the top-level box walk must tile the
    payload, the ftyp major (or a compatible) brand must be a known
    HEIF family, and dimensions come from the primary item's ispe
    (image spatial extents) property — resolved through pitm (primary
    item id) + ipma (item→property associations, 7- or 15-bit
    indices into ipco's 1-based child list) when both are present,
    else the first ispe.  Metadata only — HEVC/AV1 payload decode
    needs a codec library.  None on anything malformed; never
    raises."""
    data = bytes(payload)
    n = len(data)
    if n < 16 or data[4:8] != b"ftyp":
        return None
    try:
        fmt = None
        meta = None
        for btype, b0, b1 in _mp4_boxes(data, 0, n):
            if btype == b"ftyp":
                if b1 - b0 < 8:
                    return None
                brands = [data[b0:b0 + 4]] + [
                    data[k:k + 4] for k in range(b0 + 8, b1 - 3, 4)
                ]
                for br in brands:
                    if br in _HEIF_BRANDS:
                        fmt = _HEIF_BRANDS[br]
                        break
                if fmt is None:
                    return None
            elif btype == b"meta":
                meta = (b0, b1)
        if fmt is None or meta is None:
            return None
        # meta is a FULL box: 4 version/flags bytes precede children
        if meta[1] - meta[0] < 4:
            return None
        pitm_id = None
        iprp = None
        for btype, b0, b1 in _mp4_boxes(data, meta[0] + 4, meta[1]):
            if btype == b"pitm":
                if b1 - b0 < 6:
                    return None
                ver = data[b0]
                if ver == 0:
                    pitm_id = int.from_bytes(data[b0 + 4:b0 + 6],
                                             "big")
                elif b1 - b0 >= 8:
                    pitm_id = int.from_bytes(data[b0 + 4:b0 + 8],
                                             "big")
            elif btype == b"iprp":
                iprp = (b0, b1)
        if iprp is None:
            return None
        props: list[tuple[bytes, int, int]] = []
        ipma = None
        for btype, b0, b1 in _mp4_boxes(data, *iprp):
            if btype == b"ipco":
                props = list(_mp4_boxes(data, b0, b1))
            elif btype == b"ipma":
                ipma = (b0, b1)

        def ispe_dims(b0: int, b1: int) -> dict | None:
            if b1 - b0 < 12:
                return None
            w = int.from_bytes(data[b0 + 4:b0 + 8], "big")
            h = int.from_bytes(data[b0 + 8:b0 + 12], "big")
            if not w or not h:
                return None
            return {"format": fmt, "width": w, "height": h}

        if pitm_id is not None and ipma is not None:
            b0, b1 = ipma
            if b1 - b0 < 8:
                return None
            ver, flags = data[b0], int.from_bytes(data[b0 + 1:b0 + 4],
                                                  "big")
            cnt = int.from_bytes(data[b0 + 4:b0 + 8], "big")
            at = b0 + 8
            for _ in range(cnt):
                id_w = 4 if ver >= 1 else 2
                if at + id_w + 1 > b1:
                    return None
                item = int.from_bytes(data[at:at + id_w], "big")
                at += id_w
                n_assoc = data[at]
                at += 1
                for _ in range(n_assoc):
                    if flags & 1:
                        if at + 2 > b1:
                            return None
                        idx = int.from_bytes(data[at:at + 2],
                                             "big") & 0x7FFF
                        at += 2
                    else:
                        if at + 1 > b1:
                            return None
                        idx = data[at] & 0x7F
                        at += 1
                    if item != pitm_id or not idx or idx > len(props):
                        continue
                    ptype, p0, p1 = props[idx - 1]
                    if ptype == b"ispe":
                        return ispe_dims(p0, p1)
        for ptype, p0, p1 in props:
            if ptype == b"ispe":
                return ispe_dims(p0, p1)
        return None
    except (ValueError, IndexError, struct.error, OverflowError):
        return None


def decode_image(payload: bytes | None) -> dict | None:
    """REAL pure-Python image header decoder for the eight formats
    whose structure needs no codec library: netpbm binary (P6 PPM / P5
    PGM, whitespace-and-comment-tolerant header, pixel-length
    validated), BMP (BITMAPINFOHEADER), PNG (IHDR chunk, CRC-verified,
    IDAT-present — ``_decode_png``), JPEG (marker-segment walk to
    SOF — ``_decode_jpeg``), GIF (logical screen descriptor +
    block walk to the trailer — ``_decode_gif``), TIFF (both byte
    orders, IFD entry walk — ``_decode_tiff``), WebP (RIFF chunk walk
    to VP8X / VP8 / VP8L — ``_decode_webp``), HEIF/AVIF (ISO-BMFF
    box walk to the primary item's ispe — ``_decode_heif``), and
    ICO/CUR favicons (ICONDIR walk, largest entry's PNG or
    doubled-height DIB — ``_decode_ico``).  Returns
    ``{"format", "width", "height"}``
    or None if the payload is not a valid image in any of them.
    Pixel decoding and the remaining media types (audio codecs beyond
    WAV — see ``decode_audio`` — and video) stay behind the deliberate
    stubs — this container has no codec libraries — but the decode
    CONTRACT is exercised for real here: a truncated pixel array, a
    corrupt CRC, a broken marker walk, or nonsense dimensions must
    fail.
    """
    if not payload:
        return None
    if bytes(payload[:8]) == PNG_MAGIC:
        return _decode_png(payload)
    if bytes(payload[:2]) == b"\xff\xd8":
        return _decode_jpeg(payload)
    if bytes(payload[:6]) in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if bytes(payload[:4]) in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    if bytes(payload[:4]) == b"RIFF" and bytes(payload[8:12]) == b"WEBP":
        return _decode_webp(payload)
    if bytes(payload[4:8]) == b"ftyp":
        return _decode_heif(payload)
    if bytes(payload[:4]) in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        return _decode_ico(bytes(payload))
    magic = bytes(payload[:2])
    if magic in (b"P6", b"P5"):
        toks: list[bytes] = []
        i, n = 2, len(payload)
        while len(toks) < 3 and i < n:
            c = payload[i:i + 1]
            if c == b"#":  # comment runs to end of line
                while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while (
                    j < n
                    and not payload[j:j + 1].isspace()
                    and payload[j:j + 1] != b"#"
                ):
                    j += 1
                toks.append(bytes(payload[i:j]))
                i = j
        if len(toks) < 3 or i >= n:
            return None
        try:
            w, h, maxval = (int(t) for t in toks)
        except ValueError:
            return None
        if w <= 0 or h <= 0 or not 0 < maxval < 65536:
            return None
        per_px = (3 if magic == b"P6" else 1) * (2 if maxval > 255 else 1)
        # exactly one whitespace byte separates maxval from pixel data
        if n - (i + 1) < w * h * per_px:
            return None
        return {
            "format": "ppm" if magic == b"P6" else "pgm",
            "width": w,
            "height": h,
        }
    if magic == b"BM" and len(payload) >= 54:
        return _decode_bmp(payload)
    return None


def _decode_bmp(payload: bytes) -> dict | None:
    """BMP (BITMAPINFOHEADER) structural validation + dimensions —
    without it any >=54-byte text that happens to start with "BM"
    (e.g. "BMW dealers ...") would "decode", since ASCII bytes at the
    dimension offsets form positive ints.  planes is REQUIRED to be 1
    by the spec (two ASCII chars can never be 0x0001), bpp must be a
    legal depth, and the pixel array implied by (w, h, bpp) must
    actually be present past the declared data offset."""
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    if w <= 0 or h == 0:  # negative h = top-down BMP, legal
        return None
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    offset = int.from_bytes(payload[10:14], "little")
    if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32):
        return None
    if not 54 <= offset <= len(payload):
        return None
    if compression in (1, 2) or compression in _MSV1_FOURCCS:
        # RLE / MS Video 1: data is variable-length, just
        if offset >= len(payload):  # require SOME pixel bytes
            return None
    else:
        row_bytes = ((w * bpp + 31) // 32) * 4
        if len(payload) - offset < row_bytes * abs(h):
            return None
    return {"format": "bmp", "width": w, "height": abs(h)}


def _decode_flac(payload: bytes) -> dict | None:
    """FLAC STREAMINFO decode: "fLaC" magic, then the metadata-block
    walk (1-byte last-flag|type + 3-byte big-endian length each); the
    FIRST block must be a 34-byte STREAMINFO (spec requirement) whose
    bit-packed fields give sample rate (20 bits), channels-1 (3),
    bits-per-sample-1 (5) and total samples (36).  The walk must reach
    the last-flag block inside the payload and audio frames must
    follow (first frame's 14-bit sync code 0b11111111111110) — magic
    plus junk fails, same contract as the other format walks."""
    n = len(payload)
    if n < 42 or bytes(payload[:4]) != b"fLaC":
        return None
    if payload[4] & 0x7F != 0:  # first block must be STREAMINFO
        return None
    if int.from_bytes(payload[5:8], "big") != 34:
        return None
    # sample rate 20 bits, channels-1 3 bits, bps-1 5 bits, total 36
    # bits, packed big-endian starting at STREAMINFO byte 10
    packed = int.from_bytes(payload[18:26], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0 or rate > 655350:
        return None
    i, last = 4, False
    while not last:
        if i + 4 > n:
            return None  # truncated metadata table
        last = bool(payload[i] & 0x80)
        if payload[i] & 0x7F > 6:
            return None  # invalid block type (127 is forbidden)
        i += 4 + int.from_bytes(payload[i + 1:i + 4], "big")
    if i + 2 > n or payload[i] != 0xFF or payload[i + 1] & 0xFC != 0xF8:
        return None  # no audio frame after the metadata table
    return {
        "format": "flac",
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": total,
        "duration_ms": total * 1000 // rate,
    }


# MPEG audio bitrate tables, kbps (ISO 11172-3 / 13818-3): keyed by
# (is_mpeg1, layer); index 0 (free) and 15 (bad) are rejected
_MP3_BITRATES = {
    (True, 1): (0, 32, 64, 96, 128, 160, 192, 224,
                256, 288, 320, 352, 384, 416, 448),
    (True, 2): (0, 32, 48, 56, 64, 80, 96, 112,
                128, 160, 192, 224, 256, 320, 384),
    (True, 3): (0, 32, 40, 48, 56, 64, 80, 96,
                112, 128, 160, 192, 224, 256, 320),
    (False, 1): (0, 32, 48, 56, 64, 80, 96, 112,
                 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (0, 8, 16, 24, 32, 40, 48, 56,
                 64, 80, 96, 112, 128, 144, 160),
}
_MP3_BITRATES[(False, 3)] = _MP3_BITRATES[(False, 2)]
_MP3_RATES = {  # by version bits (0 = MPEG2.5, 2 = MPEG2, 3 = MPEG1)
    0: (11025, 12000, 8000),
    2: (22050, 24000, 16000),
    3: (44100, 48000, 32000),
}


def _decode_mp3(payload: bytes) -> dict | None:
    """MPEG-audio (MP3) frame-HEADER walk — entropy decode needs a
    codec library, but the frame table is plain structure (ISO
    11172-3 §2.4.1.3): skip an optional ID3v2 tag (syncsafe size),
    then walk sync-aligned frame headers, each giving version / layer
    / bitrate / sample-rate / padding and therefore its own byte
    length; frames must share version, layer, sample rate and channel
    mode, tile the payload exactly (an optional trailing 128-byte
    ID3v1 'TAG' allowed), and number at least two.  Duration comes
    from samples-per-frame × frame count.  Returns the
    ``decode_audio`` dict shape (``bits_per_sample`` None — not
    defined for entropy-coded audio); never raises."""
    n = len(payload)
    i = 0
    if bytes(payload[:3]) == b"ID3" and n >= 10:
        size = 0
        for k in range(6, 10):
            if payload[k] & 0x80:  # syncsafe bytes keep the top bit 0
                return None
            size = (size << 7) | payload[k]
        i = 10 + size + (10 if payload[5] & 0x10 else 0)
    spec = None  # (version_bits, layer, rate, channels)
    frames = samples = 0
    while i < n:
        if n - i == 128 and bytes(payload[i:i + 3]) == b"TAG":
            break  # trailing ID3v1 tag
        if i + 4 > n or payload[i] != 0xFF or payload[i + 1] & 0xE0 != 0xE0:
            return None
        b1, b2, b3 = payload[i + 1], payload[i + 2], payload[i + 3]
        ver = (b1 >> 3) & 3
        layer = 4 - ((b1 >> 1) & 3)  # bits 3/2/1 = Layer I/II/III
        br_idx, rate_idx = b2 >> 4, (b2 >> 2) & 3
        if ver == 1 or layer == 4 or br_idx in (0, 15) or rate_idx == 3:
            return None
        rate = _MP3_RATES[ver][rate_idx]
        mpeg1 = ver == 3
        bitrate = _MP3_BITRATES[(mpeg1, layer)][br_idx] * 1000
        channels = 1 if (b3 >> 6) & 3 == 3 else 2
        if spec is None:
            spec = (ver, layer, rate, channels)
        elif spec != (ver, layer, rate, channels):
            return None  # frames must agree (no mid-stream switches)
        padding = (b2 >> 1) & 1
        if layer == 1:
            spf = 384
            flen = (12 * bitrate // rate + padding) * 4
        else:
            spf = 1152 if layer == 2 or mpeg1 else 576
            flen = spf // 8 * bitrate // rate + padding
        if flen <= 4 or i + flen > n:
            return None
        frames += 1
        samples += spf
        i += flen
    if frames < 2 or spec is None:
        return None
    _, _, rate, channels = spec
    return {
        "format": "mp3",
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": None,
        "n_samples": samples,
        "duration_ms": samples * 1000 // rate,
    }


def _decode_ogg(payload: bytes) -> dict | None:
    """OGG container walk (RFC 3533) + Vorbis/Opus identification
    header — the page table is plain structure: every page is "OggS"
    + version 0 + header-type + 64-bit granule position + serial /
    sequence / checksum + a segment table sizing the page body; pages
    must tile the payload exactly, the first page must carry the
    beginning-of-stream flag and contain the codec's identification
    header ("\\x01vorbis" — channels u8 + rate u32le; or "OpusHead" —
    channels u8 + pre-skip u16le, granules always at 48 kHz).  Total
    samples = the last finished-packet granule position (minus
    pre-skip for Opus).  Returns the ``decode_audio`` dict shape
    (``bits_per_sample`` None); never raises."""
    n = len(payload)
    i, first = 0, True
    fmt = channels = rate = preskip = None
    last_granule = 0
    while i < n:
        if i + 27 > n or bytes(payload[i:i + 4]) != b"OggS":
            return None
        if payload[i + 4] != 0:  # stream structure version
            return None
        header_type = payload[i + 5]
        granule = int.from_bytes(
            payload[i + 6:i + 14], "little", signed=True
        )
        n_segs = payload[i + 26]
        if i + 27 + n_segs > n:
            return None
        body_len = sum(payload[i + 27:i + 27 + n_segs])
        body_at = i + 27 + n_segs
        if body_at + body_len > n:
            return None
        if first:
            if not header_type & 0x02:  # BOS flag required
                return None
            body = bytes(payload[body_at:body_at + body_len])
            if body[:7] == b"\x01vorbis" and len(body) >= 30:
                if int.from_bytes(body[7:11], "little") != 0:
                    return None  # vorbis_version must be 0
                fmt = "vorbis"
                channels = body[11]
                rate = int.from_bytes(body[12:16], "little")
            elif body[:8] == b"OpusHead" and len(body) >= 19:
                fmt = "opus"
                channels = body[9]
                preskip = int.from_bytes(body[10:12], "little")
                rate = 48000  # granule positions are always 48 kHz
            else:
                return None
            if not channels or not rate:
                return None
            first = False
        if granule >= 0:  # -1 = no packet finishes on this page
            last_granule = granule
        i = body_at + body_len
    if fmt is None:
        return None
    total = last_granule - (preskip or 0)
    total = max(total, 0)
    return {
        "format": fmt,
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": None,
        "n_samples": total,
        "duration_ms": total * 1000 // rate,
    }


def decode_audio(payload: bytes | None) -> dict | None:
    """REAL pure-Python audio header decoder for WAV (RIFF/WAVE — walk
    the RIFF chunk table, read the fmt chunk (PCM or IEEE-float
    format tag, channels, sample rate, bits/sample) and size the data
    chunk into a sample count + duration), FLAC (STREAMINFO metadata
    block — ``_decode_flac``), MP3 (frame-header walk —
    ``_decode_mp3``), OGG Vorbis/Opus (page walk + identification
    header — ``_decode_ogg``) and AIFF/AIFF-C (big-endian IFF
    FORM/COMM/SSND walk with the 80-bit extended sample rate —
    ``_decode_aiff``).  Returns ``{"format", "channels",
    "sample_rate", "bits_per_sample", "n_samples", "duration_ms"}``
    or None (``bits_per_sample`` is None for the entropy-coded
    formats).  WAV accepts PCM/IEEE-float plus the codec-free
    compressed tags (G.711 mu-law/A-law, IMA/MS ADPCM — sized from
    the block layout and the `fact` frame count); SAMPLE decode for
    the entropy-coded formats (MP3/OGG) stays a labeled stub — no
    codec libraries in this container — but their container
    structure, codec parameters and duration are real."""
    if not payload or len(payload) < 42:
        return None
    if bytes(payload[:4]) == b"fLaC":
        return _decode_flac(payload)
    if bytes(payload[:4]) == b"OggS":
        return _decode_ogg(payload)
    if bytes(payload[:4]) == b"FORM":
        return _decode_aiff(bytes(payload))
    if (
        bytes(payload[:3]) == b"ID3"
        or (payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0)
    ):
        return _decode_mp3(payload)
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        return None
    n = len(payload)
    i, fmt, data_size, fact = 12, None, None, None
    while i + 8 <= n:
        cid = bytes(payload[i:i + 4])
        csize = int.from_bytes(payload[i + 4:i + 8], "little")
        if cid == b"fmt " and csize >= 16 and i + 8 + 16 <= n:
            tag = int.from_bytes(payload[i + 8:i + 10], "little")
            channels = int.from_bytes(payload[i + 10:i + 12], "little")
            rate = int.from_bytes(payload[i + 12:i + 16], "little")
            balign = int.from_bytes(payload[i + 20:i + 22], "little")
            bits = int.from_bytes(payload[i + 22:i + 24], "little")
            tag = _wav_resolve_tag(payload, i, csize, tag)
            # 1 = PCM, 3 = IEEE float, 6/7 = G.711 A-law/mu-law,
            # 2/0x11 = MS/IMA ADPCM; anything else needs a codec
            if tag not in (1, 2, 3, 6, 7, 0x11):
                return None
            if channels == 0 or rate == 0:
                return None
            if tag in (1, 3) and bits not in (8, 16, 24, 32, 64):
                return None
            if tag in (6, 7) and bits != 8:
                return None
            if tag in (2, 0x11) and bits != 4:
                return None
            fmt = (tag, channels, rate, bits, balign)
        elif cid == b"fact" and csize >= 4 and i + 12 <= n:
            fact = int.from_bytes(payload[i + 8:i + 12], "little")
        elif cid == b"data":
            # the data chunk's declared size must actually be present
            # (truncated payloads fail), up to one RIFF pad byte
            if i + 8 + csize > n:
                return None
            data_size = csize
        i += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    tag, channels, rate, bits, balign = fmt
    if tag in (1, 3):
        frame_bytes = channels * (bits // 8)
        if frame_bytes == 0 or data_size % frame_bytes != 0:
            return None
        n_samples = data_size // frame_bytes
    elif tag in (6, 7):  # G.711: one byte per sample per channel
        if data_size % channels != 0:
            return None
        n_samples = data_size // channels
    else:  # block-structured ADPCM: capacity from the block layout
        hdr = 4 * channels if tag == 0x11 else 7 * channels
        if balign <= hdr or data_size % balign != 0:
            return None
        if tag == 0x11:
            # IMA data groups are 4 bytes per channel (8 nibbles)
            if (balign - hdr) % (4 * channels) != 0:
                return None
            spb = 1 + (balign - hdr) * 2 // channels
        else:
            spb = 2 + (balign - hdr) * 2 // channels
        n_samples = (data_size // balign) * spb
        # compressed WAV carries the true frame count in `fact`; the
        # last block may be logically short of its capacity
        if fact is not None and 0 < fact <= n_samples:
            n_samples = fact
    return {
        "format": "wav",
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
    }


# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail (RFC 2361 / mmreg.h):
# bytes 2-16 of the GUID are fixed; bytes 0-2 carry the real tag
_WAVE_GUID_TAIL = (
    b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def _ieee754_extended(b: bytes) -> float | None:
    """Decode the 80-bit IEEE 754 extended-precision float AIFF uses
    for its COMM sampleRate (sign 1 / exponent 15 / explicit-integer
    mantissa 64): value = mantissa × 2^(exp − 16383 − 63).  None for
    inf/NaN or negative rates."""
    if len(b) != 10:
        return None
    if b[0] & 0x80:
        return None
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0x7FFF:  # inf / NaN
        return None
    if exp == 0 and mant == 0:
        return 0.0
    if exp > 16383 + 63:  # would overflow float (and no real rate)
        return None
    return mant * 2.0 ** (exp - 16383 - 63)


# AIFF-C compression fourccs this engine decodes codec-free →
# bytes per stored sample point ("NONE"-keyed entries use the COMM
# sampleSize instead); perceptual AIFC codecs (ima4, QDM2, …) are
# rejected to the undecodable path like non-PCM WAV tags
_AIFC_CODEC_BYTES = {
    b"NONE": None, b"sowt": 2, b"fl32": 4, b"FL32": 4,
    b"fl64": 8, b"FL64": 8,
    b"ulaw": 1, b"ULAW": 1, b"alaw": 1, b"ALAW": 1,
}


def _aiff_layout(payload: bytes) -> tuple | None:
    """Shared IFF walk for the AIFF/AIFF-C metadata and sample
    decoders: validate the FORM container (big-endian sizes,
    word-aligned chunks, declared FORM size covering the chunk table),
    read COMM (channels, numSampleFrames, sampleSize, 80-bit extended
    sampleRate, AIFC compression fourcc) and locate SSND's sample
    bytes (honoring its offset field).  Returns (fmt, channels,
    n_frames, bits, rate, codec, data) or None; never raises (the
    caller slices only validated ranges)."""
    data = bytes(payload)
    n = len(data)
    if n < 20 or data[:4] != b"FORM":
        return None
    form_size = int.from_bytes(data[4:8], "big")
    ftype = data[8:12]
    if ftype not in (b"AIFF", b"AIFC"):
        return None
    # FORM size counts formType + chunks; allow one trailing pad byte
    if 8 + form_size not in (n, n - 1) or form_size < 4:
        return None
    end = 8 + form_size
    comm = None
    ssnd = None
    i = 12
    while i < end:
        if i + 8 > end:
            return None
        cid = data[i:i + 4]
        csize = int.from_bytes(data[i + 4:i + 8], "big")
        body = i + 8
        if body + csize > end:
            return None
        if cid == b"COMM":
            comm = (body, body + csize)
        elif cid == b"SSND":
            ssnd = (body, body + csize)
        i = body + csize + (csize & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        return None
    b0, b1 = comm
    if b1 - b0 < 18:
        return None
    channels = int.from_bytes(data[b0:b0 + 2], "big")
    n_frames = int.from_bytes(data[b0 + 2:b0 + 6], "big")
    bits = int.from_bytes(data[b0 + 6:b0 + 8], "big")
    rate_f = _ieee754_extended(data[b0 + 8:b0 + 18])
    if channels == 0 or rate_f is None or not 0 < rate_f < 1e7:
        return None
    rate = int(round(rate_f))
    if rate == 0:
        return None
    codec = b"NONE"
    if ftype == b"AIFC":
        if b1 - b0 < 22:
            return None
        codec = data[b0 + 18:b0 + 22]
        if codec not in _AIFC_CODEC_BYTES:
            return None
    per_point = _AIFC_CODEC_BYTES[codec]
    if per_point is None:  # NONE: stored size from COMM sampleSize
        if not 1 <= bits <= 32:
            return None
        per_point = (bits + 7) // 8
    elif codec == b"sowt" and bits != 16:
        return None
    s0, s1 = ssnd
    if s1 - s0 < 8:
        return None
    offset = int.from_bytes(data[s0:s0 + 4], "big")
    need = n_frames * channels * per_point
    if s0 + 8 + offset + need > s1:
        return None
    fmt = "aiff" if ftype == b"AIFF" else "aifc"
    sound = data[s0 + 8 + offset:s0 + 8 + offset + need]
    return fmt, channels, n_frames, bits, rate, codec, sound


def _decode_aiff(payload: bytes) -> dict | None:
    """REAL AIFF / AIFF-C header decode (public IFF-85-based Apple
    spec): FORM/COMM/SSND walk via ``_aiff_layout`` — big-endian
    chunk sizes, 80-bit extended sample rate, AIFC compression
    fourcc.  Same return shape as the WAV branch of
    ``decode_audio``."""
    layout = _aiff_layout(payload)
    if layout is None:
        return None
    fmt, channels, n_frames, bits, rate, _, _ = layout
    return {
        "format": fmt,
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // rate,
    }


def decode_aiff_samples(payload: bytes | None) -> dict | None:
    """REAL AIFF / AIFF-C sample decode, codec-free per spec: NONE =
    big-endian SIGNED integer PCM at 8/16/24/32 stored bits (AIFF
    8-bit is signed, unlike WAV's unsigned 8), sowt = little-endian
    16-bit (the QuickTime byte-swapped variant), fl32/fl64 = big-
    endian IEEE floats, ulaw/alaw = the shared G.711 tables.  Output
    shape matches ``decode_wav_samples`` — normalized interleaved
    floats where integer reconstructions satisfy the round(s·32768)
    exactness q30-style oracles rely on.  Never raises."""
    if not payload:
        return None
    layout = _aiff_layout(bytes(payload))
    if layout is None:
        return None
    _, channels, n_frames, bits, rate, codec, data = layout
    if codec in (b"ulaw", b"ULAW", b"alaw", b"ALAW"):
        table = _ULAW_LINEAR if codec in (b"ulaw", b"ULAW") else _ALAW_LINEAR
        samples = [table[b] / 32768.0 for b in data]
    elif codec == b"sowt":
        samples = [
            int.from_bytes(data[j:j + 2], "little", signed=True)
            / 32768.0
            for j in range(0, len(data), 2)
        ]
    elif codec in (b"fl32", b"FL32"):
        samples = list(struct.unpack(f">{len(data) // 4}f", data))
    elif codec in (b"fl64", b"FL64"):
        samples = list(struct.unpack(f">{len(data) // 8}d", data))
    else:  # NONE: big-endian signed PCM, stored size from sampleSize
        step = (bits + 7) // 8
        if step not in (1, 2, 3, 4):
            return None
        half = 1 << (step * 8 - 1)
        samples = [
            int.from_bytes(data[j:j + step], "big", signed=True) / half
            for j in range(0, len(data), step)
        ]
    return {
        "channels": channels,
        "sample_rate": rate,
        "samples": samples,
    }


def _wav_resolve_tag(payload, i: int, csize: int, tag: int) -> int:
    """Resolve WAVE_FORMAT_EXTENSIBLE (0xFFFE, the modern default for
    multichannel/high-bit WAVs) to the real format tag carried in the
    SubFormat GUID's first two bytes; other tags pass through.
    Returns -1 for a malformed extensible header."""
    if tag != 0xFFFE:
        return tag
    if csize < 40 or i + 48 > len(payload):
        return -1
    sub = bytes(payload[i + 32:i + 48])
    if sub[2:] != _WAVE_GUID_TAIL:
        return -1
    return int.from_bytes(sub[:2], "little")


def audio_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, is_decodable, format, channels, sample_rate,
    bits_per_sample, n_samples, duration_ms) via Arrow-batched
    ``decode_audio`` — real for WAV, null for codec formats."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("is_decodable", BooleanType()),
            StructField("format", StringType()),
            StructField("channels", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("bits_per_sample", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("duration_ms", LongType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(decode_audio)
            get = lambda k: metas.map(  # noqa: E731
                lambda m: m[k] if m else None
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "is_decodable": metas.map(lambda m: m is not None),
                    "format": get("format"),
                    "channels": get("channels").astype("Int32"),
                    "sample_rate": get("sample_rate").astype("Int32"),
                    "bits_per_sample": get("bits_per_sample").astype(
                        "Int32"
                    ),
                    "n_samples": get("n_samples").astype("Int64"),
                    "duration_ms": get("duration_ms").astype("Int64"),
                }
            )

    return df.mapInPandas(decode_batches, schema)


def _g711_tables() -> tuple[tuple, tuple]:
    """Expand the ITU-T G.711 mu-law and A-law code→linear tables
    (16-bit domain, Sun g711.c-compatible: mu-law max ±32124, A-law
    max ±32256).  Both laws decode per-byte; computing the 256-entry
    tables once keeps the per-sample path a list index."""
    ulaw, alaw = [], []
    for c in range(256):
        u = ~c & 0xFF  # mu-law bytes are transmitted complemented
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
        ulaw.append(0x84 - t if u & 0x80 else t - 0x84)
        a = c ^ 0x55  # A-law bytes are transmitted with even bits flipped
        seg, m = (a >> 4) & 7, a & 0x0F
        if seg == 0:
            v = (m << 4) + 8
        elif seg == 1:
            v = (m << 4) + 0x108
        else:
            v = ((m << 4) + 0x108) << (seg - 1)
        alaw.append(v if a & 0x80 else -v)
    return tuple(ulaw), tuple(alaw)


_ULAW_LINEAR, _ALAW_LINEAR = _g711_tables()

# IMA/DVI ADPCM quantizer step table (89 entries) + index adjustment,
# per the IMA Digital Audio Pack recommended practice
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)

# MS ADPCM predictor coefficient pairs (x256) + idelta adaptation
# table, per the WAVE_FORMAT_ADPCM spec (Microsoft multimedia
# standards update / mmreg.h)
_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def _ima_adpcm_samples(
    data: bytes, ch: int, balign: int, n_samples: int
) -> list | None:
    """Decode IMA/DVI ADPCM (WAV format tag 0x11) blocks to normalized
    interleaved floats.  Each block carries a per-channel header
    (int16 predictor = the block's first output sample, uint8 step
    index, reserved byte) followed by 4-byte-per-channel groups of
    8 nibbles; low nibble first within each byte.  Truncates to
    ``n_samples`` frames (the `fact` count).  Returns None on a
    header step index past the table."""
    out: list = []
    remaining = n_samples
    for b in range(len(data) // balign):
        blk = data[b * balign:(b + 1) * balign]
        pred, idx = [], []
        for c in range(ch):
            pred.append(
                int.from_bytes(blk[c * 4:c * 4 + 2], "little", signed=True)
            )
            ix = blk[c * 4 + 2]
            if ix >= len(_IMA_STEPS):
                return None
            idx.append(ix)
        chan = [[p] for p in pred]  # header predictor = first sample
        pos = 4 * ch
        while pos + 4 * ch <= balign:
            for c in range(ch):
                for byte in blk[pos + 4 * c:pos + 4 * c + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _IMA_STEPS[idx[c]]
                        diff = step >> 3
                        if nib & 4:
                            diff += step
                        if nib & 2:
                            diff += step >> 1
                        if nib & 1:
                            diff += step >> 2
                        p = pred[c] - diff if nib & 8 else pred[c] + diff
                        p = max(-32768, min(32767, p))
                        pred[c] = p
                        idx[c] = max(
                            0,
                            min(
                                len(_IMA_STEPS) - 1,
                                idx[c] + _IMA_INDEX[nib & 7],
                            ),
                        )
                        chan[c].append(p)
            pos += 4 * ch
        take = min(len(chan[0]), remaining)
        for j in range(take):
            for c in range(ch):
                out.append(chan[c][j] / 32768.0)
        remaining -= take
    return out


def _ms_adpcm_samples(
    data: bytes, ch: int, balign: int, n_samples: int
) -> list | None:
    """Decode MS ADPCM (WAV format tag 2) blocks to normalized
    interleaved floats.  Block header per channel: predictor
    coefficient index (1 byte), then int16 idelta, sample1, sample2
    per channel; output starts sample2, sample1, then one 4-bit code
    per sample round-robin across channels, high nibble first.
    Predictor division is C-style truncation toward zero (FFmpeg/
    spec-pseudocode behavior).  Returns None on a coefficient index
    past the table."""
    out: list = []
    remaining = n_samples
    hdr = 7 * ch
    for b in range(len(data) // balign):
        blk = data[b * balign:(b + 1) * balign]
        coef = []
        for c in range(ch):
            pi = blk[c]
            if pi >= len(_MS_COEFS):
                return None
            coef.append(_MS_COEFS[pi])
        delta, s1, s2 = [], [], []
        for c in range(ch):
            delta.append(int.from_bytes(
                blk[ch + 2 * c:ch + 2 * c + 2], "little", signed=True))
            s1.append(int.from_bytes(
                blk[3 * ch + 2 * c:3 * ch + 2 * c + 2],
                "little", signed=True))
            s2.append(int.from_bytes(
                blk[5 * ch + 2 * c:5 * ch + 2 * c + 2],
                "little", signed=True))
        chan = [[s2[c], s1[c]] for c in range(ch)]
        c = 0
        for byte in blk[hdr:]:
            for nib in (byte >> 4, byte & 0x0F):
                c1, c2 = coef[c]
                s = chan[c][-1] * c1 + chan[c][-2] * c2
                predv = -((-s) >> 8) if s < 0 else s >> 8
                snib = nib - 16 if nib >= 8 else nib
                v = max(-32768, min(32767, predv + delta[c] * snib))
                chan[c].append(v)
                delta[c] = max((_MS_ADAPT[nib] * delta[c]) >> 8, 16)
                c = (c + 1) % ch
        take = min(len(chan[0]), remaining)
        for j in range(take):
            for cc in range(ch):
                out.append(chan[cc][j] / 32768.0)
        remaining -= take
    return out


def decode_wav_samples(payload: bytes | None) -> dict | None:
    """REAL WAV sample decode: integer PCM normalized to floats in
    [-1, 1] (8-bit unsigned → (v-128)/128, 16/24/32 signed →
    v / 2^(bits-1)), IEEE float pass-through, G.711 mu-law/A-law table
    expansion (tags 7/6), and IMA/MS ADPCM block decode (tags 0x11/2,
    truncated to the `fact` frame count) — all codec-free per spec;
    interleaved as written.  Structural validation is
    ``decode_audio``'s RIFF walk; returns ``{"channels",
    "sample_rate", "samples": list[float]}`` or None (entropy-coded
    formats — MP3/OGG — keep the labeled stub).  Never raises."""
    meta = decode_audio(payload)
    if meta is None or meta["format"] != "wav":
        return None
    n = len(payload)
    i, tag, bits, balign, data = 12, None, None, None, None
    while i + 8 <= n:
        cid = bytes(payload[i:i + 4])
        csize = int.from_bytes(payload[i + 4:i + 8], "little")
        # the fmt guard MUST mirror decode_audio's: without it, a
        # payload carrying a second (short, invalid) fmt chunk would
        # make this walk adopt garbage tag/bits that decode_audio
        # skipped — and a tag/bits pair inconsistent with the data
        # length turns struct.unpack into a raise
        if cid == b"fmt " and csize >= 16 and i + 8 + 16 <= n:
            tag = int.from_bytes(payload[i + 8:i + 10], "little")
            balign = int.from_bytes(payload[i + 20:i + 22], "little")
            bits = int.from_bytes(payload[i + 22:i + 24], "little")
            tag = _wav_resolve_tag(payload, i, csize, tag)
        elif cid == b"data":
            data = bytes(payload[i + 8:i + 8 + csize])
        i += 8 + csize + (csize & 1)
    if tag is None or data is None:
        return None
    ch, n_target = meta["channels"], meta["n_samples"]
    if tag in (6, 7):  # G.711 mu-law / A-law: table decode per byte
        table = _ULAW_LINEAR if tag == 7 else _ALAW_LINEAR
        samples = [table[b] / 32768.0 for b in data]
    elif tag == 0x11:  # IMA ADPCM
        samples = _ima_adpcm_samples(data, ch, balign, n_target)
        if samples is None:
            return None
    elif tag == 2:  # MS ADPCM
        samples = _ms_adpcm_samples(data, ch, balign, n_target)
        if samples is None:
            return None
    elif tag == 1:  # integer PCM
        if bits == 8:
            samples = [(b - 128) / 128.0 for b in data]
        elif bits in (16, 24, 32):
            step, half = bits // 8, 1 << (bits - 1)
            samples = [
                (
                    int.from_bytes(
                        data[j:j + step], "little", signed=True
                    )
                )
                / half
                for j in range(0, len(data), step)
            ]
        else:
            return None
    elif tag == 3:  # IEEE float
        if bits == 32:
            samples = list(
                struct.unpack(f"<{len(data) // 4}f", data)
            )
        elif bits == 64:
            samples = list(
                struct.unpack(f"<{len(data) // 8}d", data)
            )
        else:
            return None
    else:
        return None
    return {
        "channels": meta["channels"],
        "sample_rate": meta["sample_rate"],
        "samples": samples,
    }


class _FlacBitReader:
    """MSB-first bit reader over the FLAC frame section.  Raises
    ValueError past the end — ``decode_flac_samples`` catches it."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos * 8  # bit position

    def bits(self, n: int) -> int:
        p, d = self.pos, self.data
        if p + n > len(d) * 8:
            raise ValueError("flac: out of bits")
        out = 0
        while n:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, n)
            out = (out << take) | (
                (byte >> (avail - take)) & ((1 << take) - 1)
            )
            p += take
            n -= take
        self.pos = p
        return out

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while not self.bits(1):
            q += 1
            if q > 1 << 20:  # corrupt stream guard
                raise ValueError("flac: runaway unary")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _flac_utf8_num(reader: "_FlacBitReader") -> int:
    """Extended-UTF-8 coded frame/sample number (RFC 9639 §9.1.5)."""
    b0 = reader.bits(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    if n_follow < 1 or n_follow > 6:
        raise ValueError("flac: bad utf8 number")
    val = b0 & (mask - 1)
    for _ in range(n_follow):
        b = reader.bits(8)
        if b & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _flac_residual(reader, blocksize, order, out):
    """Rice-coded residual (RFC 9639 §9.2.7): 2-bit method selects
    4- or 5-bit partition parameters, 2^po partitions, escape code =
    raw n-bit samples; zigzag decode."""
    method = reader.bits(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = reader.bits(4)
    n_parts = 1 << po
    if blocksize % n_parts:
        raise ValueError("flac: bad partition order")
    for part in range(n_parts):
        count = blocksize // n_parts - (order if part == 0 else 0)
        if count < 0:
            raise ValueError("flac: bad partition order")
        param = reader.bits(pbits)
        if param == escape:
            nbits = reader.bits(5)
            for _ in range(count):
                out.append(reader.signed(nbits) if nbits else 0)
        else:
            for _ in range(count):
                q = reader.unary()
                u = (q << param) | (reader.bits(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))


def _flac_subframe(reader, blocksize, bps):
    """One subframe (RFC 9639 §9.2): constant / verbatim / fixed 0-4 /
    LPC 1-32, wasted-bits unary prefix, warmup + residual +
    predictor reconstruction in exact integer arithmetic."""
    if reader.bits(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = reader.bits(6)
    wasted = 0
    if reader.bits(1):
        wasted = reader.unary() + 1
    bps -= wasted
    if ftype == 0:  # constant
        v = reader.signed(bps)
        samples = [v] * blocksize
    elif ftype == 1:  # verbatim
        samples = [reader.signed(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # fixed predictor, order 0-4
        order = ftype & 7
        samples = [reader.signed(bps) for _ in range(order)]
        _flac_residual(reader, blocksize, order, samples)
        coefs = {
            0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1),
            4: (4, -6, 4, -1),
        }[order]
        for i in range(order, blocksize):
            samples[i] += sum(
                c * samples[i - 1 - j] for j, c in enumerate(coefs)
            )
    elif ftype >= 32:  # LPC, order 1-32
        order = (ftype & 31) + 1
        samples = [reader.signed(bps) for _ in range(order)]
        prec = reader.bits(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = reader.signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [reader.signed(prec) for _ in range(order)]
        _flac_residual(reader, blocksize, order, samples)
        for i in range(order, blocksize):
            pred = sum(
                c * samples[i - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            samples[i] += pred
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(payload: bytes | None) -> dict | None:
    """REAL FLAC sample decode — FLAC is lossless and needs no codec
    library, only the public RFC 9639 bitstream: metadata blocks are
    walked to the first frame, then each frame's header (14-bit sync,
    block-size/rate/bps tables, UTF-8-coded ordinal, CRC-8 verified)
    is followed by per-channel subframes — constant, verbatim, fixed
    orders 0-4 and LPC up to order 32, rice-coded residuals with
    escape partitions, wasted-bits shifts — reconstructed in exact
    integer arithmetic and un-decorrelated (left-side / right-side /
    mid-side) per the channel assignment.  Returns the
    ``decode_wav_samples`` shape ``{"channels", "sample_rate",
    "samples": interleaved floats in [-1, 1]}`` or None; never
    raises.  Reference analog: the M-entity mediainfo capability
    (/root/reference/src/pheidippides.cpp:36-39) exposes media
    metadata only — sample access is this engine's extension."""
    meta = decode_audio(payload)
    if meta is None or meta["format"] != "flac":
        return None
    try:
        data = bytes(payload)
        n = len(data)
        channels = meta["channels"]
        rate = meta["sample_rate"]
        stream_bps = meta["bits_per_sample"]
        total = meta["n_samples"]
        # walk metadata blocks to the first audio frame
        i = 4
        while i + 4 <= n:
            last = data[i] & 0x80
            size = int.from_bytes(data[i + 1:i + 4], "big")
            i += 4 + size
            if last:
                break
        out: list[list[int]] = [[] for _ in range(channels)]
        done = 0
        # STREAMINFO total_samples == 0 means UNKNOWN length (RFC
        # 9639): decode every frame present instead of expecting none
        unknown = total == 0
        while (unknown or done < total) and i + 5 <= n:
            hdr_start = i
            if data[i] != 0xFF or data[i + 1] & 0xFC != 0xF8:
                return None
            reader = _FlacBitReader(data, i)
            reader.bits(16)  # sync + reserved + blocking strategy
            bs_bits = reader.bits(4)
            rate_bits = reader.bits(4)
            chan_bits = reader.bits(4)
            bps_bits = reader.bits(3)
            if reader.bits(1):
                return None  # reserved bit must be 0
            _flac_utf8_num(reader)
            if bs_bits == 0:
                return None
            blocksize = _FLAC_BLOCKSIZES.get(bs_bits)
            if bs_bits == 6:
                blocksize = reader.bits(8) + 1
            elif bs_bits == 7:
                blocksize = reader.bits(16) + 1
            elif bs_bits >= 8:
                blocksize = 256 << (bs_bits - 8)
            if rate_bits == 12:
                reader.bits(8)
            elif rate_bits in (13, 14):
                reader.bits(16)
            elif rate_bits == 15:
                return None
            bps = _FLAC_BPS.get(bps_bits, stream_bps)
            if bps_bits == 3:
                return None
            crc_at = reader.byte_pos()
            if _flac_crc8(data[hdr_start:crc_at]) != reader.bits(8):
                return None
            if chan_bits < 8:
                if chan_bits + 1 != channels:
                    return None
                chans = [
                    _flac_subframe(reader, blocksize, bps)
                    for _ in range(channels)
                ]
            elif chan_bits <= 10:
                if channels != 2:
                    return None
                # the SIDE channel carries one extra bit
                extra0 = 1 if chan_bits == 9 else 0
                extra1 = 0 if chan_bits == 9 else 1
                c0 = _flac_subframe(reader, blocksize, bps + extra0)
                c1 = _flac_subframe(reader, blocksize, bps + extra1)
                if chan_bits == 8:  # left/side: R = L - side
                    chans = [c0, [a - b for a, b in zip(c0, c1)]]
                elif chan_bits == 9:  # side/right: L = side + R
                    chans = [[a + b for a, b in zip(c0, c1)], c1]
                else:  # mid/side
                    left, right = [], []
                    for m, s in zip(c0, c1):
                        m2 = (m << 1) | (s & 1)
                        left.append((m2 + s) >> 1)
                        right.append((m2 - s) >> 1)
                    chans = [left, right]
            else:
                return None
            reader.align()
            if reader.byte_pos() + 2 > n:
                return None
            reader.bits(16)  # frame CRC-16 (presence-checked)
            take = blocksize if unknown else min(
                blocksize, total - done
            )
            for c in range(channels):
                out[c].extend(chans[c][:take])
            done += take
            i = reader.byte_pos()
        if unknown:
            if done == 0:
                return None  # unknown length but no frames at all
            total = done
        elif done != total:
            return None
        half = 1 << (stream_bps - 1)
        samples = [
            out[c][k] / half
            for k in range(total)
            for c in range(channels)
        ]
        return {
            "channels": channels,
            "sample_rate": rate,
            "samples": samples,
        }
    except (ValueError, IndexError, KeyError, OverflowError):
        return None


def audio_features(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, is_decodable, n_frames, rms, peak, zero_crossings): REAL
    signal statistics over decoded samples — WAV PCM/IEEE-float via
    ``decode_wav_samples``, AIFF/AIFF-C via ``decode_aiff_samples``
    and lossless FLAC via
    ``decode_flac_samples`` (mono mix = mean across channels per
    frame) — the audio analog of the pooled-pixel image features;
    entropy-coded payloads (MP3/OGG) come back is_decodable=false
    with NULL stats.  Arrow ``mapInPandas`` throughout, like every
    decoder here."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("is_decodable", BooleanType()),
            StructField("n_frames", LongType()),
            StructField("rms", FloatType()),
            StructField("peak", FloatType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    def stats(payload: bytes) -> tuple:
        dec = (decode_wav_samples(payload)
               or decode_aiff_samples(payload)
               or decode_flac_samples(payload))
        if dec is None:
            return (False, None, None, None, None)
        ch = dec["channels"]
        s = dec["samples"]
        mono = [
            sum(s[j:j + ch]) / ch for j in range(0, len(s), ch)
        ]
        if not mono:
            return (True, 0, 0.0, 0.0, 0)
        rms = (sum(v * v for v in mono) / len(mono)) ** 0.5
        peak = max(abs(v) for v in mono)
        zc = sum(
            1
            for a, b in zip(mono, mono[1:])
            if (a < 0) != (b < 0)
        )
        return (True, len(mono), rms, peak, zc)

    def feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [stats(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "is_decodable": [r[0] for r in rows],
                    "n_frames": pd.array(
                        [r[1] for r in rows], dtype="Int64"
                    ),
                    "rms": pd.array(
                        [r[2] for r in rows], dtype="Float32"
                    ),
                    "peak": pd.array(
                        [r[3] for r in rows], dtype="Float32"
                    ),
                    "zero_crossings": pd.array(
                        [r[4] for r in rows], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(feature_batches, schema)


def audio_samples(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, is_decodable, channels, sample_rate, n_frames, samples):
    the REAL decoded waveform as an interleaved ``array<float>``
    column — the decode step before feature extraction / resampling
    in a multimodal training pipeline.  WAV (PCM, IEEE float, G.711
    mu-law/A-law, IMA/MS ADPCM) via ``decode_wav_samples``, AIFF/
    AIFF-C (big-endian PCM, sowt, floats, G.711) via
    ``decode_aiff_samples``, lossless
    FLAC via ``decode_flac_samples``; entropy-coded payloads come
    back is_decodable=false with NULL samples.  Every sample is
    v/2^15 of an integer reconstruction, so ``round(s*32768)``
    recovers the exact int16 stream (float32 holds 16-bit integers
    exactly) — the property q30's driver-hash oracle relies on.
    Arrow ``mapInPandas``, like every decoder here."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("is_decodable", BooleanType()),
            StructField("channels", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("samples", ArrayType(FloatType())),
        ]
    )

    def decode(payload) -> tuple:
        dec = (decode_wav_samples(payload)
               or decode_aiff_samples(payload)
               or decode_flac_samples(payload))
        if dec is None:
            return (False, None, None, None, None)
        ch = dec["channels"]
        return (
            True, ch, dec["sample_rate"],
            len(dec["samples"]) // ch, dec["samples"],
        )

    def sample_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "is_decodable": [r[0] for r in rows],
                    "channels": pd.array(
                        [r[1] for r in rows], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [r[2] for r in rows], dtype="Int32"
                    ),
                    "n_frames": pd.array(
                        [r[3] for r in rows], dtype="Int64"
                    ),
                    "samples": [r[4] for r in rows],
                }
            )

    return df.mapInPandas(sample_batches, schema)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the ISO-BMFF box
    table in payload[start:end]; raises ValueError on a malformed
    table (size too small, box overrunning the range, truncated
    header) — the walk itself is the structural validation."""
    i = end_of_prev = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated box header")
        size = int.from_bytes(payload[i:i + 4], "big")
        btype = bytes(payload[i + 4:i + 8])
        body = i + 8
        if size == 1:  # 64-bit largesize follows the type
            if i + 16 > end:
                raise ValueError("truncated largesize")
            size = int.from_bytes(payload[i + 8:i + 16], "big")
            body = i + 16
            if size < 16:
                raise ValueError("largesize too small")
        elif size == 0:  # box extends to the end of the enclosing range
            size = end - i
            if size < 8:
                raise ValueError("empty to-end box")
        elif size < 8:
            raise ValueError("box size below header size")
        if i + size > end:
            raise ValueError("box overruns enclosing range")
        yield btype, body, i + size
        i = end_of_prev = i + size
    if end_of_prev != end:  # pragma: no cover — loop exits exactly at end
        raise ValueError("box table does not tile the range")


def _riff_chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the RIFF chunk table
    in payload[start:end] (u32 little-endian sizes, bodies padded to
    even offsets); raises ValueError when a chunk overruns the range
    or the table does not tile it — same structural contract as
    ``_mp4_boxes``."""
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        fourcc = bytes(payload[i:i + 4])
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = i + 8
        if body + size > end:
            raise ValueError("RIFF chunk overruns enclosing range")
        yield fourcc, body, body + size
        i = body + size + (size & 1)  # bodies pad to even
    if i != end and i != end + 1:  # final pad byte may exceed `end`
        raise ValueError("RIFF table does not tile the range")


def _avi_scan(payload: bytes) -> tuple[dict, list[bytes]] | None:
    """RIFF-AVI container walk: returns (meta, ordered video-frame
    chunk bodies) or None.  The ``hdrl`` LIST must hold a valid
    ``avih`` main header (frame timing, stream count, dimensions) and
    the video ``strh`` supplies the handler fourcc (e.g. ``MJPG`` —
    whose frames are baseline JPEGs that ``decode_jpeg_pixels``
    decodes for real); frames are the ``##dc``/``##db`` chunks of the
    ``movi`` LIST, including inside ``rec `` groups.  Raises
    ValueError on structural violations (caller converts to None)."""
    n = len(payload)
    if n < 12 or bytes(payload[:4]) != b"RIFF":
        return None
    riff_size = int.from_bytes(payload[4:8], "little")
    if bytes(payload[8:12]) != b"AVI " or 8 + riff_size > n + 1:
        return None
    end = min(n, 8 + riff_size)
    meta = {
        "us_per_frame": None, "total_frames": None, "n_streams": None,
        "width": None, "height": None, "handler": None, "strf": None,
    }
    frames: list[bytes] = []

    def is_video_frame(fourcc: bytes) -> bool:
        return (
            len(fourcc) == 4
            and fourcc[:2].isdigit()
            and fourcc[2:] in (b"dc", b"db")
        )

    for fourcc, body, bend in _riff_chunks(payload, 12, end):
        if fourcc != b"LIST" or bend - body < 4:
            continue
        ltype = bytes(payload[body:body + 4])
        if ltype == b"hdrl":
            for cf, cb, ce in _riff_chunks(payload, body + 4, bend):
                if cf == b"avih":
                    if ce - cb < 40:
                        raise ValueError("short avih")
                    u32 = lambda o: int.from_bytes(  # noqa: E731
                        payload[cb + o:cb + o + 4], "little"
                    )
                    meta.update(
                        us_per_frame=u32(0), total_frames=u32(16),
                        n_streams=u32(24), width=u32(32),
                        height=u32(36),
                    )
                elif cf == b"LIST" and ce - cb >= 4 and bytes(
                    payload[cb:cb + 4]
                ) == b"strl":
                    in_vids = False
                    for sf, sb, se in _riff_chunks(
                        payload, cb + 4, ce
                    ):
                        if sf == b"strh" and se - sb >= 8:
                            in_vids = bytes(
                                payload[sb:sb + 4]
                            ) == b"vids"
                            if in_vids:
                                raw = bytes(payload[sb + 4:sb + 8])
                                if raw.isascii():
                                    meta["handler"] = (
                                        raw.decode("ascii").strip()
                                        or None
                                    )
                        elif sf == b"strf" and in_vids and (
                            se - sb >= 40
                        ):
                            # the video stream's BITMAPINFOHEADER
                            # (+palette) — lets DIB/RLE/CRAM frames
                            # re-wrap as standalone BMPs downstream
                            meta["strf"] = bytes(payload[sb:se])
        elif ltype == b"movi":
            for cf, cb, ce in _riff_chunks(payload, body + 4, bend):
                if is_video_frame(cf):
                    frames.append(bytes(payload[cb:ce]))
                elif cf == b"LIST" and ce - cb >= 4 and bytes(
                    payload[cb:cb + 4]
                ) == b"rec ":
                    for rf, rb, re_ in _riff_chunks(
                        payload, cb + 4, ce
                    ):
                        if is_video_frame(rf):
                            frames.append(bytes(payload[rb:re_]))
    if meta["us_per_frame"] is None or not meta["us_per_frame"]:
        return None
    if not meta["width"] or not meta["height"]:
        return None
    return meta, frames


def _avi_video_frames(payload: bytes | None) -> list[bytes] | None:
    """Ordered real video-frame chunks of an AVI payload, or None for
    non-AVI/malformed payloads; never raises.  MJPEG (and other
    self-contained codec) chunks pass through verbatim — each is a
    complete JPEG stream.  When the video ``strf`` declares an
    uncompressed DIB (BI_RGB), RLE (BI_RLE8/4), or MS Video 1
    (CRAM/MSVC/WHAM fourcc) stream, each chunk is instead re-wrapped
    as a standalone BMP — ``BM`` file header + the strf
    BITMAPINFOHEADER+palette verbatim + the chunk verbatim — so the
    frames pixel-decode through ``decode_bmp_pixels`` downstream,
    exactly like ``_gif_video_frames`` re-wraps animated-GIF
    descriptors (composition across skip blocks is a sequence-level
    concern, same stance as GIF disposal)."""
    if not payload:
        return None
    try:
        scanned = _avi_scan(bytes(payload))
    except (ValueError, IndexError, struct.error):
        return None
    if not scanned:
        return None
    meta, frames = scanned
    strf = meta.get("strf")
    if strf is not None:
        comp = int.from_bytes(strf[16:20], "little")
        if comp in (0, 1, 2) or comp in _MSV1_FOURCCS:
            off = 14 + len(strf)
            frames = [
                b"BM"
                + (off + len(f)).to_bytes(4, "little")
                + bytes(4)
                + off.to_bytes(4, "little")
                + strf
                + f
                for f in frames
            ]
    return frames


def _gif_video_frames(payload: bytes | None) -> list[bytes] | None:
    """Ordered REAL frames of an ANIMATED GIF (≥ 2 image
    descriptors), each re-wrapped as a standalone single-frame GIF89a
    — the original LZW sub-blocks verbatim, the local-else-global
    palette promoted to the new frame's global table, the interlace
    flag preserved — so every emitted frame decodes through
    ``decode_gif_pixels`` downstream, exactly like AVI's MJPEG chunks
    decode through ``decode_jpeg_pixels``.  Frames are the raw
    per-descriptor images (no disposal/coalescing — composition is a
    downstream choice, like codec decode for MP4 samples).
    Single-image GIFs return None and stay on the still-image path;
    never raises."""
    if not payload or len(payload) < 14:
        return None
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        flags = data[10]
        i = 13
        gct = None
        gct_bits = 0
        if flags & 0x80:
            gct_bits = flags & 7
            size = 3 * (2 << gct_bits)
            gct = data[13:13 + size]
            if len(gct) != size:
                return None
            i = 13 + size
        frames = []
        n = len(data)
        while i < n:
            b = data[i]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: skip (GCE timing not needed)
                j = _skip_subblocks(data, i + 2)
                if j is None:
                    return None
                i = j
                continue
            if b != 0x2C:
                return None
            if i + 10 > n:
                return None
            iw = int.from_bytes(data[i + 5:i + 7], "little")
            ih = int.from_bytes(data[i + 7:i + 9], "little")
            lflags = data[i + 9]
            j = i + 10
            pal, bits = gct, gct_bits
            if lflags & 0x80:  # local color table
                bits = lflags & 7
                size = 3 * (2 << bits)
                pal = data[j:j + size]
                if len(pal) != size:
                    return None
                j += size
            if pal is None or not iw or not ih:
                return None
            body_start = j  # LZW min-code byte + sub-blocks
            if j >= n:
                return None
            j += 1
            while True:  # walk the data sub-blocks to the 0 sentinel
                if j >= n:
                    return None
                sz = data[j]
                j += 1
                if sz == 0:
                    break
                j += sz
                if j > n:
                    return None
            frames.append(
                b"GIF89a"
                + iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
                + bytes([0x80 | bits, 0, 0]) + pal
                + b"\x2c" + bytes(4)
                + iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
                + bytes([lflags & 0x40])  # keep interlace only
                + data[body_start:j]
                + b"\x3b"
            )
            i = j
        if len(frames) < 2:
            return None  # a still image, not an animation
        return frames
    except (ValueError, IndexError, struct.error):
        return None


def _mp4_video_frames(payload: bytes | None) -> list[bytes] | None:
    """Ordered REAL video samples of an MP4 payload via the sample
    tables — ISO 14496-12 ``stbl`` is plain structure, no codec:
    ``stsz`` sizes every sample, ``stsc`` runs map samples to chunks,
    ``stco``/``co64`` give absolute chunk offsets, and samples lie
    consecutively within each chunk.  The first trak whose ``hdlr``
    handler is 'vide' is used; each returned byte string is one
    sample exactly as the encoder wrote it (e.g. AVC NAL units) —
    the codec-free frame-extraction step a 100 TB pipeline runs
    before shipping frames to a GPU decoder.  None for
    non-MP4 / malformed / table-less payloads; never raises."""
    if not payload:
        return None
    data = bytes(payload)
    n = len(data)
    if n < 16 or data[4:8] != b"ftyp":
        return None

    def child(start, end, wanted):
        for btype, body, bend in _mp4_boxes(data, start, end):
            if btype == wanted:
                return body, bend
        return None

    try:
        moov = child(0, n, b"moov")
        if moov is None:
            return None
        stbl = None
        for btype, body, bend in _mp4_boxes(data, *moov):
            if btype != b"trak":
                continue
            mdia = child(body, bend, b"mdia")
            if mdia is None:
                continue
            hdlr = child(*mdia, b"hdlr")
            if hdlr is None or hdlr[1] - hdlr[0] < 12:
                continue
            if data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
                continue
            minf = child(*mdia, b"minf")
            if minf is None:
                continue
            stbl = child(*minf, b"stbl")
            break
        if stbl is None:
            return None
        stsz = child(*stbl, b"stsz")
        stsc = child(*stbl, b"stsc")
        stco = child(*stbl, b"stco")
        width = 4
        if stco is None:
            stco = child(*stbl, b"co64")
            width = 8
        if stsz is None or stsc is None or stco is None:
            return None

        def u32(at):
            if at + 4 > n:
                raise ValueError("mp4: truncated table")
            return int.from_bytes(data[at:at + 4], "big")

        # stsz: ver/flags, uniform sample_size, count, [sizes]
        b0 = stsz[0]
        uniform = u32(b0 + 4)
        count = u32(b0 + 8)
        if count == 0 or count > n:
            return None
        if uniform:
            sizes = [uniform] * count
        else:
            if b0 + 12 + 4 * count > stsz[1]:
                return None
            sizes = [u32(b0 + 12 + 4 * k) for k in range(count)]
        # stco/co64: chunk offsets
        b0 = stco[0]
        n_chunks = u32(b0 + 4)
        if b0 + 8 + width * n_chunks > stco[1] or n_chunks == 0:
            return None
        offs = [
            int.from_bytes(
                data[b0 + 8 + width * k:b0 + 8 + width * (k + 1)],
                "big",
            )
            for k in range(n_chunks)
        ]
        # stsc: (first_chunk, samples_per_chunk) runs over the chunks
        b0 = stsc[0]
        n_runs = u32(b0 + 4)
        if n_runs == 0 or b0 + 8 + 12 * n_runs > stsc[1]:
            return None
        runs = [
            (u32(b0 + 8 + 12 * k), u32(b0 + 12 + 12 * k))
            for k in range(n_runs)
        ]
        if runs[0][0] != 1:
            return None
        # run starts must be strictly increasing and within the chunk
        # table BEFORE the expansion below — a hostile first_chunk
        # near 2^32 would otherwise build a multi-GB samples-per-chunk
        # list from a few-hundred-byte payload
        for k in range(1, n_runs):
            if runs[k][0] <= runs[k - 1][0] or runs[k][0] > n_chunks:
                return None
        spc = []
        for k, (first, per) in enumerate(runs):
            last = (
                runs[k + 1][0] - 1 if k + 1 < n_runs else n_chunks
            )
            if last < first:
                return None
            spc.extend([per] * (last - first + 1))
        if len(spc) != n_chunks:
            return None
        frames = []
        si = 0
        for c, off in enumerate(offs):
            pos = off
            for _ in range(spc[c]):
                if si >= count:
                    return None
                sz = sizes[si]
                if pos + sz > n:
                    return None
                frames.append(data[pos:pos + sz])
                pos += sz
                si += 1
        if si != count:
            return None
        return frames
    except (ValueError, IndexError, struct.error):
        return None


_MAX_COMPOSED_FRAMES = 256  # bound total composed output (hostile
# many-frame animations would otherwise emit frames × W*H*3 bytes)
_MAX_COMPOSED_PIXELS = 1 << 24  # …and bound frames × W*H too: 256
# max-size frames would still compose to ~3 GB of RGB without this


def _gif_compose(data: bytes) -> dict | None:
    """Composited TRUE pixels for every frame of an animated GIF —
    the sequence-level step ``_gif_video_frames`` leaves downstream:
    frames draw at their (left, top) descriptor position onto the
    logical-screen canvas, GCE transparency (packed bit 0 +
    transparent index) leaves the underlying pixels, and GCE disposal
    (packed bits 2-4) runs AFTER a frame is emitted — 2 restores the
    frame's rectangle to the background color, 3 restores the
    pre-draw canvas, 0/1 leave it.  The canvas starts as the
    logical-screen background (GCT[background index], else black —
    flattening, since the 3-channel pixel shape has no alpha).
    Returns {width, height, channels, frames:[rgb,...]} with one
    composited full-canvas RGB per frame, or None (malformed, a
    still, or past the frame/pixel bounds); never raises."""
    if len(data) < 14 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    if sw <= 0 or sh <= 0 or sw * sh > _JPEG_MAX_PIXELS:
        return None
    flags = data[10]
    bg_index = data[11]
    gct = None
    i = 13
    if flags & 0x80:
        size = 3 * (2 << (flags & 7))
        gct = bytes(data[13:13 + size])
        if len(gct) != size:
            return None
        i = 13 + size
    if gct is not None and 3 * bg_index + 2 < len(gct):
        background = gct[3 * bg_index:3 * bg_index + 3]
    else:
        background = b"\x00\x00\x00"
    canvas = bytearray(background * (sw * sh))
    n = len(data)
    frames: list[bytes] = []
    disposal, transparent = 0, None
    while i < n:
        b = data[i]
        if b == 0x3B:
            break
        if b == 0x21:
            if data[i + 1:i + 2] == b"\xf9" and i + 7 < n and (
                data[i + 2] == 4
            ):
                packed = data[i + 3]
                disposal = (packed >> 2) & 7
                transparent = data[i + 6] if packed & 1 else None
            j = _skip_subblocks(data, i + 2)
            if j is None:
                return None
            i = j
            continue
        if b != 0x2C or i + 10 > n:
            return None
        left = int.from_bytes(data[i + 1:i + 3], "little")
        top = int.from_bytes(data[i + 3:i + 5], "little")
        iw = int.from_bytes(data[i + 5:i + 7], "little")
        ih = int.from_bytes(data[i + 7:i + 9], "little")
        lflags = data[i + 9]
        if not iw or not ih or left + iw > sw or top + ih > sh:
            return None
        j = i + 10
        pal, _bits = gct, flags & 7
        if lflags & 0x80:
            size = 3 * (2 << (lflags & 7))
            pal = bytes(data[j:j + size])
            if len(pal) != size:
                return None
            j += size
        if pal is None:
            return None
        if j >= n:
            return None
        min_code = data[j]
        j += 1
        lzw = bytearray()
        while True:
            if j >= n:
                return None
            sz = data[j]
            j += 1
            if sz == 0:
                break
            lzw += data[j:j + sz]
            j += sz
            if j > n:
                return None
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih)
        if idx is None or max(idx) * 3 + 2 >= len(pal):
            return None
        if lflags & 0x40:  # interlaced rows arrive in 4 passes
            rows = [idx[r * iw:(r + 1) * iw] for r in range(ih)]
            order = (
                list(range(0, ih, 8)) + list(range(4, ih, 8))
                + list(range(2, ih, 4)) + list(range(1, ih, 2))
            )
            deinter: list[bytes] = [b""] * ih
            for src, dst in enumerate(order):
                deinter[dst] = rows[src]
            idx = b"".join(deinter)
        saved = bytes(canvas) if disposal == 3 else None
        for y in range(ih):
            row = idx[y * iw:(y + 1) * iw]
            base = ((top + y) * sw + left) * 3
            for x, k in enumerate(row):
                if k == transparent:
                    continue
                at = base + 3 * x
                canvas[at:at + 3] = pal[3 * k:3 * k + 3]
        frames.append(bytes(canvas))
        if (len(frames) > _MAX_COMPOSED_FRAMES
                or len(frames) * sw * sh > _MAX_COMPOSED_PIXELS):
            return None
        if disposal == 2:
            for y in range(ih):
                base = ((top + y) * sw + left) * 3
                canvas[base:base + 3 * iw] = background * iw
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal, transparent = 0, None
        i = j
    if len(frames) < 2:
        return None  # a still image, not an animation
    return {"width": sw, "height": sh, "channels": 3,
            "frames": frames}


def _jpeg_sequence_compose(frames: list[bytes]) -> dict | None:
    """Compose a Motion-JPEG sample sequence: the codec has no
    inter-frame state, so every sample is an independent full repaint
    and the sequence composes iff each one is a decodable JPEG
    (``decode_jpeg_pixels`` — from-spec T.81 Huffman + IDCT) with one
    consistent geometry.  None if any frame fails, geometries differ,
    or the total composed output would exceed the frame/pixel
    bounds."""
    if not frames or len(frames) > _MAX_COMPOSED_FRAMES:
        return None
    out: list[bytes] = []
    shape = None
    for f in frames:
        if f[:2] != b"\xff\xd8":
            return None
        dec = decode_jpeg_pixels(f)
        if dec is None:
            return None
        s = (dec["width"], dec["height"], dec["channels"])
        if shape is None:
            shape = s
            if len(frames) * s[0] * s[1] > _MAX_COMPOSED_PIXELS:
                return None
        elif s != shape:
            return None
        out.append(dec["pixels"])
    return {"width": shape[0], "height": shape[1],
            "channels": shape[2], "frames": out}


_MJPEG_FOURCCS = frozenset((b"MJPG", b"mjpg", b"dmb1"))


def _avi_compose(data: bytes) -> dict | None:
    """Composited TRUE pixels for every frame of an AVI whose video
    stream is MS Video 1 (CRAM/MSVC/WHAM), uncompressed DIB, RLE, or
    Motion-JPEG: MSV1 frames decode with the previous frame's pixels
    as the canvas, so skip-run blocks genuinely persist across frames
    (the codec's inter-frame mechanism — ``_avi_video_frames``'s
    standalone re-wrap necessarily renders them black); DIB/RLE and
    MJPEG frames are full repaints and decode standalone.  Frame
    geometry and palette come from the captured strf
    BITMAPINFOHEADER (MJPEG geometry from each frame's own SOF).
    Returns the ``_gif_compose`` shape, or None (no video strf, a
    codec this engine cannot pixel-decode, or any malformed frame);
    never raises."""
    scanned = _avi_scan(data)
    if not scanned:
        return None
    meta, chunks = scanned
    strf = meta.get("strf")
    if strf is None or not chunks:
        return None
    if len(chunks) > _MAX_COMPOSED_FRAMES:
        return None
    w = int.from_bytes(strf[4:8], "little", signed=True)
    h = int.from_bytes(strf[8:12], "little", signed=True)
    bpp = int.from_bytes(strf[14:16], "little")
    comp = int.from_bytes(strf[16:20], "little")
    if comp in _MSV1_FOURCCS and bpp in (8, 16) and h > 0:
        if w <= 0 or w * h > _JPEG_MAX_PIXELS:
            return None
        if len(chunks) * w * h > _MAX_COMPOSED_PIXELS:
            return None
        palette = None
        if bpp == 8:
            n_colors = int.from_bytes(strf[32:36], "little") or 256
            if len(strf) < 40 + 4 * n_colors:
                return None
            palette = [
                bytes((strf[40 + 4 * i + 2], strf[40 + 4 * i + 1],
                       strf[40 + 4 * i]))
                for i in range(n_colors)
            ]
        frames: list[bytes] = []
        canvas: bytes | None = None
        for c in chunks:
            px = _msvideo1_pixels(c, w, h, bpp, palette, canvas)
            if px is None:
                return None
            frames.append(px)
            canvas = px
        return {"width": w, "height": h, "channels": 3,
                "frames": frames}
    if comp in (0, 1, 2):  # DIB / RLE: every frame a full repaint
        off = 14 + len(strf)
        frames = []
        for c in chunks:
            bmp = (b"BM" + (off + len(c)).to_bytes(4, "little")
                   + bytes(4) + off.to_bytes(4, "little") + strf + c)
            dec = decode_bmp_pixels(bmp)
            if dec is None:
                return None
            if (len(chunks) * dec["width"] * dec["height"]
                    > _MAX_COMPOSED_PIXELS):
                return None
            frames.append(dec["pixels"])
        if not frames:
            return None
        return {"width": dec["width"], "height": dec["height"],
                "channels": 3, "frames": frames}
    if strf[16:20] in _MJPEG_FOURCCS:
        return _jpeg_sequence_compose(chunks)
    return None  # remaining entropy-coded codecs: metadata only


def _mp4_compose(data: bytes) -> dict | None:
    """Composited TRUE pixels for an MP4 whose video track carries
    Motion-JPEG samples (sample-entry codecs 'jpeg'/'mjpa' write one
    standalone JPEG per sample): the sample-table walk
    (``_mp4_video_frames``) extracts the frames and each decodes on
    its own.  Detection is by content — every sample must start with
    the JPEG SOI marker and fully decode — so H.264/H.265/VP9 tracks
    (the codecs that genuinely need codec libraries) return None from
    the first sample's leading NAL bytes."""
    frames = _mp4_video_frames(data)
    if frames is None:
        return None
    return _jpeg_sequence_compose(frames)


def compose_video_pixels(payload: bytes | None) -> dict | None:
    """REAL sequence-level video decode: every frame of an animated
    payload as composited full-canvas RGB pixels — the step after
    ``frame_sample``'s byte extraction, closing the video → frames →
    TRUE pixels path for the from-spec-decodable families (animated
    GIF with disposal/transparency composition, AVI MS Video 1 with
    inter-frame skip-block persistence, AVI DIB/RLE repaints, and
    Motion-JPEG in AVI or MP4 via the T.81 decoder).  Inter-frame
    predictive codecs — H.26x/VP9 samples, entropy-coded AVI streams
    beyond MJPEG — return None, same stance as ``decode_image``'s
    metadata path.  Returns {width, height, channels,
    frames: [rgb, ...]} or None; never raises."""
    if not payload:
        return None
    data = bytes(payload)
    try:
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return _gif_compose(data)
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            return _avi_compose(data)
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return _mp4_compose(data)
    except (ValueError, IndexError, struct.error, OverflowError):
        return None
    return None


def _ebml_vint(data: bytes, i: int, end: int, is_id: bool):
    """Read one EBML variable-length integer at data[i] (RFC 8794):
    the leading byte's first set bit gives the width.  IDs keep the
    marker bit in the value; sizes clear it and report the all-ones
    'unknown size' as None.  Returns (value, next_index); raises
    ValueError on truncation or a zero lead byte."""
    if i >= end:
        raise ValueError("ebml: truncated vint")
    b0 = data[i]
    if b0 == 0:
        raise ValueError("ebml: vint width > 8")
    ln = 9 - b0.bit_length()
    if i + ln > end:
        raise ValueError("ebml: vint overruns range")
    if is_id:
        return int.from_bytes(data[i:i + ln], "big"), i + ln
    val = b0 & (0xFF >> ln)
    for k in range(1, ln):
        val = (val << 8) | data[i + k]
    if val == (1 << (7 * ln)) - 1:  # all value bits set: unknown
        return None, i + ln
    return val, i + ln


def _ebml_elements(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for the EBML element
    table in data[start:end]; the table must tile the range (same
    structural contract as ``_mp4_boxes``).  An unknown-size element
    is only lawful for the Segment (0x18538067, streamed Matroska)
    and extends to the end of the range; raises ValueError on any
    other malformation."""
    i = start
    while i < end:
        eid, j = _ebml_vint(data, i, end, is_id=True)
        size, body = _ebml_vint(data, j, end, is_id=False)
        if size is None:
            if eid != 0x18538067:
                raise ValueError("ebml: unknown size outside Segment")
            yield eid, body, end
            return
        if body + size > end:
            raise ValueError("ebml: element overruns range")
        yield eid, body, body + size
        i = body + size


def _ebml_vint_signed(data: bytes, i: int, end: int):
    """Signed EBML vint (Matroska EBML-lacing size deltas): the
    unsigned value minus 2^(7·width−1) − 1.  Raises ValueError on
    malformation (incl. the all-ones pattern)."""
    b0 = data[i] if i < end else 0
    if b0 == 0:
        raise ValueError("ebml: bad signed vint")
    ln = 9 - b0.bit_length()
    val, j = _ebml_vint(data, i, end, is_id=False)
    if val is None:
        raise ValueError("ebml: all-ones signed vint")
    return val - ((1 << (7 * ln - 1)) - 1), j


def _mkv_block_frames(
    data: bytes, s0: int, s1: int, track: int
) -> list[bytes]:
    """Frames of one Matroska (Simple)Block body (track-number vint,
    s16 timecode, flags, then the lace table + frame bytes): no
    lacing, Xiph (255-terminated size bytes), fixed (equal split) and
    EBML (first size + signed deltas) lacing all reconstruct exact
    frame byte ranges.  Blocks of other tracks return []; raises
    ValueError on malformation."""
    tnum, i = _ebml_vint(data, s0, s1, is_id=False)
    if tnum is None:
        raise ValueError("mkv: unknown-size track number")
    if i + 3 > s1:
        raise ValueError("mkv: truncated block header")
    flags = data[i + 2]
    i += 3
    if tnum != track:
        return []
    lacing = (flags >> 1) & 3
    if lacing == 0:
        return [data[i:s1]]
    if i >= s1:
        raise ValueError("mkv: missing lace count")
    k = data[i] + 1
    i += 1
    if lacing == 2:  # fixed-size lacing: equal split of the rest
        rem = s1 - i
        if rem % k:
            raise ValueError("mkv: fixed lacing not divisible")
        w = rem // k
        return [data[i + t * w:i + (t + 1) * w] for t in range(k)]
    sizes = []
    if lacing == 1:  # Xiph: 255-terminated byte sums for k-1 frames
        for _ in range(k - 1):
            sz = 0
            while True:
                if i >= s1:
                    raise ValueError("mkv: truncated Xiph lace")
                b = data[i]
                i += 1
                sz += b
                if b < 255:
                    break
            sizes.append(sz)
    else:  # EBML: first size absolute, then signed deltas
        first, i = _ebml_vint(data, i, s1, is_id=False)
        if first is None:
            raise ValueError("mkv: unknown-size lace")
        sizes.append(first)
        prev = first
        for _ in range(k - 2):
            delta, i = _ebml_vint_signed(data, i, s1)
            prev += delta
            if prev < 0:
                raise ValueError("mkv: negative lace size")
            sizes.append(prev)
    last = s1 - i - sum(sizes)  # final frame size is inferred
    if last < 0:
        raise ValueError("mkv: laces overrun block")
    out = []
    for sz in sizes:
        out.append(data[i:i + sz])
        i += sz
    out.append(data[i:s1])
    return out


def _mkv_video_frames(payload: bytes | None) -> list[bytes] | None:
    """Ordered REAL video frames of a Matroska/WebM payload: resolve
    the first video track's TrackNumber, then walk every Cluster's
    SimpleBlocks and BlockGroup Blocks (``_mkv_block_frames``) —
    un-lacing Xiph / fixed / EBML lace tables — and emit each frame's
    exact bytes as the encoder wrote them (VP8/VP9/AV1/H.264
    bitstream chunks), the same codec-free extraction step
    ``_mp4_video_frames`` performs from the ISO-BMFF sample tables.
    None for non-Matroska / malformed / frameless payloads; never
    raises."""
    if not payload:
        return None
    data = bytes(payload)
    n = len(data)
    if n < 8 or data[:4] != b"\x1a\x45\xdf\xa3":
        return None
    try:
        doctype = None
        seg = None
        for eid, b0, b1 in _ebml_elements(data, 0, n):
            if eid == 0x1A45DFA3 and doctype is None:
                for hid, h0, h1 in _ebml_elements(data, b0, b1):
                    if hid == 0x4282:
                        doctype = data[h0:h1].split(b"\x00")[0]
            elif eid == 0x18538067 and seg is None:
                seg = (b0, b1)
        if doctype not in (b"matroska", b"webm") or seg is None:
            return None
        video_track = None
        clusters = []
        for eid, b0, b1 in _ebml_elements(data, *seg):
            if eid == 0x1654AE6B:  # Tracks
                for tid, t0, t1 in _ebml_elements(data, b0, b1):
                    if tid != 0xAE:
                        continue
                    ttype = tnum = None
                    for fid, f0, f1 in _ebml_elements(data, t0, t1):
                        if fid == 0x83 and f1 > f0:  # TrackType
                            ttype = data[f0]
                        elif fid == 0xD7 and 1 <= f1 - f0 <= 8:
                            tnum = int.from_bytes(
                                data[f0:f1], "big")
                    if ttype == 1 and tnum and video_track is None:
                        video_track = tnum
            elif eid == 0x1F43B675:
                clusters.append((b0, b1))
        if video_track is None or not clusters:
            return None
        frames: list[bytes] = []
        for b0, b1 in clusters:
            for cid, c0, c1 in _ebml_elements(data, b0, b1):
                if cid == 0xA3:  # SimpleBlock
                    spans = [(c0, c1)]
                elif cid == 0xA0:  # BlockGroup → Block children
                    spans = [
                        (g0, g1)
                        for gid, g0, g1 in _ebml_elements(
                            data, c0, c1)
                        if gid == 0xA1
                    ]
                else:
                    continue
                for s0, s1 in spans:
                    frames.extend(
                        _mkv_block_frames(data, s0, s1, video_track))
        return frames or None
    except (ValueError, IndexError, struct.error, OverflowError):
        return None


def _decode_webm(payload: bytes) -> dict | None:
    """REAL Matroska / WebM container decode (public RFC 8794 EBML +
    the matroska.org element registry): the top-level element walk
    must tile the payload — an EBML header whose DocType is
    'matroska' or 'webm', then a Segment (unknown-size Segments, the
    streamed form, extend to payload end).  Inside the Segment: Info
    yields TimecodeScale (ns/tick, default 1e6) and the float
    Duration; Tracks yields the track count and the first video
    track's PixelWidth/PixelHeight; at least one Cluster must be
    present (the ``mdat`` analog).  Reported ``timescale`` is
    ticks/second (1e9 / TimecodeScale) so the shape matches the MP4
    branch.  Frame extraction (SimpleBlock/laced Block payloads)
    carries codec bitstreams (VP8/VP9/AV1/H.264) and stays behind
    the codec boundary.  None on anything malformed; never raises."""
    data = bytes(payload)
    n = len(data)
    doctype = None
    seg = None
    try:
        for eid, b0, b1 in _ebml_elements(data, 0, n):
            if eid == 0x1A45DFA3 and doctype is None:
                for hid, h0, h1 in _ebml_elements(data, b0, b1):
                    if hid == 0x4282:  # DocType
                        doctype = data[h0:h1].split(b"\x00")[0]
            elif eid == 0x18538067 and seg is None:
                seg = (b0, b1)
        if doctype not in (b"matroska", b"webm") or seg is None:
            return None
        scale = 1_000_000  # TimecodeScale default: 1 ms ticks
        duration = None
        saw_info = saw_cluster = False
        n_tracks = 0
        width = height = None
        for eid, b0, b1 in _ebml_elements(data, *seg):
            if eid == 0x1549A966 and not saw_info:  # Info
                saw_info = True
                for iid, i0, i1 in _ebml_elements(data, b0, b1):
                    if iid == 0x2AD7B1:  # TimecodeScale (uint)
                        if not 1 <= i1 - i0 <= 8:
                            return None
                        scale = int.from_bytes(data[i0:i1], "big")
                        # ns/tick: 0 is invalid; >1e9 would zero the
                        # reported ticks/second
                        if not 1 <= scale <= 1_000_000_000:
                            return None
                    elif iid == 0x4489:  # Duration (float 4/8)
                        if i1 - i0 == 4:
                            duration = struct.unpack(
                                ">f", data[i0:i1])[0]
                        elif i1 - i0 == 8:
                            duration = struct.unpack(
                                ">d", data[i0:i1])[0]
                        else:
                            return None
                        # NaN, negative and inf all fail (inf would
                        # overflow the int() conversion below)
                        if not 0 <= duration < 1e15:
                            return None
            elif eid == 0x1654AE6B:  # Tracks
                for tid, t0, t1 in _ebml_elements(data, b0, b1):
                    if tid != 0xAE:  # TrackEntry
                        continue
                    n_tracks += 1
                    for fid, f0, f1 in _ebml_elements(data, t0, t1):
                        if fid != 0xE0:  # Video settings
                            continue
                        w = h = None
                        for vid, v0, v1 in _ebml_elements(
                                data, f0, f1):
                            if not 1 <= v1 - v0 <= 8:
                                continue
                            if vid == 0xB0:  # PixelWidth
                                w = int.from_bytes(data[v0:v1], "big")
                            elif vid == 0xBA:  # PixelHeight
                                h = int.from_bytes(data[v0:v1], "big")
                        if width is None and w and h:
                            width, height = w, h
            elif eid == 0x1F43B675:  # Cluster
                saw_cluster = True
    except (ValueError, IndexError, struct.error, OverflowError):
        return None
    if not saw_info or not saw_cluster:
        return None
    dur_ms = int(duration * scale / 1e6) if duration else 0
    return {
        "format": "webm" if doctype == b"webm" else "mkv",
        "major_brand": doctype.decode("ascii"),
        "timescale": 1_000_000_000 // scale,
        "duration_ms": dur_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def decode_video(payload: bytes | None) -> dict | None:
    """REAL pure-Python video container decoder for MP4 (ISO base
    media file format): walk the top-level box table (every declared
    box size must tile the payload exactly — arbitrary bytes after a
    valid prefix fail, same contract as the PNG chunk walk), require
    an ``ftyp`` first box, a ``moov`` containing a valid ``mvhd``
    (version 0 or 1, nonzero timescale), and an ``mdat``; read track
    count and the presentation (width, height) from the first ``tkhd``
    with nonzero dimensions (16.16 fixed point, rounded to int).
    Also decodes RIFF-AVI containers (``_avi_scan``): the ``avih``
    main header yields frame timing, stream count and dimensions, the
    video ``strh`` the handler fourcc, reported with ``timescale`` =
    1e6 (microsecond units) so ``duration_ms`` = µs/frame × frames.
    And Matroska/WebM (``_decode_webm``): the RFC 8794 EBML element
    walk — DocType gate, Segment Info (TimecodeScale + Duration),
    Tracks (count + first video track's pixel dims), Cluster
    required.
    Returns ``{"format", "major_brand", "timescale", "duration_ms",
    "n_tracks", "width", "height"}`` or None.  For MJPEG AVIs the
    frames themselves decode for real too (``frame_sample`` emits the
    actual ``movi`` frame chunks, each a baseline JPEG that
    ``decode_jpeg_pixels`` handles); other codecs keep the labeled
    stub fan-out — but the container-structure contract is exercised
    for real in both containers."""
    n = len(payload) if payload else 0
    if n >= 8 and bytes(payload[:4]) == b"\x1a\x45\xdf\xa3":
        return _decode_webm(bytes(payload))
    if n >= 12 and bytes(payload[:4]) == b"RIFF":
        try:
            scanned = _avi_scan(bytes(payload))
        except (ValueError, IndexError, struct.error):
            return None
        if scanned is None:
            return None
        meta, _ = scanned
        return {
            "format": "avi",
            "major_brand": meta["handler"],
            "timescale": 1_000_000,
            "duration_ms": meta["us_per_frame"]
            * (meta["total_frames"] or 0) // 1000,
            "n_tracks": meta["n_streams"] or 0,
            "width": meta["width"],
            "height": meta["height"],
        }
    if n < 16 or bytes(payload[4:8]) != b"ftyp":
        return None
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    saw_moov = saw_mdat = False
    try:
        for btype, body, bend in _mp4_boxes(payload, 0, n):
            if brand is None:
                if btype != b"ftyp" or bend - body < 8:
                    return None
                raw = bytes(payload[body:body + 4])
                if not raw.isascii():
                    return None
                brand = raw.decode("ascii").strip()
            elif btype == b"mdat":
                saw_mdat = True
            elif btype == b"moov":
                saw_moov = True
                for ityp, ib, ie in _mp4_boxes(payload, body, bend):
                    if ityp == b"mvhd":
                        # smallest valid body is v0 (20 bytes); a
                        # header-only mvhd ending at payload end would
                        # otherwise index past the buffer
                        if ie - ib < 20:
                            return None
                        ver = payload[ib]
                        if ver == 0 and ie - ib >= 20:
                            timescale = int.from_bytes(
                                payload[ib + 12:ib + 16], "big"
                            )
                            duration = int.from_bytes(
                                payload[ib + 16:ib + 20], "big"
                            )
                        elif ver == 1 and ie - ib >= 32:
                            timescale = int.from_bytes(
                                payload[ib + 20:ib + 24], "big"
                            )
                            duration = int.from_bytes(
                                payload[ib + 24:ib + 32], "big"
                            )
                        else:
                            return None
                        if timescale == 0:
                            return None
                    elif ityp == b"trak":
                        n_tracks += 1
                        for ttyp, tb, te in _mp4_boxes(payload, ib, ie):
                            # tkhd v0 body is 84 bytes; width/height
                            # are the final two 16.16 fixed-point
                            # fields (nonzero only on visual tracks)
                            if ttyp != b"tkhd" or te - tb < 84:
                                continue
                            w16 = int.from_bytes(
                                payload[te - 8:te - 4], "big"
                            )
                            h16 = int.from_bytes(
                                payload[te - 4:te], "big"
                            )
                            if width is None and w16 and h16:
                                width = w16 >> 16
                                height = h16 >> 16
    except (ValueError, IndexError, struct.error, OverflowError):
        return None
    if not saw_moov or not saw_mdat or timescale is None:
        return None
    return {
        "format": "mp4",
        "major_brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def video_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, is_decodable, format, major_brand, timescale, duration_ms,
    n_tracks, width, height) via Arrow-batched ``decode_video`` — real
    for MP4 containers, null for formats needing a codec library."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("is_decodable", BooleanType()),
            StructField("format", StringType()),
            StructField("major_brand", StringType()),
            StructField("timescale", LongType()),
            StructField("duration_ms", LongType()),
            StructField("n_tracks", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(decode_video)
            get = lambda k: metas.map(  # noqa: E731
                lambda m: m[k] if m else None
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "is_decodable": metas.map(lambda m: m is not None),
                    "format": get("format"),
                    "major_brand": get("major_brand"),
                    "timescale": get("timescale").astype("Int64"),
                    "duration_ms": get("duration_ms").astype("Int64"),
                    "n_tracks": get("n_tracks").astype("Int32"),
                    "width": get("width").astype("Int32"),
                    "height": get("height").astype("Int32"),
                }
            )

    return df.mapInPandas(decode_batches, schema)


def fake_decode(payload: bytes) -> dict:
    """Payload metadata: byte stats are always real; ``is_decodable``
    and dimensions are REAL for netpbm/BMP (``decode_image``) and a
    labeled stub (not-decodable) for codec formats this container
    cannot parse."""
    if payload is None:
        return {
            "n_bytes": 0, "first_byte": 0, "is_decodable": False,
            "format": None, "width": None, "height": None,
        }
    img = decode_image(payload)
    return {
        "n_bytes": len(payload),
        "first_byte": payload[0] if payload else 0,
        "is_decodable": img is not None,
        "format": img["format"] if img else None,
        "width": img["width"] if img else None,
        "height": img["height"] if img else None,
    }


def binary_meta(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """(id, n_bytes, first_byte, is_decodable, format, width, height)
    via Arrow-batched decode; dimensions are real for netpbm/BMP and
    null otherwise."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("n_bytes", LongType()),
            StructField("first_byte", IntegerType()),
            StructField("is_decodable", BooleanType()),
            StructField("format", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[payload_col].map(fake_decode)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": metas.map(lambda m: m["n_bytes"]).astype(
                        "int64"
                    ),
                    "first_byte": metas.map(
                        lambda m: m["first_byte"]
                    ).astype("int32"),
                    "is_decodable": metas.map(
                        lambda m: m["is_decodable"]
                    ),
                    "format": metas.map(lambda m: m["format"]),
                    "width": metas.map(lambda m: m["width"]).astype(
                        "Int32"
                    ),
                    "height": metas.map(lambda m: m["height"]).astype(
                        "Int32"
                    ),
                }
            )

    return df.mapInPandas(decode_batches, schema)


FRAME_STRIDE = 16


def frame_sample(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    every_n: int = 4,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """(id, frame_idx, frame_bytes): every ``every_n``-th frame of the
    payload (one input row → many output rows).  REAL for AVI
    containers (the actual ``movi`` video chunks from the RIFF walk,
    ``_avi_video_frames`` — for MJPEG AVIs each one is a baseline
    JPEG that ``decode_jpeg_pixels`` then decodes to pixels), for
    MP4 containers (the actual video-trak samples reconstructed from
    the ``stsz``/``stsc``/``stco`` sample tables,
    ``_mp4_video_frames``), for animated GIFs (each image
    descriptor re-wrapped as a standalone GIF that
    ``decode_gif_pixels`` decodes, ``_gif_video_frames``), AND for
    Matroska/WebM (Cluster SimpleBlock/Block walk with Xiph / fixed /
    EBML un-lacing, ``_mkv_video_frames``) — so
    video → frames runs end-to-end with no codec library for all
    four container families.  Other payloads keep the labeled
    deterministic byte-slicing stub (fixed ``stride`` chunks); a
    deployment swaps that for ffmpeg keyframe extraction — schema,
    batch iterator, and row fan-out are identical."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("frame_idx", LongType()),
            StructField("frame_bytes", df.schema[payload_col].dataType),
        ]
    )

    def sample_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                real = _avi_video_frames(payload)
                if real is None:
                    real = _mp4_video_frames(payload)
                if real is None:
                    real = _gif_video_frames(payload)
                if real is None:
                    real = _mkv_video_frames(payload)
                if real is not None:  # REAL container frames
                    for f in range(0, len(real), every_n):
                        ids.append(i)
                        idxs.append(f)
                        frames.append(real[f])
                    continue
                n_frames = len(payload) // stride
                for f in range(0, n_frames, every_n):
                    ids.append(i)
                    idxs.append(f)
                    frames.append(
                        bytes(payload[f * stride:(f + 1) * stride])
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(sample_batches, schema)


def video_pixel_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    every_n: int = 1,
) -> DataFrame:
    """(id, frame_idx, width, height, pixels): every ``every_n``-th
    COMPOSITED frame of a video payload as full-canvas RGB bytes
    (``compose_video_pixels`` — GIF disposal/transparency composition,
    AVI MS Video 1 skip-block persistence, AVI DIB/RLE repaints,
    Motion-JPEG samples in AVI or MP4).
    Payloads the engine cannot pixel-decode emit no rows — pair with
    ``frame_sample`` for the byte-level extraction that covers every
    container.  Arrow-batched mapInPandas, one input row → many
    output rows; partitioning by payload row is the unit of
    parallelism, exactly like ``frame_sample``."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("frame_idx", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("pixels", BinaryType()),
        ]
    )

    def compose_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, pxs = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                dec = compose_video_pixels(payload)
                if dec is None:
                    continue
                for f in range(0, len(dec["frames"]), every_n):
                    ids.append(i)
                    idxs.append(f)
                    ws.append(dec["width"])
                    hs.append(dec["height"])
                    pxs.append(dec["frames"][f])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "width": ws,
                 "height": hs, "pixels": pxs}
            )

    return df.mapInPandas(compose_batches, schema)


def resize_meta(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_side: int = 256,
) -> DataFrame:
    """(id, width, height, out_width, out_height, thumb): decode the
    payload's dimensions — REAL for netpbm/BMP/PNG/JPEG/GIF/TIFF/
    WebP/HEIF-AVIF headers (``decode_image``), stub (derived
    deterministically from
    the byte length) for undecodable payloads — compute
    aspect-preserving resize targets bounded by ``max_side``, and emit
    a thumbnail.  The thumbnail is REAL — nearest-neighbor resampled
    pixel bytes — wherever pixels decode codec-free: 8-bit non-palette
    PNG (``decode_png_pixels``, stdlib-zlib inflate + per-row
    unfilter), binary PPM (``_ppm_pixels``), GIF
    (``decode_gif_pixels``, pure-Python LZW + palette), TIFF —
    uncompressed / LZW / Deflate / PackBits / JPEG strips — and JPEG
    — sequential and progressive — (``decode_jpeg_pixels``,
    from-spec T.81 Huffman + IDCT).  Every image format this engine
    recognizes now pixel-decodes codec-free; the payload-prefix stub
    remains only for unrecognized payloads."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
            StructField("thumb", df.schema[payload_col].dataType),
        ]
    )

    def resize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "width", "height", "out_width", "out_height",
                "thumb",
            )}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                p = payload or b""
                img = decode_image(p)
                if img is not None:  # real header decode
                    w, h = img["width"], img["height"]
                else:
                    # STUB for codec formats: dims from the byte length
                    w = 64 + (len(p) % 1920)
                    h = 64 + ((len(p) * 7) % 1080)
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                pix = (
                    decode_png_pixels(p)
                    or _ppm_pixels(p)
                    or decode_gif_pixels(p)
                    or decode_tiff_pixels(p)
                    or decode_jpeg_pixels(p)
                    or decode_bmp_pixels(p)
                    or decode_ico_pixels(p)
                )
                if pix is not None:  # REAL resampled pixel bytes
                    thumb = _nn_resize(
                        pix["pixels"], w, h, pix["channels"], ow, oh
                    )
                else:  # labeled stub for entropy-coded formats
                    thumb = bytes(p[:32])
                rows[id_col].append(i)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["thumb"].append(thumb)
            yield pd.DataFrame(rows)

    return df.mapInPandas(resize_batches, schema)


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    dim: int = 64,
) -> DataFrame:
    """(id, embedding array<float>): payload → feature vector.  REAL
    pooled-pixel features wherever pixels decode codec-free (PNG via
    ``decode_png_pixels``, binary PPM via ``_ppm_pixels``, GIF, TIFF
    — all supported compressions — JPEG via ``decode_jpeg_pixels``,
    and BMP): the image is divided into a √dim x √dim grid and
    each cell's mean luminance (channel average) is scaled to [-1, 1)
    — a classic tiny-gist descriptor, deterministic, no model weights.
    Entropy-coded formats and non-image payloads get a REAL
    byte-distribution gist instead: component b is the COUNT of
    payload bytes whose value falls in bin b (256/dim-wide bins) — the
    bag-of-bytes descriptor.  Cosine over raw counts equals cosine
    over the normalized histogram (scale invariance), so it feeds the
    ANN operators unchanged, and counts are exact in float32 for any
    payload under 2^24 bytes per bin (a 16 MB crawl-payload cap the
    fetch layer already enforces in practice).  NULL/empty payloads
    embed as the zero vector.  The output column shape is exactly the
    `embeddings.embedding` schema, so the result feeds
    ann.with_buckets / ann_topk unchanged — binary column in,
    similarity-searchable vector out."""
    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    grid = max(1, int(dim ** 0.5))

    def embed(payload: bytes) -> list[float]:
        pix = (
            decode_png_pixels(payload)
            or _ppm_pixels(payload)
            or decode_gif_pixels(payload)
            or decode_tiff_pixels(payload)
            or decode_jpeg_pixels(payload)
            or decode_bmp_pixels(payload)
            or decode_ico_pixels(payload)
        )
        if pix is not None:  # REAL grid-pooled luminance features
            w, h, ch = pix["width"], pix["height"], pix["channels"]
            data = pix["pixels"]
            out = []
            for gy in range(grid):
                y0, y1 = gy * h // grid, max((gy + 1) * h // grid, gy * h // grid + 1)
                for gx in range(grid):
                    x0 = gx * w // grid
                    x1 = max((gx + 1) * w // grid, x0 + 1)
                    tot = cnt = 0
                    for y in range(y0, min(y1, h)):
                        for x in range(x0, min(x1, w)):
                            base = (y * w + x) * ch
                            tot += sum(data[base:base + ch])
                            cnt += ch
                    out.append(tot / cnt / 127.5 - 1.0 if cnt else 0.0)
            return (out + [0.0] * dim)[:dim]
        if not payload:
            return [0.0] * dim
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        # bin index = (byte * dim) >> 8: dim equal-width value bins
        idx = (arr.astype(np.int64) * dim) >> 8
        counts = np.bincount(idx, minlength=dim)[:dim]
        return counts.astype(np.float64).tolist()

    def feature_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": pdf[payload_col].map(embed),
                }
            )

    return df.mapInPandas(feature_batches, schema)
