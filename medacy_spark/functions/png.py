"""Pure-Python/numpy PNG codec for the multimodal decode stage.

The container ships no image codec libraries (PIL/ffmpeg), but PNG needs
only ``zlib`` (stdlib) plus numpy for the scanline unfiltering — so the
multimodal pipeline's image branch gets a REAL pixel decoder instead of
the byte-histogram stand-in. The decoder implements the public PNG
specification (RFC 2083 / W3C PNG): 8-byte signature, length-typed
chunks, IHDR geometry, zlib-inflated IDAT scanlines, and the five
per-scanline filters (None/Sub/Up/Average/Paeth), for bit depth 8 in
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha) and
6 (RGBA), non-interlaced.

Scale posture: this runs INSIDE the Arrow batch of
operators/multimodal.extract_media_features — per-row pure function, no
I/O, so the plumbing (partitioning, batch shape, per-row error
flagging) is exactly the production topology. Unfiltering walks
scanlines sequentially (the filters are defined recursively on the
previous row/pixel) with numpy vector ops per row; for production-size
rasters swap in PIL via the same decoder contract — the interface and
plan do not change.

The matching encoder exists for fixture generation and round-trip
property tests; it can emit any fixed filter type per row so every
decode branch is exercised against independently-constructed input.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per color type (palette counts as 1 index channel pre-lookup)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        expect = struct.unpack(">I", data[off + 8 + length : off + 12 + length])[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != expect:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        off += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline position (a=left,
    b=up, c=upper-left), all int16 to avoid uint8 wraparound in p."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def png_decode(payload: bytes) -> np.ndarray:
    """payload -> (height, width, channels) uint8 array.

    Palette images (color type 3) come back expanded to RGB; gray+alpha
    and RGBA keep their alpha channel. Raises ValueError on ANY invalid
    or unsupported input — truncated chunks (struct.error) and corrupt
    deflate streams (zlib.error) included, so callers following the
    documented except-ValueError pattern never crash on garbage — the
    multimodal stage additionally converts per-row raises to ok=False
    rows.
    """
    try:
        return _decode(bytes(payload))
    except (struct.error, zlib.error) as e:
        raise ValueError(f"corrupt PNG: {e}") from None


def _decode(payload: bytes) -> np.ndarray:
    width = height = None
    ctype_num = None
    palette = None
    idat = bytearray()
    for ctype, body in _chunks(payload):
        if ctype == b"IHDR":
            width, height, depth, ctype_num, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype_num not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype_num}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[ctype_num]
    stride = width * ch
    # bounded inflate: cap decompression at the expected scanline payload
    # (+1 to detect overlong streams) so a crafted small-geometry PNG with
    # a high-ratio deflate stream cannot balloon executor memory before
    # the size check fires — decoding untrusted corpora is the normal case
    expected = height * (stride + 1)
    dec = zlib.decompressobj()
    inflated = dec.decompress(bytes(idat), expected + 1)
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if (raw.size != expected or dec.unconsumed_tail or dec.unused_data
            or not dec.eof):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ft = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int16)
        if ft == 0:  # None
            rec = line
        elif ft == 2:  # Up
            rec = (line + prior) & 0xFF
        elif ft == 1:  # Sub — left-neighbor recursion, per-pixel walk
            rec = line.copy()
            for i in range(ch, stride):
                rec[i] = (rec[i] + rec[i - ch]) & 0xFF
        elif ft == 3:  # Average
            rec = line.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = line.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                ul = prior[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + _paeth(np.int16(left), prior[i], np.int16(ul))) & 0xFF
            # numpy scalar path above keeps arithmetic int16-safe
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prior = rec
    img = out.reshape(height, width, ch)
    if ctype_num == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        # a pixel index past the palette would otherwise surface as a
        # numpy IndexError, breaking the documented raises-ValueError
        # contract for corrupt input
        if idx.size and int(idx.max()) >= len(palette):
            raise ValueError("palette PNG pixel index out of range")
        img = palette[idx]
    return img


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes, every scanline
    filtered with ``filter_type`` (0-4) so round-trip tests can target
    each decode branch with independently-built input."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype_num = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prior) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = (cur - ((left + prior) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int16), prior[:-ch]])
            enc = (cur - _paeth(left, prior, ul)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prior = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_num, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


# Fixed feature layout: geometry + global stats + 16-bin luminance
# histogram — constant dimensionality per the decoder contract
# (operators/multimodal.extract_media_features docstring).
PNG_FEATURE_DIM = 7 + 16


def png_feature_decoder(payload: bytes, meta) -> list[float]:
    """Decoder-contract adapter: real pixel statistics from the decoded
    raster. Non-PNG payloads raise (→ ok=False rows), PNGs produce
    [width, height, channels, mean, std, min, max, hist16...] where the
    histogram is over per-pixel luminance (mean across color channels),
    normalized to sum 1."""
    return raster_features(png_decode(payload))


def raster_features(img: np.ndarray) -> list[float]:
    """The shared 23-dim feature layout every codec adapter emits
    (png/jpeg/fake): [width, height, channels, mean, std, min, max,
    hist16...] with the histogram over per-pixel luminance (mean across
    color channels), normalized to sum 1."""
    h, w, ch = img.shape
    pix = img.astype(np.float64)
    lum = pix[:, :, : min(ch, 3)].mean(axis=2)
    hist, _ = np.histogram(lum, bins=16, range=(0.0, 256.0))
    hist = hist / max(hist.sum(), 1)
    return [
        float(w), float(h), float(ch),
        float(pix.mean()), float(pix.std()), float(pix.min()), float(pix.max()),
        *[float(v) for v in hist],
    ]
