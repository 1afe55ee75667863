"""Pure-Python/numpy GIF decoder (GIF87a/GIF89a) — the frame-sequence
("video") leg of the multimodal decoder contract (companions:
functions/png.py, functions/jpeg.py, functions/wav.py). Animated GIF is
the one real multi-frame format decodable without ffmpeg, so it powers a
REAL frame-sampling stage (operators/multimodal.extract_frame_features)
instead of the index-only plan stub.

Scope: full LZW decompression (variable code width, clear/EOI codes,
4096-entry dictionary), global and local color tables, interlaced
images (4-pass), transparency, and animation composition with disposal
methods 0/1 (keep), 2 (restore to background = transparent), and
3 (restore to previous). Every frame is composited onto the logical
screen and returned as an RGBA raster.

Raises ValueError on ANY invalid input (bad magic, truncated blocks,
palette index out of range, LZW stream overrunning the declared
geometry). Allocation is bounded by the header-declared logical-screen
size, capped — the PNG decompression-bomb lesson: a crafted LZW stream
cannot allocate past width*height per frame, and frame count is capped.

Validated in tests/test_ops.py against real encoders via cross-format
ground truth: CPython's test-suite ships the same raster as python.gif
(email test data) and the python.png already pinned for the PNG codec,
so the GIF decode is checked pixel-level against an unrelated encoder's
PNG of the same image; idlelib's Tk icons exercise palette+transparency.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 64_000_000  # per logical screen; matches codec-family caps
_MAX_FRAMES = 4096


class _Reader:
    def __init__(self, d: bytes) -> None:
        self.d = d
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.d):
            raise ValueError("truncated GIF")
        out = self.d[self.i : self.i + n]
        self.i += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks up to the 0x00 terminator."""
        parts = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(parts)
            parts.append(self.take(n))


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first codes, width grows from min+1 up to 12
    bits, dictionary resets on CLEAR. Output is capped at max_pixels —
    overrun raises instead of allocating."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = fresh()
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return np.frombuffer(bytes(out), dtype=np.uint8)
            if prev is None:
                if code >= len(table):
                    raise ValueError("GIF LZW first code out of range")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("GIF LZW code out of range")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("GIF LZW output exceeds declared geometry")
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    # streams missing an explicit EOI are common in the wild; the pixel
    # count check downstream still validates the geometry
    return np.frombuffer(bytes(out), dtype=np.uint8)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _color_table(r: _Reader, flag: int, size_bits: int) -> np.ndarray | None:
    if not flag:
        return None
    n = 2 << size_bits
    raw = np.frombuffer(r.take(3 * n), dtype=np.uint8)
    return raw.reshape(n, 3)


def gif_decode(payload: bytes) -> tuple[np.ndarray, list[int]]:
    """bytes -> (frames, delays_cs).

    frames is uint8 of shape (n_frames, height, width, 4): each frame is
    the fully composited logical screen (disposal applied) in RGBA.
    delays_cs is the per-frame delay in centiseconds (0 for still
    images). Raises ValueError on ANY invalid input.
    """
    try:
        return _decode(_Reader(payload))
    except (struct.error, IndexError) as e:  # pragma: no cover - belt
        raise ValueError(f"corrupt GIF: {e}") from None


def _decode(r: _Reader) -> tuple[np.ndarray, list[int]]:
    magic = r.take(6)
    if magic not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad magic")
    width, height = r.u16(), r.u16()
    if width < 1 or height < 1 or width * height > _MAX_PIXELS:
        raise ValueError(f"unsupported GIF geometry {width}x{height}")
    packed = r.u8()
    r.u8()  # background color index (composition uses transparency)
    r.u8()  # pixel aspect ratio
    gct = _color_table(r, packed & 0x80, packed & 0x07)

    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image
    transparent: int | None = None
    disposal = 0
    delay = 0

    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = r.u8()
            data = r.sub_blocks()
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise ValueError("short GIF graphic control extension")
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                delay = struct.unpack("<H", data[1:3])[0]
                transparent = data[3] if flags & 0x01 else None
            continue  # comment/app/plain-text: skipped
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        left, top, w, h = r.u16(), r.u16(), r.u16(), r.u16()
        if left + w > width or top + h > height or w < 1 or h < 1:
            raise ValueError("GIF frame rectangle outside logical screen")
        ipacked = r.u8()
        lct = _color_table(r, ipacked & 0x80, ipacked & 0x07)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF image with no color table")
        interlaced = bool(ipacked & 0x40)
        min_code = r.u8()
        idx = _lzw_decode(min_code, r.sub_blocks(), w * h)
        if len(idx) < w * h:
            raise ValueError("GIF LZW stream shorter than frame geometry")
        idx = idx[: w * h].reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index out of palette range")
        if interlaced:
            idx = _deinterlace(idx)

        saved = canvas.copy() if disposal == 3 else None
        rgba = np.dstack([palette[idx], np.full((h, w), 255, np.uint8)])
        if transparent is not None:
            mask = idx == transparent
            region = canvas[top : top + h, left : left + w]
            rgba[mask] = region[mask]
        canvas[top : top + h, left : left + w] = rgba
        frames.append(canvas.copy())
        delays.append(delay)
        if len(frames) > _MAX_FRAMES:
            raise ValueError("GIF frame count exceeds the decoder cap")

        if disposal == 2:
            canvas[top : top + h, left : left + w] = 0
        elif disposal == 3:
            canvas = saved
        transparent, disposal, delay = None, 0, 0

    if not frames:
        raise ValueError("GIF contains no image frames")
    return np.stack(frames), delays


def gif_frame_rgb(frame: np.ndarray) -> np.ndarray:
    """RGBA frame -> RGB composited over black (alpha-weighted), uint8."""
    rgb = frame[:, :, :3].astype(np.float64)
    alpha = frame[:, :, 3:4].astype(np.float64) / 255.0
    return (rgb * alpha).round().astype(np.uint8)


def gif_feature_decoder(payload: bytes, meta) -> list[float]:
    """Decoder-contract adapter: 25-dim features = the shared 23-dim
    raster stats of the FIRST composited frame (RGB over black) +
    [n_frames, total_duration_cs]. Non-GIF payloads raise (→ ok=False
    rows)."""
    from medacy_spark.functions.png import raster_features

    frames, delays = gif_decode(payload)
    return raster_features(gif_frame_rgb(frames[0])) + [
        float(len(frames)),
        float(sum(delays)),
    ]
