"""Pure-Python MJPEG-in-AVI (RIFF) video decoder — the compressed-video
leg of the multimodal decoder contract (companions: functions/png.py,
functions/jpeg.py, functions/wav.py, functions/gif.py). Motion-JPEG is
the one compressed VIDEO container decodable without ffmpeg: every frame
is an independent JPEG, so the RIFF walk below reuses functions/jpeg.py
per frame and the frame-sampling stage
(operators/multimodal.extract_frame_features) becomes real for video
payloads, not just GIF frame sequences.

Scope: RIFF/'AVI ' container walk (chunk + LIST grammar, word-aligned
chunk padding, nested 'rec ' grouping lists inside 'movi'), the first
'vids' stream (MJPG fourcc or BI_JPEG-compressed strf), frame chunks
'##dc'/'##db' holding self-contained JPEGs (SOI-led; the MJPEG
default-Huffman shorthand — frames with DHT omitted — is rejected with a
specific message rather than misdecoded). Audio streams are skipped.
Modern codecs (h264/vp9/av1 in mp4/mkv/webm) are a genuine ffmpeg
boundary: pass their adapter as ``decoder=<callable>`` per the decoder
contract; the Spark plan does not change.

Raises ValueError on ANY invalid or truncated input; allocation is
bounded by functions/jpeg.py's shared geometry cap per frame plus the
frame-count cap here (the codec-family guarantees).

Validated in tests/test_ops.py by the gif.py methodology: a test-side
spec-derived RIFF writer wraps REAL production-encoder JPEGs
(tests/fixtures/python.jpg — itself cross-format-validated against the
same raster's PNG from an unrelated encoder) and every decoded frame
must be bit-identical to the direct jpeg_decode of the wrapped bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from medacy_spark.functions.jpeg import jpeg_decode

_MAX_FRAMES = 4096  # matches functions/gif.py's animation cap
# aggregate decoded-raster budget: per-frame geometry is capped by the
# JPEG codec's own _MAX_PIXELS, but a few-MB payload of many max-size
# frames would still accumulate n_frames*h*w*3 bytes of decoded frames —
# the same allocation-bomb class the JPEG SOF cap closes. 256M pixels
# ≈ 0.75 GB RGB, far above any legitimate fixture-scale clip.
_MAX_TOTAL_PIXELS = 256_000_000


def _u32(d: bytes, i: int) -> int:
    if i + 4 > len(d):
        raise ValueError("truncated AVI: short dword")
    return struct.unpack_from("<I", d, i)[0]


def _chunks(d: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a chunk run; enforces
    the RIFF word-alignment rule (odd-sized chunks carry a pad byte)."""
    while pos + 8 <= end:
        fourcc = d[pos : pos + 4]
        size = _u32(d, pos + 4)
        if pos + 8 + size > end:
            raise ValueError(f"truncated AVI chunk {fourcc!r}")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)
    if pos != end and pos + 8 > end and pos < end:
        # trailing bytes too short to be a chunk header
        raise ValueError("trailing garbage after last AVI chunk")


def _first_vids_stream(d: bytes, start: int, size: int) -> int:
    """Walk the hdrl LIST: return the stream index of the first 'vids'
    stream whose handler/compression says Motion-JPEG."""
    stream_no = 0
    vids_idx: int | None = None
    for fourcc, body, bsize in _chunks(d, start, start + size):
        if fourcc != b"LIST" or d[body : body + 4] != b"strl":
            continue
        fcc_type = fcc_handler = b""
        compression = b""
        for c4, cb, cs in _chunks(d, body + 4, body + bsize):
            if c4 == b"strh" and cs >= 8:
                fcc_type = d[cb : cb + 4]
                fcc_handler = d[cb + 4 : cb + 8]
            elif c4 == b"strf" and cs >= 20:
                compression = d[cb + 16 : cb + 20]
        if fcc_type == b"vids" and vids_idx is None:
            names = {fcc_handler.upper(), compression.upper()}
            if not names & {b"MJPG", b"JPEG", b"DMB1"}:
                raise ValueError(
                    f"AVI video stream is not Motion-JPEG "
                    f"(handler={fcc_handler!r}, compression={compression!r})"
                    " — modern codecs need the ffmpeg adapter"
                )
            vids_idx = stream_no
        stream_no += 1
    if vids_idx is None:
        raise ValueError("AVI contains no video ('vids') stream")
    return vids_idx


def _frame_chunks(d: bytes, start: int, size: int, tags: set[bytes]):
    """Yield (start, size) of the video stream's frame chunks inside a
    movi LIST, recursing into 'rec ' grouping lists."""
    for fourcc, body, bsize in _chunks(d, start, start + size):
        if fourcc == b"LIST" and d[body : body + 4] == b"rec ":
            yield from _frame_chunks(d, body + 4, bsize - 4, tags)
        elif fourcc in tags and bsize > 0:
            yield body, bsize


def avi_decode(payload: bytes) -> tuple[np.ndarray, float]:
    """bytes -> (frames, fps).

    frames is uint8 of shape (n_frames, height, width, 3): every MJPEG
    frame decoded by functions/jpeg.py (grayscale frames broadcast to
    RGB so one payload yields one dtype/shape). fps comes from the main
    header's dwMicroSecPerFrame (0.0 when absent/zero). Raises
    ValueError on ANY invalid input.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not an AVI: bad RIFF magic")
    total = _u32(payload, 4)
    if 8 + total > len(payload):
        raise ValueError("truncated AVI: RIFF size exceeds payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: RIFF form is not 'AVI '")

    usec_per_frame = 0
    vids_idx: int | None = None
    frame_spans: list[tuple[int, int]] = []
    for fourcc, body, bsize in _chunks(payload, 12, 8 + total):
        if fourcc != b"LIST":
            continue  # idx1 / JUNK / vendor chunks
        ltype = payload[body : body + 4]
        if ltype == b"hdrl":
            for c4, cb, cs in _chunks(payload, body + 4, body + bsize):
                if c4 == b"avih" and cs >= 4:
                    usec_per_frame = _u32(payload, cb)
            vids_idx = _first_vids_stream(payload, body + 4, bsize - 4)
        elif ltype == b"movi":
            if vids_idx is None:
                raise ValueError("AVI movi list before hdrl")
            tags = {
                f"{vids_idx:02d}dc".encode(),
                f"{vids_idx:02d}db".encode(),
            }
            frame_spans.extend(
                _frame_chunks(payload, body + 4, bsize - 4, tags)
            )

    if not frame_spans:
        raise ValueError("AVI contains no video frames")
    if len(frame_spans) > _MAX_FRAMES:
        raise ValueError("AVI frame count exceeds the decoder cap")

    frames: list[np.ndarray] = []
    for fstart, fsize in frame_spans:
        jp = payload[fstart : fstart + fsize]
        if jp[:2] != b"\xff\xd8":
            raise ValueError("AVI video chunk is not a JPEG (no SOI)")
        try:
            px = jpeg_decode(jp)
        except ValueError as e:
            if "huffman" in str(e).lower():
                raise ValueError(
                    "MJPEG frame omits its Huffman tables (the MJPEG "
                    "default-table shorthand) — unsupported"
                ) from None
            raise
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        if not frames:
            # geometry known after the FIRST frame: bound the aggregate
            # allocation before decoding the rest
            total = len(frame_spans) * px.shape[0] * px.shape[1]
            if total > _MAX_TOTAL_PIXELS:
                raise ValueError(
                    f"AVI demands {total} decoded pixels across "
                    f"{len(frame_spans)} frames, exceeds decode cap"
                )
        elif px.shape != frames[0].shape:
            raise ValueError("AVI frames disagree on geometry")
        frames.append(px)
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return np.stack(frames), fps


def avi_feature_decoder(payload: bytes, meta) -> list[float]:
    """Decoder-contract adapter (mirrors gif_feature_decoder): 25-dim
    features = the shared 23-dim raster stats of the FIRST frame +
    [n_frames, fps]. Non-AVI payloads raise (→ ok=False rows)."""
    from medacy_spark.functions.png import raster_features

    frames, fps = avi_decode(payload)
    return raster_features(frames[0]) + [float(len(frames)), float(fps)]
