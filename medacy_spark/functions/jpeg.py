"""Pure-Python/numpy baseline JPEG (JFIF) decoder — the second real
codec behind the multimodal decoder contract (companion to
functions/png.py; VERDICT r5 #6: most real web media is JPEG).

Scope: baseline sequential DCT, 8-bit samples (SOF0, and SOF1's
extended-sequential which decodes identically), grayscale or 3-component
YCbCr with any sampling factors (4:4:4, 4:2:2, 4:2:0 all fall out of the
general MCU layout), restart intervals, multi-table DQT/DHT segments —
and, since round 6, PROGRESSIVE (SOF2): spectral selection, successive
approximation (DC and AC first + refinement passes, EOB runs with
correction bits), interleaved DC scans, non-interleaved per-component
AC scans over subsampled block grids. Arithmetic coding, 12-bit
precision, lossless and hierarchical modes raise ValueError with a
specific message — the documented container boundary shrinks to those.

Raises ValueError on ANY invalid or unsupported input (truncated
segments, bad huffman streams, stray markers); the feature adapter
relies on that contract to flag corrupt rows instead of crashing the
executor batch.

Like the PNG codec, the entropy loop walks bits in Python — sized for
fixture-scale rasters inside Arrow batches; a production image pipeline
swaps in PIL/libjpeg through the same decoder contract with zero plan
changes.

Validated in tests/test_ops.py against real encoders via cross-FORMAT
ground truth: CPython's test-suite ships the same raster as python.jpg
and python.png, so the JPEG decode is checked against the (exact) PNG
decode of an unrelated encoder's output; IPython's 2x2.jpg matches its
2x2.png the same way. The progressive machinery is validated against
test-side spec-derived ENCODERS: the same coefficient store encoded
baseline and progressive must decode to bit-identical pixels
(test_jpeg_progressive_equals_baseline_on_same_coefficients), plus a
real production-encoder progressive photo with pinned stats.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 1-D DCT-III (inverse DCT-II) basis: spatial = M.T @ coeffs @ M
_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])

# Shared codec-family decode cap (gif.py uses the same raw-pixel bound;
# png.py bounds the inflate stream). SOF height/width are u16 and sampling
# factors reach 4, so a crafted ~20-byte header can otherwise demand
# tens-of-GB coefficient stores / sample planes before any entropy data is
# read — calloc succeeds and the executor is OOM-killed when the scan
# touches pages, outside the per-row ValueError containment.
_MAX_PIXELS = 64_000_000
# The MCU-padded per-component block grids (and the progressive int64
# coefficient stores, same element count) are what actually get allocated:
# subsampling inflates them up to (hmax*vmax)x the raw geometry. 4x the
# raw cap admits every real sampling layout (4:4:4 totals 3x raw) while
# rejecting crafted 16x blow-ups at max geometry.
_MAX_PADDED_PIXELS = 4 * _MAX_PIXELS

_UNSUPPORTED_SOF = {
    0xC3: "lossless JPEG not supported",
    0xC5: "differential JPEG not supported",
    0xC6: "progressive JPEG not supported",
    0xC7: "lossless JPEG not supported",
    0xC9: "arithmetic-coded JPEG not supported",
    0xCA: "arithmetic-coded JPEG not supported",
    0xCB: "arithmetic-coded JPEG not supported",
    0xCD: "arithmetic-coded JPEG not supported",
    0xCE: "arithmetic-coded JPEG not supported",
    0xCF: "arithmetic-coded JPEG not supported",
}


class _Bits:
    """Bit reader over the entropy-coded scan: 0xFF00 byte stuffing is
    consumed transparently; RSTn markers are surfaced to the MCU loop."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def _next_byte(self) -> int:
        d, i = self.d, self.i
        if i >= len(d):
            raise ValueError("JPEG entropy stream truncated")
        b = d[i]
        if b == 0xFF:
            if i + 1 >= len(d):
                raise ValueError("JPEG entropy stream truncated at marker")
            m = d[i + 1]
            if m == 0x00:
                self.i = i + 2
                return 0xFF
            raise ValueError(f"unexpected marker 0x{m:02x} inside scan")
        self.i = i + 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Consume padding + the RSTn marker between restart intervals."""
        self.n = 0
        d = self.d
        if self.i + 1 >= len(d) or d[self.i] != 0xFF:
            raise ValueError("expected restart marker")
        m = d[self.i + 1]
        if m != 0xD0 + (expect & 7):
            raise ValueError(f"bad restart marker 0x{m:02x}")
        self.i += 2


def _huff_decode(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | bits.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG scan")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> (height, width, channels) uint8 array (channels 1
    for grayscale, 3 for RGB after the JFIF YCbCr transform). Raises
    ValueError on any invalid or unsupported input."""
    try:
        return _decode(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG: {e}") from None


def _decode(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    prog_coefs = None
    restart_interval = 0
    i = 2
    while True:
        if i + 2 > len(data):
            raise ValueError("JPEG truncated before SOS")
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        marker = data[i + 1]
        if marker == 0xD9:
            if prog_coefs is not None and frame.get("any_scan"):
                return _render_progressive(frame, prog_coefs, qt)
            raise ValueError("EOI before scan data")
        if i + 4 > len(data):
            raise ValueError("JPEG truncated before SOS")
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        seg = data[i + 4 : i + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        if marker in _UNSUPPORTED_SOF:
            raise ValueError(_UNSUPPORTED_SOF[marker])
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if tbl.size != 64:
                    raise ValueError("short DQT table")
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq,
                })
                if not (1 <= samp >> 4 <= 4 and 1 <= samp & 15 <= 4):
                    raise ValueError("bad sampling factors")
            if h < 1 or w < 1 or h * w > _MAX_PIXELS:
                raise ValueError(f"JPEG geometry {w}x{h} exceeds decode cap")
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            padded = sum(
                (mcuy * c["v"] * 8) * (mcux * c["h"] * 8) for c in comps
            )
            if padded > _MAX_PADDED_PIXELS:
                raise ValueError(
                    f"JPEG sampling layout demands {padded} padded pixels,"
                    " exceeds decode cap"
                )
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if marker == 0xC2:
                # progressive: coefficients accumulate across scans in
                # the MCU-padded block grid of each component
                frame["mcux"], frame["mcuy"] = mcux, mcuy
                prog_coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                    for c in comps
                ]
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1 : j + 17]
                if len(counts) != 16:
                    raise ValueError("short DHT counts")
                j += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        if j >= len(seg):
                            raise ValueError("short DHT symbols")
                        table[(length, code)] = seg[j]
                        code += 1
                        j += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (k for k in frame["comps"] if k["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((comp, tbl >> 4, tbl & 15))
            if frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahl = seg[3 + 2 * ns]
                i = _progressive_scan(
                    data, i + 2 + seglen, frame, scan, prog_coefs, huff,
                    restart_interval, ss, se, ahl >> 4, ahl & 15,
                )
                frame["any_scan"] = True
                continue
            if ns != len(frame["comps"]):
                raise ValueError("non-interleaved scans not supported")
            return _decode_scan(
                data, i + 2 + seglen, frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + seglen


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
    for c, td, ta in scan:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing huffman table for scan")
    bits = _Bits(data, pos)
    pred = [0] * len(comps)
    rst = 0
    n_mcu = mcux * mcuy
    # constant per scan component: the DQT table scattered from zigzag to
    # natural order, and the target plane index — hoisted out of the
    # Python-bound MCU loop (for a 720x477 4:2:0 image the block loop
    # otherwise repeats this ~32k times)
    comp_qnat = []
    comp_plane = []
    for c, _, _ in scan:
        qnat = np.zeros(64, dtype=np.float64)
        qnat[_ZIGZAG] = qt[c["tq"]]
        comp_qnat.append(qnat)
        comp_plane.append(comps.index(c))
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bits.align_restart(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, (c, td, ta) in enumerate(scan):
            dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    t = _huff_decode(bits, dc_tbl)
                    if t > 11:
                        raise ValueError("bad DC magnitude")
                    pred[ci] += _extend(bits.receive(t), t)
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(bits, ac_tbl)
                        r, s = sym >> 4, sym & 15
                        if s == 0:
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            raise ValueError(f"bad AC symbol 0x{sym:02x}")
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(bits.receive(s), s)
                        k += 1
                    # coef is natural order (zigzag applied at store
                    # time); comp_qnat holds the DQT table already
                    # scattered to natural order
                    block = (coef * comp_qnat[ci]).reshape(8, 8)
                    spatial = _M.T @ block @ _M + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[comp_plane[ci]][y0 : y0 + 8, x0 : x0 + 8] = spatial
    out = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer sampling ratio")
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(up[:h, :w])
    if len(out) == 1:
        img = out[0][:, :, None]
    else:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        img = np.stack([r, g, b], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _progressive_scan(data, pos, frame, scan, coefs, huff, ri, ss, se, ah, al):
    """Decode ONE progressive scan (T.81 G.2) into the per-component
    coefficient store, returning the byte position of the next marker.

    Spectral selection: ss==se==0 is a DC scan (interleaved over the MCU
    grid when it covers several components, else the component's own
    block grid); ss>0 is an AC scan, always single-component. Successive
    approximation: ah==0 is the first pass for the band (values arrive
    shifted left al); ah>0 refines one bit per coefficient (libjpeg's
    decode_mcu_*_refine structure, including EOB-run correction bits)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with nonzero Se")
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must cover one component")
        if not ss <= se <= 63:
            raise ValueError("bad progressive spectral band")
    for c, td, ta in scan:
        if ss == 0 and ah == 0 and (0, td) not in huff:
            raise ValueError("missing DC huffman table for scan")
        if ss > 0 and (1, ta) not in huff:
            raise ValueError("missing AC huffman table for scan")
    bits = _Bits(data, pos)
    rst = 0
    eobrun = 0
    pred = [0] * len(scan)

    def restart():
        nonlocal eobrun, rst, pred
        bits.align_restart(rst)
        rst = (rst + 1) & 7
        eobrun = 0
        pred = [0] * len(scan)

    p1, m1 = 1 << al, -(1 << al)

    def refine_nonzero(block, k):
        # correction bit for an already-nonzero coefficient (T.81 G.1.2.3)
        if bits.bit() and not block[k] & p1:
            block[k] += p1 if block[k] >= 0 else m1

    if len(scan) > 1:  # interleaved DC scan over the MCU grid
        mcux, mcuy = frame["mcux"], frame["mcuy"]
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                restart()
            my, mx = divmod(m, mcux)
            for ci, (c, td, _ta) in enumerate(scan):
                arr = coefs[comps.index(c)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y, x = my * c["v"] + by, mx * c["h"] + bx
                        if ah == 0:
                            t = _huff_decode(bits, huff[(0, td)])
                            if t > 11:
                                raise ValueError("bad DC magnitude")
                            pred[ci] += _extend(bits.receive(t), t)
                            arr[y, x, 0] = pred[ci] << al
                        elif bits.bit():
                            arr[y, x, 0] |= p1
        return _next_marker(data, bits.i)

    # non-interleaved scan: the component's own block grid
    c, td, ta = scan[0]
    arr = coefs[comps.index(c)]
    comp_w = -(-frame["w"] * c["h"] // hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    bw, bh = -(-comp_w // 8), -(-comp_h // 8)
    ac_tbl = huff.get((1, ta))
    for m in range(bw * bh):
        if ri and m and m % ri == 0:
            restart()
        y, x = divmod(m, bw)
        block = arr[y, x]
        if ss == 0:  # DC band
            if ah == 0:
                t = _huff_decode(bits, huff[(0, td)])
                if t > 11:
                    raise ValueError("bad DC magnitude")
                pred[0] += _extend(bits.receive(t), t)
                block[0] = pred[0] << al
            elif bits.bit():
                block[0] |= p1
            continue
        if ah == 0:  # AC first pass for this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_decode(bits, ac_tbl)
                r, s = sym >> 4, sym & 15
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += bits.receive(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past spectral band")
                block[_ZIGZAG[k]] = _extend(bits.receive(s), s) << al
                k += 1
            continue
        # AC refinement pass
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _huff_decode(bits, ac_tbl)
                r, s = sym >> 4, sym & 15
                val = 0
                if s == 0:
                    if r != 15:  # EOB run (current block finishes below)
                        eobrun = 1 << r
                        if r:
                            eobrun += bits.receive(r)
                        break
                    # r == 15: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement symbol")
                    val = p1 if bits.bit() else m1
                while k <= se:
                    z = _ZIGZAG[k]
                    if block[z] != 0:
                        refine_nonzero(block, z)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("AC refinement past spectral band")
                    block[_ZIGZAG[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                z = _ZIGZAG[k]
                if block[z] != 0:
                    refine_nonzero(block, z)
                k += 1
            eobrun -= 1
    return _next_marker(data, bits.i)


def _next_marker(data: bytes, i: int) -> int:
    """Skip any padding after a scan's entropy data to the next real
    marker (not byte stuffing, not a stray RSTn)."""
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (
            0xD0 <= data[i + 1] <= 0xD7
        ):
            return i
        i += 1
    raise ValueError("JPEG truncated after progressive scan")


def _render_progressive(frame, coefs, qt):
    """Dequantize + IDCT the accumulated coefficient store (vectorized
    over all blocks — unlike the sequential path there is no entropy
    interleaving to honor here) and compose the image."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out = []
    for c, arr in zip(comps, coefs):
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        qnat = np.zeros(64, dtype=np.float64)
        qnat[_ZIGZAG] = qt[c["tq"]]
        by, bx, _ = arr.shape
        blocks = (arr.astype(np.float64) * qnat).reshape(by, bx, 8, 8)
        spatial = np.matmul(_M.T, np.matmul(blocks, _M)) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise ValueError("non-integer sampling ratio")
        up = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(up[:h, :w])
    if len(out) == 1:
        img = out[0][:, :, None]
    else:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        img = np.stack([r, g, b], axis=2)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def jpeg_feature_decoder(payload: bytes, meta) -> list[float]:
    """Decoder-contract adapter (same 23-dim feature layout as
    png.png_feature_decoder): real pixel statistics from the decoded
    raster; non-JPEG payloads raise -> ok=False rows."""
    from medacy_spark.functions.png import raster_features

    return raster_features(jpeg_decode(payload))
