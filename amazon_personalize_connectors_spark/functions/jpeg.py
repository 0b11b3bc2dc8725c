"""Pure-stdlib baseline JPEG decoder (ITU-T T.81 sequential DCT,
Huffman entropy coding) — closes the "most real image corpora are
JPEG" gap in ``multimodal.real_decoder`` without external codec
libraries: segment parse, canonical Huffman decode, dequantize +
dezigzag, 8x8 IDCT (numpy), restart-marker handling, chroma
upsampling for 4:4:4 / 4:2:2 / 4:2:0, YCbCr -> RGB.

Scope (documented boundary, mirrors the rest of multimodal.py):
baseline and extended-sequential Huffman scans (SOF0/SOF1), 8-bit
precision, grayscale or YCbCr. Progressive (SOF2), arithmetic
coding, hierarchical, and 12-bit scans raise NotImplementedError —
they are rare in training corpora and explicitly out of scope.

This is a correctness/coverage decoder, not a throughput codec: at
100 TB you wire libjpeg-turbo via PIL into ``decode_media``'s
Decoder slot; this module keeps the pipeline REAL (bytes -> pixels)
in environments with only the standard library + numpy.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> natural (row-major) coefficient index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

_SOF_UNSUPPORTED = {
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _idct_matrix():
    import numpy as np

    x = np.arange(8)
    u = x.reshape(-1, 1)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one entropy-coded (restart) segment;
    byte stuffing (FF 00) is removed before construction."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # T.81 F.2.2.5: pad past the end with zero bits
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huffman(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def jpeg_pixels(content: bytes, max_pixels: int = 64_000_000):
    """Decode a baseline/extended-sequential Huffman JPEG to an
    (h, w, nch) uint8 array — nch 1 (grayscale) or 3 (RGB, converted
    from YCbCr). Raises NotImplementedError for out-of-scope coding
    modes (progressive, arithmetic, 12-bit).

    ``max_pixels`` is the decompression-bomb guard: a 200-byte file
    can declare 65535x65535 and demand a 12 GiB decode — the header
    is validated BEFORE any allocation or MCU work. Size the cap to
    the batch memory budget when decoding untrusted corpora."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them so the byte after the run is read as the
        # marker instead of being parsed as a segment length
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(content):
            break
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        seg = content[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = list(seg[i : i + 64])
                    i += 64
                else:  # 16-bit table
                    qt[tq] = [
                        struct.unpack(">H", seg[i + 2 * k : i + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                huff[(tc, th)] = _build_huffman(
                    counts, seg[i + 17 : i + 17 + n]
                )
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} (only 8-bit supported)"
                )
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if width * height > max_pixels:
                raise ValueError(
                    f"JPEG declares {width}x{height} pixels — beyond "
                    f"max_pixels={max_pixels} (decompression-bomb guard)"
                )
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} not supported — "
                "baseline/extended-sequential Huffman only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append(
                    {"id": cid, "dc": tdta >> 4, "ac": tdta & 15}
                )
            scan = (scan_comps, pos)
            break
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    scan_comps, data_start = scan

    # ---- entropy-coded data: strip stuffing, split at RST markers ----
    segments: list[bytes] = []
    cur = bytearray()
    i = data_start
    while i < len(content):
        b = content[i]
        if b == 0xFF:
            nxt = content[i + 1] if i + 1 < len(content) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan (EOI, next SOS...)
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    # ---- MCU geometry ----
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []  # interleaved component order within an MCU
    for sc in scan_comps:
        c = by_id[sc["id"]]
        order.append(
            {
                "c": c,
                "dc_tab": huff[(0, sc["dc"])],
                "ac_tab": huff[(1, sc["ac"])],
                "qt": qt[c["tq"]],
            }
        )
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype="f8"
        )
        for c in comps
    }
    a = _idct_matrix()
    at = a.T

    seg_idx = 0
    reader = _BitReader(segments[0])
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError(
                        f"truncated entropy stream: expected restart "
                        f"segment {seg_idx} but only {len(segments)} "
                        f"present"
                    )
                reader = _BitReader(segments[seg_idx])
                dc_pred = {c["id"]: 0 for c in comps}
            for entry in order:
                c, q = entry["c"], entry["qt"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype="f8")
                        t = reader.read_huffman(entry["dc_tab"])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        dc_pred[c["id"]] += diff
                        coef[0] = dc_pred[c["id"]] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.read_huffman(entry["ac_tab"])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            coef[k] = (
                                _extend(reader.read_bits(s), s) * q[k]
                            )
                            k += 1
                        block = np.zeros((8, 8), dtype="f8")
                        block.flat[ZIGZAG] = coef
                        pix = at @ block @ a + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # ---- crop to component dims, upsample, color-convert ----
    out_planes = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        p = planes[c["id"]][:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            if hmax % c["h"] or vmax % c["v"]:
                raise NotImplementedError(
                    "non-integer JPEG sampling ratio"
                )
            p = p.repeat(vmax // c["v"], axis=0).repeat(
                hmax // c["h"], axis=1
            )
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype("u1")
        return gray.reshape(h, w, 1)
    if len(out_planes) != 3:
        raise NotImplementedError(
            f"JPEG with {len(out_planes)} components (CMYK?) not supported"
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype("u1")


# --------------------------------------------------------------------------
# Baseline JPEG ENCODER — the write side of the codec: thumbnail/preview
# sinks re-encode resized tensors without external libraries. Simple
# canonical tables (12 DC categories at length 4; all 162 AC run/size
# symbols at length 8) and a UNIFORM quantization table — valid JPEG
# that any decoder reads; not size-optimized (no optimized Huffman,
# no quality curves). quant=1 is near-lossless (DCT rounding only).
# --------------------------------------------------------------------------

_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _canonical_codes(counts, symbols):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _encode_block(writer, block, dc_pred: int, quant: int) -> int:
    a = _idct_matrix()
    coef = a @ (block - 128.0) @ a.T
    zz = np.round(coef.flat[ZIGZAG] / quant).astype(int)
    diff = int(zz[0]) - dc_pred
    t = int(abs(diff)).bit_length()
    length, code = _DC_CODES[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]
            writer.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        length, code = _AC_CODES[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = _AC_CODES[0x00]
        writer.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def jpeg_encode(
    rgb,
    subsample: bool = False,
    restart_interval: int = 0,
    quant: int = 1,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as a
    baseline JFIF JPEG — 4:4:4 by default, 4:2:0 with box-averaged
    chroma when ``subsample``; ``quant`` is a uniform quantization
    value (1 = near-lossless, larger = smaller/lossier)."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        planes = [rgb.astype("f8")]
        factors = [(1, 1)]
    else:
        x = rgb.astype("f8")
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
        cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]
        if subsample:
            hp, wp = h + (h % 2), w + (w % 2)
            cbp = np.pad(cb, ((0, hp - h), (0, wp - w)), mode="edge")
            crp = np.pad(cr, ((0, hp - h), (0, wp - w)), mode="edge")
            cb = cbp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            factors = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        ph, pw = mcus_y * fv * 8, mcus_x * fh * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([min(quant, 255)] * 64))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (fh, fv) in enumerate(factors):
        sof += bytes([i + 1, (fh << 4) | fv, 0])
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMBOLS)
        + bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMBOLS),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    writer = _BitWriter()
    dc_pred = [0] * ncomp
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
                dc_pred = [0] * ncomp
            for ci, (p, (fh, fv)) in enumerate(zip(padded, factors)):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        dc_pred[ci] = _encode_block(
                            writer,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            dc_pred[ci],
                            max(1, quant),
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
