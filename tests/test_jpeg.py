"""Baseline JPEG decoder vs an independent test-side encoder.

The encoder below writes spec-conformant baseline JPEG (T.81: SOI/DQT/DHT/
SOF0/SOS/EOI, canonical Huffman tables declared via DHT, forward DCT +
quantization, byte stuffing, optional 4:2:0 subsampling, optional restart
intervals) — so the decoder must exercise real marker parsing, Huffman
decoding, dequantize/IDCT, upsampling, and color conversion. With an
all-ones quant table the pipeline is near-lossless: decode(encode(img))
must match within a small absolute tolerance.
"""

import struct

import numpy as np
import pytest

from maplibre_tile_spec_spark.functions import jpeg as J

# canonical tables: DC = 12 symbols at 4 bits, AC = all 162 baseline
# symbols at 8 bits (Kraft 162/256 < 1; trivially canonical)
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [
    (r << 4) | s for r in range(16) for s in range(1, 11)
] + [0x00, 0xF0]  # EOB and ZRL


def _canon_codes(symbols, length):
    return {sym: (length, code) for code, sym in enumerate(symbols)}


_DC_CODES = _canon_codes(_DC_SYMBOLS, 4)
_AC_CODES = _canon_codes(_AC_SYMBOLS, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)


def _dht(tc, th, symbols, length):
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _category(v):
    return int(abs(v)).bit_length()


def _emit(bw, codes, sym):
    length, code = codes[sym]
    bw.write(code, length)


def _encode_block(bw, block, pred):
    f = J._C @ (block - 128.0) @ J._C.T
    q = np.round(f).astype(np.int64).reshape(-1)[J.ZIGZAG]  # natural → zigzag order
    dc = int(q[0])
    diff = dc - pred
    s = _category(diff)
    _emit(bw, _DC_CODES, s)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = 63
    while last > 0 and q[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _emit(bw, _AC_CODES, 0xF0)
            run -= 16
        s = _category(v)
        _emit(bw, _AC_CODES, (run << 4) | s)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        _emit(bw, _AC_CODES, 0x00)
    return dc


def encode_jpeg(img: np.ndarray, subsample=False, restart_interval=0) -> bytes:
    """img: (h, w) gray or (h, w, 3) RGB uint8 → baseline JPEG bytes."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample == "422":
            def downx(p):
                ww = (w + 1) // 2 * 2
                pp = np.pad(p, ((0, 0), (0, ww - w)), mode="edge")
                return (pp[:, 0::2] + pp[:, 1::2]) / 2
            planes = [y, downx(cb), downx(cr)]
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            def down(p):
                hh = (h + 1) // 2 * 2
                ww = (w + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    out = bytearray(b"\xff\xd8")
    qtable = bytes([0]) + bytes([1] * 64)  # table 0, all ones
    out += b"\xff\xdb" + struct.pack(">H", len(qtable) + 2) + qtable
    out += _dht(0, 0, _DC_SYMBOLS, 4)
    out += _dht(1, 0, _AC_SYMBOLS, 8)
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))
    preds = [0] * nc
    bw = _BitWriter()
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu > 0 and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0] * nc
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        preds[ci] = _encode_block(bw, p[y0 : y0 + 8, x0 : x0 + 8], preds[ci])
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# progressive AC table additionally needs the EOBn run-length symbols
# (r<<4, r=1..14); 176 symbols at 8 bits still satisfies Kraft
_ACP_SYMBOLS = _AC_SYMBOLS + [r << 4 for r in range(1, 15)]
_ACP_CODES = _canon_codes(_ACP_SYMBOLS, 8)


def _plane_coeffs(plane, bh, bw):
    """Pad to the MCU grid, forward-DCT each 8×8 block → (bh, bw, 64)
    integer coefficients in zigzag order (all-ones quant)."""
    ph, pw = bh * 8, bw * 8
    p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
    out = np.zeros((bh, bw, 64), np.int64)
    for by in range(bh):
        for bx in range(bw):
            f = J._C @ (p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0) @ J._C.T
            out[by, bx] = np.round(f).astype(np.int64).reshape(-1)[J.ZIGZAG]
    return out


def _enc_dc_first(bw, dc, pred, al):
    sdc = int(dc) >> al  # arithmetic shift = T.81 DC point transform
    diff = sdc - pred
    s = _category(diff)
    _emit(bw, _DC_CODES, s)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    return sdc


def _enc_ac_first_scan(c, ss, se, al, restart_interval=0):
    """First AC pass for one component's band: RLE + EOB runs over blocks."""
    h = {"bw": _BitWriter(), "out": bytearray(), "rst": 0, "mcu": 0}
    state = {"eobrun": 0}

    def flush_eob():
        bw = h["bw"]
        while state["eobrun"] > 0:
            r = min(14, state["eobrun"].bit_length() - 1)
            cnt = min(state["eobrun"], (1 << (r + 1)) - 1)
            _emit(bw, _ACP_CODES, r << 4)
            if r:
                bw.write(cnt - (1 << r), r)
            state["eobrun"] -= cnt

    def boundary():
        if restart_interval and h["mcu"] > 0 and h["mcu"] % restart_interval == 0:
            flush_eob()
            h["bw"].flush()
            h["out"] += h["bw"].out
            h["out"] += bytes([0xFF, 0xD0 + (h["rst"] % 8)])
            h["rst"] += 1
            h["bw"] = _BitWriter()

    for by in range(c["sbh"]):
        for bx in range(c["sbw"]):
            boundary()
            h["mcu"] += 1
            bw = h["bw"]
            q = c["coef"][by, bx]
            svals = [
                (abs(int(q[k])) >> al) * (1 if q[k] >= 0 else -1) for k in range(ss, se + 1)
            ]
            last = max((i for i, v in enumerate(svals) if v), default=-1)
            if last < 0:
                state["eobrun"] += 1
                continue
            flush_eob()
            run = 0
            for i in range(last + 1):
                v = svals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    _emit(bw, _ACP_CODES, 0xF0)
                    run -= 16
                s = _category(v)
                _emit(bw, _ACP_CODES, (run << 4) | s)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last < se - ss:
                state["eobrun"] += 1
    flush_eob()
    h["bw"].flush()
    h["out"] += h["bw"].out
    return bytes(h["out"])


def _enc_ac_refine_scan(c, ss, se, ah, al, restart_interval=0):
    """AC successive-approximation refinement for one component's band,
    mirroring the decoder's cursor walk exactly (T.81 G.2.3): correction
    bits are emitted at the moment the decoder will read them."""
    h = {"bw": _BitWriter(), "out": bytearray(), "rst": 0, "mcu": 0}
    state = {"eobrun": 0, "runbits": []}

    def flush_eob():
        if state["eobrun"] == 0:
            return
        bw = h["bw"]
        r = state["eobrun"].bit_length() - 1
        _emit(bw, _ACP_CODES, r << 4)
        if r:
            bw.write(state["eobrun"] - (1 << r), r)
        for b in state["runbits"]:
            bw.write(b, 1)
        state["eobrun"] = 0
        state["runbits"] = []

    def boundary():
        if restart_interval and h["mcu"] > 0 and h["mcu"] % restart_interval == 0:
            flush_eob()
            h["bw"].flush()
            h["out"] += h["bw"].out
            h["out"] += bytes([0xFF, 0xD0 + (h["rst"] % 8)])
            h["rst"] += 1
            h["bw"] = _BitWriter()

    for by in range(c["sbh"]):
        for bx in range(c["sbw"]):
            boundary()
            h["mcu"] += 1
            bw = h["bw"]
            q = c["coef"][by, bx]
            vals = {k: int(q[k]) for k in range(ss, se + 1)}
            hist = {k: abs(v) >> ah for k, v in vals.items()}
            corr = {k: (abs(v) >> al) & 1 for k, v in vals.items()}
            new_pos = [k for k in range(ss, se + 1) if hist[k] == 0 and (abs(vals[k]) >> al)]
            if not new_pos:
                state["eobrun"] += 1
                state["runbits"] += [corr[k] for k in range(ss, se + 1) if hist[k] != 0]
                if state["eobrun"] == 16384:
                    flush_eob()
                continue
            flush_eob()
            pos = ss
            for k_new in new_pos:
                r = sum(1 for i in range(pos, k_new) if hist[i] == 0)
                while r > 15:
                    _emit(bw, _ACP_CODES, 0xF0)
                    cnt0 = 0
                    while cnt0 < 16:
                        if hist[pos] != 0:
                            bw.write(corr[pos], 1)
                        else:
                            cnt0 += 1
                        pos += 1
                    r -= 16
                _emit(bw, _ACP_CODES, (r << 4) | 1)
                bw.write(1 if vals[k_new] > 0 else 0, 1)
                while pos < k_new:
                    if hist[pos] != 0:
                        bw.write(corr[pos], 1)
                    pos += 1
                pos = k_new + 1
            if pos <= se:
                state["eobrun"] += 1
                state["runbits"] += [corr[i] for i in range(pos, se + 1) if hist[i] != 0]
    flush_eob()
    h["bw"].flush()
    h["out"] += h["bw"].out
    return bytes(h["out"])


def encode_progressive_jpeg(img: np.ndarray, subsample=False, restart_interval=0) -> bytes:
    """img → progressive JPEG (SOF2): interleaved DC-first (Al=1), AC-first
    per band per component (Al=1), DC refinement, AC refinements (Al=0).
    Exercises spectral selection, successive approximation, and EOB runs."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample:
            def down(p):
                hh = (h + 1) // 2 * 2
                ww = (w + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    comps = []
    for p, (sh, sv) in zip(planes, samp):
        bh, bw_ = mcuy * sv, mcux * sh
        comps.append(
            {
                "coef": _plane_coeffs(p, bh, bw_),
                "h": sh,
                "v": sv,
                "sbw": (-(-w * sh // hmax) + 7) // 8,
                "sbh": (-(-h * sv // vmax) + 7) // 8,
            }
        )

    out = bytearray(b"\xff\xd8")
    qtable = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", len(qtable) + 2) + qtable
    out += _dht(0, 0, _DC_SYMBOLS, 4)
    out += _dht(1, 0, _ACP_SYMBOLS, 8)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart_interval)

    def sos_hdr(comp_idx, ss, se, ah, al):
        body = bytes([len(comp_idx)])
        for i in comp_idx:
            body += bytes([i + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    def dc_scan(refine):
        bw = _BitWriter()
        body = bytearray()
        preds = [0] * nc
        rst = 0
        mcu = 0
        if nc == 1:
            c = comps[0]
            # one MCU per block in a non-interleaved scan
            order = [([(0, by, bx)]) for by in range(c["sbh"]) for bx in range(c["sbw"])]
        else:
            order = [
                [
                    (ci, my * c["v"] + by, mx * c["h"] + bx)
                    for ci, c in enumerate(comps)
                    for by in range(c["v"])
                    for bx in range(c["h"])
                ]
                for my in range(mcuy)
                for mx in range(mcux)
            ]
        for unit in order:
            if restart_interval and mcu > 0 and mcu % restart_interval == 0:
                bw.flush()
                body += bw.out
                body += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                preds = [0] * nc
            for ci, by, bx in unit:
                dc = int(comps[ci]["coef"][by, bx, 0])
                if refine:
                    bw.write(dc & 1, 1)
                else:
                    preds[ci] = _enc_dc_first(bw, dc, preds[ci], 1)
            mcu += 1
        bw.flush()
        body += bw.out
        return bytes(body)

    out += sos_hdr(range(nc), 0, 0, 0, 1) + dc_scan(refine=False)
    for ss, se in [(1, 5), (6, 63)]:
        for ci, c in enumerate(comps):
            out += sos_hdr([ci], ss, se, 0, 1) + _enc_ac_first_scan(c, ss, se, 1, restart_interval)
    out += sos_hdr(range(nc), 0, 0, 1, 0) + dc_scan(refine=True)
    for ss, se in [(1, 5), (6, 63)]:
        for ci, c in enumerate(comps):
            out += sos_hdr([ci], ss, se, 1, 0) + _enc_ac_refine_scan(c, ss, se, 1, 0, restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def encode_noninterleaved_jpeg(img: np.ndarray, subsample=False) -> bytes:
    """Baseline SOF0 with ONE SCAN PER COMPONENT (non-interleaved): each
    block carries its full DC+AC band, components sequential."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample:
            def down(p):
                hh = (h + 1) // 2 * 2
                ww = (w + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4
            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")
    qtable = bytes([0]) + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", len(qtable) + 2) + qtable
    out += _dht(0, 0, _DC_SYMBOLS, 4)
    out += _dht(1, 0, _AC_SYMBOLS, 8)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        bh, bw_ = mcuy * sv, mcux * sh
        sbw = (-(-w * sh // hmax) + 7) // 8
        sbh = (-(-h * sv // vmax) + 7) // 8
        coef = _plane_coeffs(p, bh, bw_)
        sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        bw = _BitWriter()
        pred = 0
        for by in range(sbh):
            for bx in range(sbw):
                q = coef[by, bx]
                dc = int(q[0])
                diff = dc - pred
                pred = dc
                sz = _category(diff)
                _emit(bw, _DC_CODES, sz)
                if sz:
                    bw.write(diff if diff >= 0 else diff + (1 << sz) - 1, sz)
                last = 63
                while last > 0 and q[last] == 0:
                    last -= 1
                run = 0
                for k in range(1, last + 1):
                    v = int(q[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        _emit(bw, _AC_CODES, 0xF0)
                        run -= 16
                    sz = _category(v)
                    _emit(bw, _AC_CODES, (run << 4) | sz)
                    bw.write(v if v >= 0 else v + (1 << sz) - 1, sz)
                    run = 0
                if last < 63:
                    _emit(bw, _AC_CODES, 0x00)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


class TestBaselineJpeg:
    def test_gray_near_lossless(self):
        rng = np.random.RandomState(42)
        img = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
        w, h, nc, body = J.decode_baseline_jpeg(encode_jpeg(img))
        assert (w, h, nc) == (24, 16, 1)
        got = np.frombuffer(body, np.uint8).reshape(16, 24)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2

    def test_gray_non_multiple_of_8(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 256, size=(13, 19), dtype=np.uint8)
        w, h, nc, body = J.decode_baseline_jpeg(encode_jpeg(img))
        assert (w, h) == (19, 13)
        got = np.frombuffer(body, np.uint8).reshape(13, 19)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2

    def test_rgb_444(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
        w, h, nc, body = J.decode_baseline_jpeg(encode_jpeg(img))
        assert (w, h, nc) == (8, 8, 3)
        got = np.frombuffer(body, np.uint8).reshape(8, 8, 3)
        # YCbCr forward+inverse round-trip adds a couple of counts of error
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 4

    def test_rgb_420_subsampled(self):
        # smooth gradient: 4:2:0 chroma loss is small on smooth data
        yy, xx = np.mgrid[0:16, 0:16]
        img = np.stack(
            [(yy * 8).astype(np.uint8), (xx * 8).astype(np.uint8), ((yy + xx) * 4).astype(np.uint8)],
            axis=-1,
        )
        w, h, nc, body = J.decode_baseline_jpeg(encode_jpeg(img, subsample=True))
        assert (w, h, nc) == (16, 16, 3)
        got = np.frombuffer(body, np.uint8).reshape(16, 16, 3)
        assert np.abs(got.astype(int) - img.astype(int)).mean() <= 6

    def test_restart_markers(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(16, 32), dtype=np.uint8)
        blob = encode_jpeg(img, restart_interval=2)
        assert b"\xff\xd0" in blob  # RST0 emitted
        w, h, nc, body = J.decode_baseline_jpeg(blob)
        got = np.frombuffer(body, np.uint8).reshape(16, 32)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 2

    def test_corrupt_restart_marker_raises(self):
        """ADVICE r4: a stream whose RST bytes are missing at the expected
        MCU boundary must fail loudly, not silently desync."""
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(16, 32), dtype=np.uint8)
        blob = bytearray(encode_jpeg(img, restart_interval=2))
        i = blob.index(b"\xff\xd0")
        blob[i : i + 2] = b"\x00\x00"
        with pytest.raises(ValueError, match="RST"):
            J.decode_baseline_jpeg(bytes(blob))

    def test_extended_sequential_rejected(self):
        # SOF2 now decodes; SOF1 (extended sequential) remains gated
        rng = np.random.RandomState(5)
        blob = bytearray(encode_jpeg(rng.randint(0, 256, size=(8, 8), dtype=np.uint8)))
        i = blob.index(b"\xff\xc0")
        blob[i + 1] = 0xC1  # SOF0 → SOF1
        with pytest.raises(NotImplementedError, match="non-baseline"):
            J.decode_baseline_jpeg(bytes(blob))

    def test_through_media_features(self, spark):
        from maplibre_tile_spec_spark.operators import multimodal as MM

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, size=(8, 16, 3), dtype=np.uint8)
        blob = encode_jpeg(img)
        media = spark.createDataFrame([("jpg-1", "image", 16, 8, 1, 0, blob)], MM.MEDIA_SCHEMA)
        got = MM.media_features(media).collect()[0]
        assert got.kind == "image" and got.n_frames == 1
        assert got.n_bytes == len(blob)

    def test_media_features_skip_mode(self, spark):
        """on_error='skip': a truncated JPEG is dropped, the rest of the
        batch survives (one corrupt blob must not kill a corpus job)."""
        from maplibre_tile_spec_spark.operators import multimodal as MM

        rng = np.random.RandomState(2)
        good = encode_jpeg(rng.randint(0, 256, size=(8, 8), dtype=np.uint8))
        rows = [
            ("ok", "image", 8, 8, 1, 0, good),
            ("bad", "image", 8, 8, 1, 0, good[: len(good) // 2]),
        ]
        media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        got = MM.media_features(media, on_error="skip").collect()
        assert [r.media_ref for r in got] == ["ok"]
        with pytest.raises(Exception):
            MM.media_features(media).collect()  # strict default still raises

    def test_noninterleaved_multiscan_decodes(self):
        """SOF0 with one scan per component (round 5): decodes through the
        coefficient store and matches the interleaved decode bit-for-bit up
        to IDCT summation order."""
        rng = np.random.RandomState(9)
        for shape, sub in (((16, 24, 3), False), ((13, 19), False), ((16, 16, 3), True)):
            img = rng.randint(0, 256, size=shape, dtype=np.uint8)
            w1, h1, n1, b1 = J.decode_jpeg(encode_noninterleaved_jpeg(img, subsample=sub))
            w2, h2, n2, b2 = J.decode_jpeg(encode_jpeg(img, subsample=sub))
            assert (w1, h1, n1) == (w2, h2, n2)
            a = np.frombuffer(b1, np.uint8).astype(int)
            b = np.frombuffer(b2, np.uint8).astype(int)
            assert np.abs(a - b).max() <= 1

    def test_rgb_422_subsampled(self):
        # horizontal-only chroma subsampling (4:2:2): decoder upsamples x only
        yy, xx = np.mgrid[0:8, 0:16]
        img = np.stack(
            [(yy * 16).astype(np.uint8), (xx * 8).astype(np.uint8), ((yy * xx) % 256).astype(np.uint8)],
            axis=-1,
        )
        blob = encode_jpeg(img, subsample="422")
        w, h, nc, body = J.decode_baseline_jpeg(blob)
        assert (w, h, nc) == (16, 8, 3)
        got = np.frombuffer(body, np.uint8).reshape(8, 16, 3)
        assert np.abs(got.astype(int) - img.astype(int)).mean() <= 8


class TestProgressiveJpeg:
    """SOF2 decode vs the independent progressive test encoder above
    (VERDICT r4 #2). The scan plan uses DC+AC successive approximation
    (Al=1→0), two spectral bands, and EOB runs, so every Annex G decode
    path runs. Because the approximation bits fully restore each integer
    coefficient, the progressive decode must match the BASELINE decode of
    the same image almost exactly (same coefficients; only the vectorized
    vs per-block IDCT float ordering differs)."""

    def _cmp_with_baseline(self, img, subsample=False):
        pw, ph, pnc, pbody = J.decode_jpeg(encode_progressive_jpeg(img, subsample=subsample))
        bw, bh, bnc, bbody = J.decode_jpeg(encode_jpeg(img, subsample=subsample))
        assert (pw, ph, pnc) == (bw, bh, bnc)
        pa = np.frombuffer(pbody, np.uint8).astype(int)
        ba = np.frombuffer(bbody, np.uint8).astype(int)
        assert np.abs(pa - ba).max() <= 1  # float summation-order only
        return pw, ph, pnc, pbody

    def test_gray_matches_baseline_and_original(self):
        rng = np.random.RandomState(21)
        img = rng.randint(0, 256, size=(16, 24), dtype=np.uint8)
        w, h, nc, body = self._cmp_with_baseline(img)
        got = np.frombuffer(body, np.uint8).reshape(16, 24)
        assert np.abs(got.astype(int) - img.astype(int)).max() <= 3

    def test_gray_non_multiple_of_8(self):
        rng = np.random.RandomState(22)
        img = rng.randint(0, 256, size=(13, 19), dtype=np.uint8)
        self._cmp_with_baseline(img)

    def test_rgb_444(self):
        rng = np.random.RandomState(23)
        img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
        self._cmp_with_baseline(img)

    def test_rgb_420_subsampled(self):
        yy, xx = np.mgrid[0:16, 0:16]
        img = np.stack(
            [(yy * 8).astype(np.uint8), (xx * 8).astype(np.uint8), ((yy + xx) * 4).astype(np.uint8)],
            axis=-1,
        )
        self._cmp_with_baseline(img, subsample=True)

    def test_smooth_image_exercises_eob_runs(self):
        # a constant image has empty AC bands in every block → the high-band
        # scans are pure EOB runs (> one block, with extension bits)
        img = np.full((32, 32), 77, dtype=np.uint8)
        blob = encode_progressive_jpeg(img)
        w, h, nc, body = J.decode_jpeg(blob)
        got = np.frombuffer(body, np.uint8).reshape(32, 32)
        assert np.abs(got.astype(int) - 77).max() <= 1

    def test_through_media_features(self, spark):
        from maplibre_tile_spec_spark.operators import multimodal as MM

        rng = np.random.RandomState(24)
        img = rng.randint(0, 256, size=(8, 16), dtype=np.uint8)
        blob = encode_progressive_jpeg(img)
        media = spark.createDataFrame(
            [("pjpeg-1", "image", 16, 8, 1, 0, blob)], MM.MEDIA_SCHEMA
        )
        got = MM.media_features(media).collect()[0]
        assert got.kind == "image"
        w, h, nc, body = J.decode_jpeg(blob)
        flat = np.frombuffer(body, np.uint8).astype(np.float64)
        assert got.mean_byte == pytest.approx(flat.mean())

    def test_restart_markers_progressive(self):
        """DRI + RSTn inside progressive scans: DC pred, AC EOB runs, and
        refinement state all reset at each restart boundary."""
        rng = np.random.RandomState(31)
        img = rng.randint(0, 256, size=(16, 32), dtype=np.uint8)
        blob = encode_progressive_jpeg(img, restart_interval=2)
        assert b"\xff\xd0" in blob
        pw, ph, pnc, pbody = J.decode_jpeg(blob)
        bw_, bh_, bnc, bbody = J.decode_jpeg(encode_jpeg(img))
        assert (pw, ph, pnc) == (bw_, bh_, bnc)
        pa = np.frombuffer(pbody, np.uint8).astype(int)
        ba = np.frombuffer(bbody, np.uint8).astype(int)
        assert np.abs(pa - ba).max() <= 1

    def test_corrupt_restart_in_progressive_scan_raises(self):
        rng = np.random.RandomState(32)
        img = rng.randint(0, 256, size=(16, 32), dtype=np.uint8)
        blob = bytearray(encode_progressive_jpeg(img, restart_interval=2))
        i = blob.index(b"\xff\xd0")
        blob[i : i + 2] = b"\x00\x00"
        with pytest.raises(ValueError):
            J.decode_jpeg(bytes(blob))

    def test_16bit_quant_tables(self):
        """DQT pq=1: table entries are big-endian u16; patching the all-ones
        8-bit table to 16-bit must decode identically."""
        rng = np.random.RandomState(33)
        img = rng.randint(0, 256, size=(8, 16), dtype=np.uint8)
        blob = encode_jpeg(img)
        i = blob.index(b"\xff\xdb")
        old_seg = blob[i : i + 4 + 65]  # marker+len + pqtq + 64 entries
        new_body = bytes([0x10]) + struct.pack(">64H", *([1] * 64))
        new_seg = b"\xff\xdb" + struct.pack(">H", len(new_body) + 2) + new_body
        patched = blob[:i] + new_seg + blob[i + 4 + 65 :]
        w1, h1, n1, b1 = J.decode_jpeg(blob)
        w2, h2, n2, b2 = J.decode_jpeg(patched)
        assert (w1, h1, n1) == (w2, h2, n2)
        assert b1 == b2
