"""VP8L (WebP lossless) decoder tests.

The encoder here is written independently from the decoder, directly from
the published bitstream spec (bit-packing tables, prefix-code headers,
transform math), so a round-trip failure localizes a real mismatch with
the format rather than a shared bug. It covers: simple and normal prefix
codes (with and without the max_symbol early stop, with 16/17/18 repeat
codes), LZ77 with both plane-coded and direct distances, the color cache,
meta-prefix groups, and all four transforms including sub-byte bundling.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from maplibre_tile_spec_spark.functions.vp8l import (
    _DISTANCE_MAP,
    decode_vp8l,
    decode_webp,
)

# ---------------------------------------------------------------------------
# independent encoder
# ---------------------------------------------------------------------------


class _BW:
    """LSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int):
        assert 0 <= v < (1 << nbits) if nbits else v == 0
        self.acc |= v << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int):
        # prefix-code words are walked MSB-first by the decoder
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.n:
            out += bytes([self.acc & 0xFF])
        return out


def _huff_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths for used symbols; falls back to flat lengths if the
    unconstrained Huffman tree exceeds max_len."""
    import heapq
    import itertools

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    cnt = itertools.count()
    heap = [(f, next(cnt), s) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    parent: dict[int, object] = {}
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        node = object()
        parent[id(n1) if not isinstance(n1, int) else n1] = node
        # store depth links via dict keyed on node identity
        parent[("k", id(node), 1)] = (n1, n2)
        heapq.heappush(heap, (f1 + f2, next(cnt), node))
    # walk depths
    lengths: dict[int, int] = {}

    def walk(node, depth):
        if isinstance(node, int):
            lengths[node] = max(depth, 1)
            return
        n1, n2 = parent[("k", id(node), 1)]
        walk(n1, depth + 1)
        walk(n2, depth + 1)

    walk(heap[0][2], 0)
    if max(lengths.values()) > max_len:
        flat = max(1, (len(syms) - 1).bit_length())
        assert flat <= max_len
        lengths = {s: flat for s in syms}
    return lengths


def _canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """RFC1951 canonical codes {sym: (code, len)} from {sym: len}."""
    if len(lengths) == 1:
        (s,) = lengths
        return {s: (0, 0)}  # single-symbol tree reads zero bits
    max_len = max(lengths.values())
    bl = [0] * (max_len + 1)
    for ln in lengths.values():
        bl[ln] += 1
    nxt = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl[ln - 1]) << 1
        nxt[ln] = code
    out = {}
    for s in sorted(lengths):
        ln = lengths[s]
        out[s] = (nxt[ln], ln)
        nxt[ln] += 1
    return out


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_tree(
    bw: _BW,
    lengths: dict[int, int],
    alphabet_size: int,
    *,
    force_normal: bool = False,
    use_max_symbol: bool = False,
    use_16: bool = False,
) -> dict[int, tuple[int, int]]:
    """Write a prefix-code header, return the codes for emitting symbols."""
    syms = sorted(lengths)
    if (
        not force_normal
        and len(syms) <= 2
        and all(s <= 255 for s in syms)
    ):
        # simple code
        bw.write(1, 1)
        bw.write(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1 and len(syms) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    # normal code: emit the full code-length array through the cl code
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    stream: list[tuple[int, int, int]] = []  # (cl_sym, extra_val, extra_nbits)
    i = 0
    last = len(full)
    if use_max_symbol:
        while last > 0 and full[last - 1] == 0:
            last -= 1
    prev_nz = 8
    while i < last:
        if full[i] == 0:
            run = 0
            while i + run < last and full[i + run] == 0:
                run += 1
            while run >= 11:
                take = min(run, 138)
                stream.append((18, take - 11, 7))
                run -= take
                i += take
            while run >= 3:
                take = min(run, 10)
                stream.append((17, take - 3, 3))
                run -= take
                i += take
            for _ in range(run):
                stream.append((0, 0, 0))
                i += 1
        else:
            v = full[i]
            if use_16 and v == prev_nz:
                run = 0
                while i + run < last and full[i + run] == v:
                    run += 1
                if run >= 3:
                    take = min(run, 6)
                    stream.append((16, take - 3, 2))
                    i += take
                    continue
            stream.append((v, 0, 0))
            prev_nz = v
            i += 1
    cl_freq: dict[int, int] = {}
    for s, _, _ in stream:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, 7)
    cl_codes = _canon_codes(cl_lengths)
    num_cl = max(4, max(_CL_ORDER.index(s) for s in cl_lengths) + 1)
    bw.write(0, 1)  # normal code
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
    if use_max_symbol:
        n_cmds = len(stream)
        assert n_cmds >= 2, "max_symbol path needs >= 2 commands"
        nbits = 2
        while (1 << nbits) <= n_cmds - 2:
            nbits += 2
        nbits = min(max(nbits, 2), 16)
        if nbits % 2:
            nbits += 1
        bw.write(1, 1)
        bw.write((nbits - 2) // 2, 3)
        bw.write(n_cmds - 2, nbits)
    else:
        bw.write(0, 1)
    for s, extra, extra_n in stream:
        c, ln = cl_codes[s]
        bw.write_code(c, ln)
        if extra_n:
            bw.write(extra, extra_n)
    return _canon_codes(lengths)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """Inverse of the decoder's LZ77 value decode: value → (code, extra,
    extra_nbits)."""
    u = v - 1
    if u < 4:
        return u, 0, 0
    e = u.bit_length() - 2
    if u < (3 << e):
        return 2 * e + 2, u - (2 << e), e
    return 2 * e + 3, u - (3 << e), e


def _dist_to_code(dist: int, width: int) -> int:
    for i, (dx, dy) in enumerate(_DISTANCE_MAP):
        if dx + dy * width == dist and dx + dy * width >= 1:
            return i + 1
    return dist + 120


_CACHE_MULT = 0x1E35A7BD


def _emit_entropy_image(
    bw: _BW,
    argb: list[int],
    w: int,
    h: int,
    *,
    level0: bool,
    cache_bits: int = 0,
    lz77: bool = False,
    meta: tuple[int, list[int]] | None = None,
    force_normal: bool = False,
    use_max_symbol: bool = False,
    use_16: bool = False,
):
    """Tokenize + write one entropy-coded image (the spec's level-0 ARGB
    image when ``level0``, else a transform/meta sub-image)."""
    n = w * h
    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    meta_bits, meta_img = (0, None)
    if level0:
        if meta is not None:
            meta_bits, meta_img = meta
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            hs = 1 << meta_bits
            mw, mh = (w + hs - 1) // hs, (h + hs - 1) // hs
            assert len(meta_img) == mw * mh
            _emit_entropy_image(
                bw,
                [0xFF000000 | (g << 8) for g in meta_img],
                mw,
                mh,
                level0=False,
            )
        else:
            bw.write(0, 1)
    n_groups = (max(meta_img) + 1) if meta_img else 1
    hs_w = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta_img else 0

    def group_at(pos: int) -> int:
        if not meta_img:
            return 0
        x, y = pos % w, pos // w
        return meta_img[(y >> meta_bits) * hs_w + (x >> meta_bits)]

    # pass 1: tokenize with a decoder-identical cache simulation
    cache = [0] * (1 << cache_bits) if cache_bits else None
    shift = 32 - cache_bits if cache_bits else 0

    def cache_slot(px):
        return (_CACHE_MULT * px & 0xFFFFFFFF) >> shift

    tokens: list[tuple] = []  # (group, kind, ...)
    pos = 0
    while pos < n:
        g = group_at(pos)
        best = None
        if lz77 and pos > 0:
            for dist in (1, 2, w, w + 1):
                if 1 <= dist <= pos:
                    ln = 0
                    cap = min(n - pos, 4096)
                    while ln < cap and argb[pos + ln - dist] == argb[pos + ln]:
                        ln += 1
                    if ln >= 3 and (best is None or ln > best[0]):
                        best = (ln, dist)
        if best:
            ln, dist = best
            tokens.append((g, "copy", ln, dist))
            if cache is not None:
                for i in range(ln):
                    px = argb[pos + i]
                    cache[cache_slot(px)] = px
            pos += ln
            continue
        px = argb[pos]
        if cache is not None and cache[cache_slot(px)] == px:
            tokens.append((g, "cache", cache_slot(px)))
        else:
            tokens.append((g, "lit", px))
            if cache is not None:
                cache[cache_slot(px)] = px
        pos += 1

    # pass 2: per-group frequency count → trees → token emission
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    gfreq = [dict() for _ in range(n_groups)]
    rfreq = [dict() for _ in range(n_groups)]
    bfreq = [dict() for _ in range(n_groups)]
    afreq = [dict() for _ in range(n_groups)]
    dfreq = [dict() for _ in range(n_groups)]

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for tok in tokens:
        g = tok[0]
        if tok[1] == "lit":
            px = tok[2]
            bump(gfreq[g], (px >> 8) & 0xFF)
            bump(rfreq[g], (px >> 16) & 0xFF)
            bump(bfreq[g], px & 0xFF)
            bump(afreq[g], (px >> 24) & 0xFF)
        elif tok[1] == "copy":
            bump(gfreq[g], 256 + _prefix_encode(tok[2])[0])
            bump(dfreq[g], _prefix_encode(_dist_to_code(tok[3], w))[0])
        else:
            bump(gfreq[g], 280 + tok[2])
    codes = []
    for g in range(n_groups):
        row = []
        for freq, size in (
            (gfreq[g], green_alpha),
            (rfreq[g], 256),
            (bfreq[g], 256),
            (afreq[g], 256),
            (dfreq[g], 40),
        ):
            if not freq:
                freq = {0: 1}  # unused tree still needs a valid header
            lens = _huff_lengths(freq, 15)
            row.append(
                _write_tree(
                    bw,
                    lens,
                    size,
                    force_normal=force_normal,
                    use_max_symbol=use_max_symbol and len(freq) > 2,
                    use_16=use_16,
                )
            )
        codes.append(row)
    for tok in tokens:
        gc, rc, bc, ac, dc = codes[tok[0]]
        if tok[1] == "lit":
            px = tok[2]
            bw.write_code(*gc[(px >> 8) & 0xFF])
            bw.write_code(*rc[(px >> 16) & 0xFF])
            bw.write_code(*bc[px & 0xFF])
            bw.write_code(*ac[(px >> 24) & 0xFF])
        elif tok[1] == "copy":
            lcode, lextra, lbits = _prefix_encode(tok[2])
            bw.write_code(*gc[256 + lcode])
            if lbits:
                bw.write(lextra, lbits)
            dcode, dextra, dbits = _prefix_encode(_dist_to_code(tok[3], w))
            bw.write_code(*dc[dcode])
            if dbits:
                bw.write(dextra, dbits)
        else:
            bw.write_code(*gc[280 + tok[2]])


# NOTE on copy token field order: the decoder reads length-extra bits right
# after the green length code, THEN the distance code. Keep emission order
# identical: green code, length extra, distance code, distance extra.


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _predict_ref(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """Independent reimplementation of the 14 spec predictors (channel
    vectors instead of the decoder's scalar packing)."""

    def ch(p):
        return np.array([(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF], dtype=np.int64)

    def pack(v):
        v = [int(x) for x in v]
        return (v[0] << 24) | (v[1] << 16) | (v[2] << 8) | v[3]

    L, T, TL, TR = ch(left), ch(top), ch(tl), ch(tr)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return pack(((L + TR) // 2 + T) // 2)
    if mode == 6:
        return pack((L + TL) // 2)
    if mode == 7:
        return pack((L + T) // 2)
    if mode == 8:
        return pack((TL + T) // 2)
    if mode == 9:
        return pack((T + TR) // 2)
    if mode == 10:
        return pack(((L + TL) // 2 + (T + TR) // 2) // 2)
    if mode == 11:
        p = L + T - TL
        return left if np.abs(p - L).sum() < np.abs(p - T).sum() else top
    if mode == 12:
        return pack(np.clip(L + T - TL, 0, 255))
    if mode == 13:
        ave = (L + T) // 2
        d = ave - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return pack(np.clip(ave + half, 0, 255))
    raise AssertionError(mode)


def _forward_predictor(argb: list[int], w: int, h: int, bits: int, modes: list[int]):
    """Residuals st. the decoder's inverse reconstructs exactly."""
    tiles_w = (w + (1 << bits) - 1) >> bits
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if y == 0:
                mode = 0 if x == 0 else 1
            elif x == 0:
                mode = 2
            else:
                mode = modes[(y >> bits) * tiles_w + (x >> bits)]
            left = argb[pos - 1] if x else 0
            top = argb[pos - w] if y else 0
            tl = argb[pos - w - 1] if (x and y) else 0
            tr = argb[pos - w + 1] if y else 0
            pred = _predict_ref(mode, left, top, tl, tr)
            px = argb[pos]
            out[pos] = (
                ((((px >> 24) - (pred >> 24)) & 0xFF) << 24)
                | (((((px >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((px >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8)
                | (((px & 0xFF) - (pred & 0xFF)) & 0xFF)
            )
    return out


def encode_vp8l(
    rgba: np.ndarray,
    *,
    cache_bits: int = 0,
    lz77: bool = False,
    subtract_green: bool = False,
    predictor_bits: int = 0,
    color_bits: int = 0,
    palette: bool = False,
    meta_bits: int = 0,
    force_normal: bool = False,
    use_max_symbol: bool = False,
    use_16: bool = False,
    container: bool = True,
) -> bytes:
    h, w = rgba.shape[:2]
    argb = [
        (int(p[3]) << 24) | (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])
        for p in rgba.reshape(-1, 4)
    ]
    bw = _BW()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)  # alpha hint
    bw.write(0, 3)  # version
    cur_w = w
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
            for p in argb
        ]
    if color_bits:
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(color_bits - 2, 3)
        tiles_w = (cur_w + (1 << color_bits) - 1) >> color_bits
        tiles_h = (h + (1 << color_bits) - 1) >> color_bits
        ctes = []
        for ty in range(tiles_h):
            for tx in range(tiles_w):
                g2r, g2b, r2b = (tx * 37 + 3) & 0xFF, (ty * 53 + 7) & 0xFF, (tx + ty) * 11 & 0xFF
                ctes.append(0xFF000000 | (r2b << 16) | (g2b << 8) | g2r)
        _emit_entropy_image(bw, ctes, tiles_w, tiles_h, level0=False)
        out = []
        for pos, p in enumerate(argb):
            y, x = divmod(pos, cur_w)
            cte = ctes[(y >> color_bits) * tiles_w + (x >> color_bits)]
            g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            r_orig = (p >> 16) & 0xFF
            r = (r_orig - _ct_delta(g2r, g)) & 0xFF
            b = ((p & 0xFF) - _ct_delta(g2b, g) - _ct_delta(r2b, r_orig)) & 0xFF
            out.append((p & 0xFF00FF00) | (r << 16) | b)
        argb = out
    if predictor_bits:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(predictor_bits - 2, 3)
        tiles_w = (cur_w + (1 << predictor_bits) - 1) >> predictor_bits
        tiles_h = (h + (1 << predictor_bits) - 1) >> predictor_bits
        modes = [(tx + ty * tiles_w) % 14 for ty in range(tiles_h) for tx in range(tiles_w)]
        _emit_entropy_image(
            bw,
            [0xFF000000 | (m << 8) for m in modes],
            tiles_w,
            tiles_h,
            level0=False,
        )
        argb = _forward_predictor(argb, cur_w, h, predictor_bits, modes)
    if palette:
        pal: list[int] = []
        seen: dict[int, int] = {}
        for p in argb:
            if p not in seen:
                seen[p] = len(pal)
                pal.append(p)
        assert len(pal) <= 256
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(pal) - 1, 8)
        deltas = []
        prev = 0
        for p in pal:
            deltas.append(
                ((((p >> 24) - (prev >> 24)) & 0xFF) << 24)
                | (((((p >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16)
                | (((((p >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8)
                | (((p & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            prev = p
        _emit_entropy_image(bw, deltas, len(pal), 1, level0=False)
        xbits = 3 if len(pal) <= 2 else (2 if len(pal) <= 4 else (1 if len(pal) <= 16 else 0))
        packed_w = (cur_w + (1 << xbits) - 1) >> xbits
        bpp = 8 >> xbits
        packed = []
        for y in range(h):
            for px_ in range(packed_w):
                byte = 0
                for j in range(1 << xbits):
                    x = (px_ << xbits) + j
                    if x < cur_w:
                        byte |= seen[argb[y * cur_w + x]] << (j * bpp)
                packed.append(0xFF000000 | (byte << 8))
        argb = packed
        cur_w = packed_w
    bw.write(0, 1)  # no more transforms
    meta = None
    if meta_bits:
        hs = 1 << meta_bits
        mw, mh = (cur_w + hs - 1) // hs, (h + hs - 1) // hs
        meta = (meta_bits, [(mx + my) % 2 for my in range(mh) for mx in range(mw)])
    _emit_entropy_image(
        bw,
        argb,
        cur_w,
        h,
        level0=True,
        cache_bits=cache_bits,
        lz77=lz77,
        meta=meta,
        force_normal=force_normal,
        use_max_symbol=use_max_symbol,
        use_16=use_16,
    )
    data = bw.bytes()
    if not container:
        return data
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _rand_rgba(w, h, seed, colors=None):
    rng = np.random.RandomState(seed)
    if colors is None:
        return rng.randint(0, 256, size=(h, w, 4), dtype=np.int64).astype(np.uint8)
    pal = rng.randint(0, 256, size=(colors, 4), dtype=np.int64).astype(np.uint8)
    return pal[rng.randint(0, colors, size=(h, w))]


def _roundtrip(rgba, **kw):
    blob = encode_vp8l(rgba, **kw)
    w, h, out = decode_webp(blob) if kw.get("container", True) else (None, None, None)
    if out is None:
        w, h, out = decode_vp8l(blob)
    assert (w, h) == (rgba.shape[1], rgba.shape[0])
    np.testing.assert_array_equal(out, rgba)


class TestDistanceMap:
    def test_pinned_prefix(self):
        # leading entries of the spec's published table
        expected = [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
            (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
            (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
            (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
            (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        ]
        assert _DISTANCE_MAP[:40] == expected
        assert len(_DISTANCE_MAP) == 120
        # tail: the farthest offsets in the 8x15 neighborhood
        assert _DISTANCE_MAP[-1] == (8, 7)
        assert _DISTANCE_MAP[-2] == (8, 6)

    def test_prefix_value_inverse(self):
        from maplibre_tile_spec_spark.functions.vp8l import _BitReader, _lz77_value

        for v in list(range(1, 70)) + [255, 1024, 4096]:
            code, extra, nbits = _prefix_encode(v)
            bw = _BW()
            bw.write(extra, nbits)
            assert _lz77_value(code, _BitReader(bw.bytes() or b"\x00")) == v


class TestEntropyOnly:
    def test_random_literals(self):
        _roundtrip(_rand_rgba(13, 9, 1))

    def test_1x1(self):
        _roundtrip(_rand_rgba(1, 1, 2))

    def test_two_color_simple_trees(self):
        rgba = _rand_rgba(16, 8, 3, colors=2)
        _roundtrip(rgba)

    def test_force_normal_trees(self):
        _roundtrip(_rand_rgba(12, 12, 4, colors=5), force_normal=True)

    def test_max_symbol_early_stop(self):
        _roundtrip(_rand_rgba(20, 10, 5), force_normal=True, use_max_symbol=True)

    def test_repeat16_code(self):
        # flat palettes give equal code lengths → runs for the 16 code
        _roundtrip(_rand_rgba(24, 8, 6, colors=32), force_normal=True, use_16=True)

    def test_lz77_runs_and_planes(self):
        rng = np.random.RandomState(7)
        rgba = _rand_rgba(17, 11, 7, colors=3)
        rgba[4, :] = rgba[3, :]  # vertical match (dist = width, plane code)
        rgba[6, 2:15] = rgba[6, 1]  # horizontal run (dist = 1)
        _roundtrip(rgba, lz77=True)
        del rng

    def test_color_cache(self):
        _roundtrip(_rand_rgba(19, 13, 8, colors=6), cache_bits=4)

    def test_color_cache_with_lz77(self):
        rgba = _rand_rgba(21, 9, 9, colors=4)
        rgba[5, :] = rgba[4, :]
        _roundtrip(rgba, lz77=True, cache_bits=6)

    def test_meta_prefix_groups(self):
        _roundtrip(_rand_rgba(24, 16, 10, colors=9), meta_bits=3)


class TestTransforms:
    def test_subtract_green(self):
        _roundtrip(_rand_rgba(14, 10, 11), subtract_green=True)

    def test_predictor_all_modes(self):
        # 4x4 blocks over a 32x32 image → 64 tiles, modes cycle 0..13
        _roundtrip(_rand_rgba(32, 32, 12, colors=7), predictor_bits=2)

    def test_color_transform(self):
        _roundtrip(_rand_rgba(20, 12, 13), color_bits=2)

    @pytest.mark.parametrize("colors", [2, 4, 16, 100])
    def test_color_indexing_bundling(self, colors):
        _roundtrip(_rand_rgba(23, 7, 14 + colors, colors=colors), palette=True)

    def test_stacked_sg_predictor_lz77_cache(self):
        rgba = _rand_rgba(28, 20, 15, colors=5)
        rgba[9, :] = rgba[8, :]
        _roundtrip(
            rgba, subtract_green=True, predictor_bits=3, lz77=True, cache_bits=5
        )

    def test_color_then_predictor(self):
        _roundtrip(_rand_rgba(18, 14, 16), color_bits=3, predictor_bits=2)


class TestContainer:
    def test_vp8x_header_skipped(self):
        rgba = _rand_rgba(5, 4, 17)
        raw = encode_vp8l(rgba, container=False)
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        chunk = b"VP8L" + struct.pack("<I", len(raw)) + raw + (b"\x00" if len(raw) & 1 else b"")
        blob = b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(chunk)) + b"WEBP" + vp8x + chunk
        w, h, out = decode_webp(blob)
        assert (w, h) == (5, 4)
        np.testing.assert_array_equal(out, rgba)

    def test_lossy_vp8_gated(self):
        blob = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        with pytest.raises(NotImplementedError):
            decode_webp(blob)

    def test_truncated_raises(self):
        blob = encode_vp8l(_rand_rgba(9, 9, 18))
        with pytest.raises(ValueError):
            decode_webp(blob[:-6] + b"")  # cut mid-bitstream

    def test_not_webp(self):
        with pytest.raises(ValueError):
            decode_webp(b"RIFF\x04\x00\x00\x00WAVE")


class TestMediaIntegration:
    def test_parse_header_webp(self):
        from maplibre_tile_spec_spark.operators.multimodal import _parse_header

        rgba = _rand_rgba(11, 6, 19, colors=4)
        kind, w, h, frames, rate, body = _parse_header(encode_vp8l(rgba))
        assert (kind, w, h, frames, rate) == ("image", 11, 6, 1, 0)
        assert body == rgba.tobytes()

    def test_wav_still_routes(self):
        from maplibre_tile_spec_spark.operators.multimodal import _parse_header

        pcm = b"\x01\x02" * 100
        wav = (
            b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )
        kind, w, h, frames, rate, body = _parse_header(wav)
        assert (kind, frames, rate) == ("audio", 100, 8000)


class TestBitstreamPin:
    def test_fixed_stream_bytes_and_decode(self):
        """Pin the exact encoded bytes of one deterministic configuration:
        any silent drift in bit packing, canonical code assignment, token
        order, or transform math on EITHER side changes this hash or the
        decoded pixels."""
        import hashlib

        img = _rand_rgba(24, 16, 123, colors=6)
        img[5, :] = img[4, :]
        blob = encode_vp8l(img, subtract_green=True, lz77=True, cache_bits=5)
        assert len(blob) == 220
        assert (
            hashlib.sha256(blob).hexdigest()
            == "4ad7f430d58af55bda5fc180635de4718d0eb457d1706a371cbe3ca77744aaf3"
        )
        w, h, out = decode_webp(blob)
        assert (w, h) == (24, 16)
        np.testing.assert_array_equal(out, img)
