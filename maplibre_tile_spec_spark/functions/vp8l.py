"""WebP-lossless (VP8L) decode from scratch — no image library.

Implements the public "WebP Lossless Bitstream Specification" (Google
developer docs / IETF draft-zern-webp): LSB-first bit reading, canonical
prefix codes (simple 1-2-symbol and normal code-length-coded forms, incl.
the optional ``max_symbol`` early-stop), meta-prefix (spatially varying
Huffman groups), color cache, LZ77 backward references with the 120-entry
2D distance map, and all four transforms (predictor with its 14 modes,
color transform, subtract-green, color indexing with sub-byte pixel
bundling) applied in inverse reading order.

Decode output is an (h, w, 4) RGBA uint8 raster.  Lossy ``VP8 `` chunks
stay behind the library capability gate (NotImplementedError) — VP8L is a
self-contained spec; VP8 needs a full DCT/bool-coder video intra decoder.

Scale shape: this runs per-blob inside the Arrow-batched media kernel
(operators/multimodal.py), so the work is bounded by image size and never
touches the driver; the Python loops here are per-pixel but images are
entropy-decoded exactly once per blob, the same cost model as the
from-scratch JPEG/PNG paths.

Studied, not copied: behavior follows the published spec text; no
reference-repo counterpart exists (the MLT reference has no raster codec).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit reader (LSB-first within bytes, like DEFLATE)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        got = 0
        data = self.data
        while got < n:
            byte = data[pos >> 3]
            off = pos & 7
            take = min(8 - off, n - got)
            v |= ((byte >> off) & ((1 << take) - 1)) << got
            got += take
            pos += take
        self.pos = pos
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

#: order in which code-length-code lengths are stored (spec constant)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MAX_CODE_LEN = 15


class _Tree:
    """Canonical prefix code: {(length, code): symbol} walked MSB-first,
    or a 0-bit single-symbol tree (reads nothing)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            # single-symbol trees consume zero bits (spec: a complete code
            # with one symbol is length 0)
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        max_len = max(ln for ln, _ in nz)
        if max_len > _MAX_CODE_LEN:
            raise ValueError("VP8L code length > 15")
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        # RFC1951 canonical assignment: by length, then symbol order
        next_code = [0] * (max_len + 1)
        code = 0
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
            if bl_count[ln] and next_code[ln] + bl_count[ln] > (1 << ln):
                raise ValueError("over-subscribed VP8L prefix code")
        # reject under-subscribed (incomplete) codes too: libwebp refuses
        # them up front, and an incomplete tree would decode garbage symbols
        # from a corrupt stream before eventually erroring (Kraft equality
        # must hold exactly for a multi-symbol code)
        if sum(1 << (max_len - ln) for ln, _ in nz) != 1 << max_len:
            raise ValueError("incomplete VP8L prefix code")
        table: dict[tuple[int, int], int] = {}
        for s, ln in enumerate(lengths):
            if ln:
                table[(ln, next_code[ln])] = s
                next_code[ln] += 1
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        table = self.table
        for length in range(1, _MAX_CODE_LEN + 1):
            code = (code << 1) | br.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code word")


def _read_code_lengths(br: _BitReader, cl_tree: _Tree, alphabet_size: int) -> list[int]:
    """Decode the main tree's code lengths via the code-length code
    (literals 0-15; 16 repeats previous nonzero, 17/18 zero runs)."""
    if br.read(1):  # optional early-stop: cap on symbol-stream reads
        length_nbits = 2 + 2 * br.read(3)
        max_reads = 2 + br.read(length_nbits)
    else:
        max_reads = alphabet_size * 2  # effectively unbounded
    lengths = [0] * alphabet_size
    prev = 8  # spec default when 16 appears before any literal
    symbol = 0
    while symbol < alphabet_size:
        if max_reads == 0:
            break
        max_reads -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[symbol] = prev
                symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        elif cl == 18:
            symbol += 11 + br.read(7)
        else:  # pragma: no cover — alphabet is 0..18
            raise ValueError("bad code-length symbol")
        if symbol > alphabet_size:
            raise ValueError("VP8L code-length run overflow")
    return lengths


def _read_tree(br: _BitReader, alphabet_size: int) -> _Tree:
    if br.read(1):  # simple code: 1 or 2 symbols given literally
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L simple-code symbol invalid")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _Tree(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = _Tree(cl_lengths)
    return _Tree(_read_code_lengths(br, cl_tree, alphabet_size))


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values + 2D distance map
# ---------------------------------------------------------------------------


def _lz77_value(code: int, br: _BitReader) -> int:
    """Prefix-coded length/distance: codes 0-3 are 1-4; beyond that each
    pair of codes doubles the range with (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _build_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry (xoffset, yoffset) near-pixel table for
    distance codes 1..120: the 2D offsets {y=0, x in [1,8]} union
    {y in [1,7], x in [-7,8]} ordered by increasing euclidean distance,
    ties broken by larger y then larger x (the published table follows
    exactly this rule; tests pin the leading entries literally)."""
    offs = [(x, 0) for x in range(1, 9)]
    offs += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    offs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(offs) == 120
    return offs


_DISTANCE_MAP = _build_distance_map()


def _plane_code_to_distance(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DISTANCE_MAP[code - 1]
    dist = dx + dy * width
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image (shared by the ARGB image and all sub-images)
# ---------------------------------------------------------------------------

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_CACHE_MULT = 0x1E35A7BD


def _read_entropy_image(br: _BitReader, w: int, h: int, level0: bool) -> np.ndarray:
    """Decode a w*h ARGB image (uint32 array, row-major). ``level0`` gates
    the meta-prefix header (sub-images always use a single group)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    meta = None
    meta_w = huff_bits = 0
    n_groups = 1
    if level0 and br.read(1):
        huff_bits = br.read(3) + 2
        hs = 1 << huff_bits
        meta_w = (w + hs - 1) // hs
        meta_h = (h + hs - 1) // hs
        meta_img = _read_entropy_image(br, meta_w, meta_h, False)
        # group index = (red << 8) | green of the meta pixel
        meta = [(int(p) >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta) + 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + _NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_tree(br, green_alpha),  # green + length + cache
                _read_tree(br, 256),  # red
                _read_tree(br, 256),  # blue
                _read_tree(br, 256),  # alpha
                _read_tree(br, _NUM_DISTANCE_CODES),
            )
        )

    n = w * h
    pixels = [0] * n
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            group = groups[meta[(y >> huff_bits) * meta_w + (x >> huff_bits)]]
        g_tree, r_tree, b_tree, a_tree, d_tree = group
        s = g_tree.read(br)
        if s < 256:
            r = r_tree.read(br)
            b = b_tree.read(br)
            a = a_tree.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = px
            pos += 1
            if cache_bits:
                cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _lz77_value(s - 256, br)
            dist = _plane_code_to_distance(w, _lz77_value(d_tree.read(br), br))
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > n:
                raise ValueError("VP8L backward reference past image end")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_bits:
                    cache[(_CACHE_MULT * px & 0xFFFFFFFF) >> shift] = px
        else:
            idx = s - 256 - _NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            pixels[pos] = cache[idx]
            pos += 1
    return np.array(pixels, dtype=np.uint32)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
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
    la, lr, lg, lb = _channels(left)
    ta, tr_, tg, tb = _channels(top)
    if mode == 5:
        ra, rr, rg, rb = _channels(tr)
        return _pack(
            _avg2(_avg2(la, ra), ta),
            _avg2(_avg2(lr, rr), tr_),
            _avg2(_avg2(lg, rg), tg),
            _avg2(_avg2(lb, rb), tb),
        )
    ca, cr, cg, cb = _channels(tl)
    if mode == 6:
        return _pack(_avg2(la, ca), _avg2(lr, cr), _avg2(lg, cg), _avg2(lb, cb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_), _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(ca, ta), _avg2(cr, tr_), _avg2(cg, tg), _avg2(cb, tb))
    ra, rr, rg, rb = _channels(tr)
    if mode == 9:
        return _pack(_avg2(ta, ra), _avg2(tr_, rr), _avg2(tg, rg), _avg2(tb, rb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, ca), _avg2(ta, ra)),
            _avg2(_avg2(lr, cr), _avg2(tr_, rr)),
            _avg2(_avg2(lg, cg), _avg2(tg, rg)),
            _avg2(_avg2(lb, cb), _avg2(tb, rb)),
        )
    if mode == 11:  # Select: whichever of L/T the gradient predicts better
        pl = pt = 0
        for lc, tc, cc in ((la, ta, ca), (lr, tr_, cr), (lg, tg, cg), (lb, tb, cb)):
            pred = lc + tc - cc
            pl += abs(pred - lc)
            pt += abs(pred - tc)
        return left if pl < pt else top
    if mode == 12:  # ClampAddSubtractFull(L, T, TL)
        return _pack(
            _clamp255(la + ta - ca),
            _clamp255(lr + tr_ - cr),
            _clamp255(lg + tg - cg),
            _clamp255(lb + tb - cb),
        )
    if mode == 13:  # ClampAddSubtractHalf(Average2(L, T), TL)
        out = []
        for lc, tc, cc in ((la, ta, ca), (lr, tr_, cr), (lg, tg, cg), (lb, tb, cb)):
            ave = _avg2(lc, tc)
            d = ave - cc
            half = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
            out.append(_clamp255(ave + half))
        return _pack(*out)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _inverse_predictor(pixels: np.ndarray, w: int, h: int, bits: int, data: np.ndarray) -> np.ndarray:
    """Add back block-wise predictions (mod 256 per channel). First pixel
    predicts black, first row predicts left, first column predicts top;
    the rightmost column's top-right wraps to the current row's first
    reconstructed pixel (spec rule)."""
    tiles_w = (w + (1 << bits) - 1) >> bits
    out = [int(p) for p in pixels]
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if y == 0:
                mode = 0 if x == 0 else 1
            elif x == 0:
                mode = 2
            else:
                mode = (int(data[(y >> bits) * tiles_w + (x >> bits)]) >> 8) & 0xFF
            left = out[pos - 1] if x else 0
            top = out[pos - w] if y else 0
            tl = out[pos - w - 1] if (x and y) else 0
            tr = out[pos - w + 1] if y else 0  # x==w-1 wraps to row start
            pred = _predict(mode, left, top, tl, tr)
            px = int(pixels[pos])
            out[pos] = (
                ((((px >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
                | ((((px >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
                | ((((px >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
                | ((px & 0xFF) + (pred & 0xFF)) & 0xFF
            )
    return np.array(out, dtype=np.uint32)


def _ct_delta(t: int, c: int) -> int:
    """(int8(t) * int8(c)) >> 5 with arithmetic shift (spec)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(pixels: np.ndarray, w: int, h: int, bits: int, data: np.ndarray) -> np.ndarray:
    """Per-block green→red / green→blue / red→blue decorrelation inverse.
    The transform element rides a pixel: blue=green_to_red,
    green=green_to_blue, red=red_to_blue."""
    tiles_w = (w + (1 << bits) - 1) >> bits
    out = np.empty_like(pixels)
    for y in range(h):
        row = y * w
        trow = (y >> bits) * tiles_w
        for x in range(w):
            px = int(pixels[row + x])
            cte = int(data[trow + (x >> bits)])
            g2r, g2b, r2b = cte & 0xFF, (cte >> 8) & 0xFF, (cte >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + _ct_delta(g2r, g)
            b = (px & 0xFF) + _ct_delta(g2b, g) + _ct_delta(r2b, r & 0xFF)
            out[row + x] = (px & 0xFF00FF00) | ((r & 0xFF) << 16) | (b & 0xFF)
    return out


def _inverse_subtract_green(pixels: np.ndarray) -> np.ndarray:
    g = (pixels >> np.uint32(8)) & np.uint32(0xFF)
    r = (((pixels >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((pixels & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    return (pixels & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _color_index_xbits(n_colors: int) -> int:
    """Pixel-bundling width: <=2 colors pack 8 indices per green byte,
    <=4 pack 4, <=16 pack 2, else unpacked."""
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_color_indexing(pixels: np.ndarray, w: int, h: int, palette: np.ndarray) -> np.ndarray:
    n_colors = len(palette)
    xbits = _color_index_xbits(n_colors)
    out = np.empty(w * h, dtype=np.uint32)
    packed_w = (w + (1 << xbits) - 1) >> xbits
    bpp = 8 >> xbits
    mask = (1 << bpp) - 1
    for y in range(h):
        row = y * w
        prow = y * packed_w
        for x in range(w):
            g = (int(pixels[prow + (x >> xbits)]) >> 8) & 0xFF
            idx = (g >> ((x & ((1 << xbits) - 1)) * bpp)) & mask
            # out-of-range indices map to transparent black (libwebp rule)
            out[row + x] = palette[idx] if idx < n_colors else 0
    return out


# ---------------------------------------------------------------------------
# image stream: transforms + ARGB image
# ---------------------------------------------------------------------------

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEX = 0, 1, 2, 3


def _decode_image_stream(br: _BitReader, w: int, h: int) -> np.ndarray:
    """Top-level image stream: optional transforms (each at most once,
    inverses applied in reverse reading order; color indexing narrows the
    coded width), then the entropy-coded ARGB image."""
    transforms = []  # (type, payload...) in reading order
    seen = set()
    cur_w = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(t)
        if t in (_T_PREDICTOR, _T_COLOR):
            bits = br.read(3) + 2
            bs = 1 << bits
            sub = _read_entropy_image(br, (cur_w + bs - 1) >> bits, (h + bs - 1) >> bits, False)
            transforms.append((t, cur_w, bits, sub))
        elif t == _T_SUBTRACT_GREEN:
            transforms.append((t,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_deltas = _read_entropy_image(br, n_colors, 1, False)
            # palette entries are stored as deltas to the previous entry
            # (componentwise, mod 256)
            pal = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                d = int(pal_deltas[i])
                prev = (
                    ((((prev >> 24) + (d >> 24)) & 0xFF) << 24)
                    | (((((prev >> 16) & 0xFF) + ((d >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((prev >> 8) & 0xFF) + ((d >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((prev & 0xFF) + (d & 0xFF)) & 0xFF)
                )
                pal[i] = prev
            transforms.append((t, cur_w, pal))
            cur_w = (cur_w + (1 << _color_index_xbits(n_colors)) - 1) >> _color_index_xbits(n_colors)
    pixels = _read_entropy_image(br, cur_w, h, True)
    for tf in reversed(transforms):
        if tf[0] == _T_PREDICTOR:
            pixels = _inverse_predictor(pixels, tf[1], h, tf[2], tf[3])
        elif tf[0] == _T_COLOR:
            pixels = _inverse_color_transform(pixels, tf[1], h, tf[2], tf[3])
        elif tf[0] == _T_SUBTRACT_GREEN:
            pixels = _inverse_subtract_green(pixels)
        else:
            pixels = _inverse_color_indexing(pixels, tf[1], h, tf[2])
    return pixels


def decode_vp8l(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a VP8L chunk body → (width, height, (h, w, 4) RGBA uint8)."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint (informative)
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _decode_image_stream(br, w, h)
    if argb.size != w * h:
        raise ValueError("VP8L pixel count mismatch")
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    a = argb.reshape(h, w)
    rgba[..., 0] = (a >> np.uint32(16)) & np.uint32(0xFF)  # R
    rgba[..., 1] = (a >> np.uint32(8)) & np.uint32(0xFF)  # G
    rgba[..., 2] = a & np.uint32(0xFF)  # B
    rgba[..., 3] = (a >> np.uint32(24)) & np.uint32(0xFF)  # A
    return w, h, rgba


def decode_webp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WEBP container walk → first VP8L chunk decoded (VP8X headers
    are skipped; lossy ``VP8 `` raises NotImplementedError — the honest
    library gate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"VP8L":
            return decode_vp8l(payload[pos + 8 : pos + 8 + clen])
        if cid == b"VP8 ":
            raise NotImplementedError("lossy VP8 WEBP requires an image lib")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("no VP8L chunk in WEBP container")
