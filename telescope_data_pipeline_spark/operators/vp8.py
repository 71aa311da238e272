"""Pure-Python lossy VP8 (WebP) key-frame decoder — RFC 6386 subset.

Still-image WebP files carry exactly one VP8 KEY frame (intra-only),
which is what this module decodes: boolean arithmetic decoder, frame
header, intra mode parsing (16x16 modes and full B_PRED 4x4 submodes),
token/coefficient decoding with live probability updates, dequant,
inverse WHT/DCT, all intra predictors, and the normal + simple loop
filters. Inter frames (golden/altref references) raise the typed
``CodecUnavailable`` from multimodal.py — they cannot occur in a
still-image WebP.

The decoder returns the reconstructed Y (luma) plane as float32 — the
grayscale contract of ``decode_image`` (VP8 luma is already the
channel every downstream feature kernel consumes; chroma is decoded
too, so a color consumer can take ``decode_vp8().u/.v``).

Validation (tests/test_vp8.py): self-contained round-trip goldens (a
reference bool/tree/coefficient encoder lives in the tests, following
the repo's VP8L/GIF/TIFF golden pattern) plus the end-to-end decode of
a real libwebp-encoded file (CPython's ``python.webp`` test asset):
arithmetic coding turns any probability-table or state error into
garbage tokens, bitstream overruns, or a desynced partition — so a
clean decode of a real encoder's output is a strong whole-pipeline
check.

Reference parity: the reference pipeline (telescope-data-pipeline,
core.py) reads FITS only; WebP decode belongs to the training-data
media-ingest family (SURVEY.md §2.9), not to a reference port.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import vp8_tables as T

__all__ = ["decode_vp8", "Vp8Frame"]


class _BoolDec:
    """RFC 6386 §7.3 boolean arithmetic decoder (reads past the end of
    the buffer as zero bytes, per the spec's padding convention)."""

    __slots__ = ("data", "pos", "range", "value", "bit_count")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 2
        self.range = 255
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.bit_count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit(128) else v

    def flagged_delta(self, n: int) -> int:
        """``if flag: magnitude L(n) + sign`` header idiom; 0 if unset."""
        return self.signed_literal(n) if self.bit(128) else 0

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


@dataclass
class Vp8Frame:
    width: int
    height: int
    y: np.ndarray  # (H, W) uint8
    u: np.ndarray  # (H/2, W/2) uint8
    v: np.ndarray  # (H/2, W/2) uint8
    filter_level: int = 0
    partitions: int = 1
    ymodes: list = field(default_factory=list)  # per-MB, for tests


def _clamp255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _q(table, idx: int) -> int:
    return table[0 if idx < 0 else (127 if idx > 127 else idx)]


# --- inverse transforms (RFC 6386 §14.3-14.4) --------------------------------

def _iwht4x4(ip: list) -> list:
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # sqrt(2)*cos(pi/8) in Q16, minus one
_C2 = 35468  # sqrt(2)*sin(pi/8) in Q16


def _idct4x4(ip: list) -> list:
    tmp = [0] * 16
    for i in range(4):  # columns
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):  # rows
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# --- whole-plane intra predictors (RFC 6386 §12.2) ---------------------------

def _pred_block(plane: np.ndarray, x: int, y: int, size: int,
                mode: int) -> np.ndarray:
    """DC/V/H/TM prediction for a size x size block at (x, y) in
    ``plane`` (which carries a 1-pixel initialized border at index -1
    via explicit edge handling here)."""
    has_above = y > 0
    has_left = x > 0
    if has_above:
        above = plane[y - 1, x:x + size].astype(np.int32)
    else:
        above = np.full(size, 127, dtype=np.int32)
    if has_left:
        left = plane[y:y + size, x - 1].astype(np.int32)
    else:
        left = np.full(size, 129, dtype=np.int32)
    if mode == T.DC_PRED:
        if has_above and has_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> \
                (int(np.log2(size)) + 1)
        elif has_above:
            dc = (int(above.sum()) + (size >> 1)) >> int(np.log2(size))
        elif has_left:
            dc = (int(left.sum()) + (size >> 1)) >> int(np.log2(size))
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int32)
    if mode == T.V_PRED:
        return np.tile(above, (size, 1))
    if mode == T.H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM_PRED. Corner rule (libwebp frame borders): the whole top row
    # including its corner is 127; below the top row the left border
    # column (and its corner) is 129.
    if not has_above:
        tl = 127
    elif not has_left:
        tl = 129
    else:
        tl = int(plane[y - 1, x - 1])
    p = left[:, None] + above[None, :] - tl
    return np.clip(p, 0, 255)


# --- 4x4 subblock intra predictors (RFC 6386 §12.3) --------------------------

def _pred4(mode: int, a: list, l: list, tl: int) -> list:
    """Predict one 4x4 subblock. ``a``: 8 above pixels (4 above + 4
    above-right), ``l``: 4 left pixels, ``tl``: above-left pixel.
    Returns a row-major 16-list."""
    A, B, C, D, E, F_, G, H = a
    I, J, K, L = l
    M = tl
    o = [0] * 16

    def avg3(x, y, z):
        return (x + 2 * y + z + 2) >> 2

    def avg2(x, y):
        return (x + y + 1) >> 1

    if mode == T.B_DC_PRED:
        dc = (A + B + C + D + I + J + K + L + 4) >> 3
        return [dc] * 16
    if mode == T.B_TM_PRED:
        for r in range(4):
            for c in range(4):
                o[r * 4 + c] = _clamp255(l[r] + a[c] - M)
        return o
    if mode == T.B_VE_PRED:
        row = [avg3(M, A, B), avg3(A, B, C), avg3(B, C, D), avg3(C, D, E)]
        for r in range(4):
            o[r * 4:r * 4 + 4] = row
        return o
    if mode == T.B_HE_PRED:
        col = [avg3(M, I, J), avg3(I, J, K), avg3(J, K, L), avg3(K, L, L)]
        for r in range(4):
            o[r * 4:r * 4 + 4] = [col[r]] * 4
        return o
    if mode == T.B_LD_PRED:
        o[0] = avg3(A, B, C)
        o[1] = o[4] = avg3(B, C, D)
        o[2] = o[5] = o[8] = avg3(C, D, E)
        o[3] = o[6] = o[9] = o[12] = avg3(D, E, F_)
        o[7] = o[10] = o[13] = avg3(E, F_, G)
        o[11] = o[14] = avg3(F_, G, H)
        o[15] = avg3(G, H, H)
        return o
    if mode == T.B_RD_PRED:
        o[12] = avg3(J, K, L)
        o[8] = o[13] = avg3(I, J, K)
        o[4] = o[9] = o[14] = avg3(M, I, J)
        o[0] = o[5] = o[10] = o[15] = avg3(A, M, I)
        o[1] = o[6] = o[11] = avg3(B, A, M)
        o[2] = o[7] = avg3(C, B, A)
        o[3] = avg3(D, C, B)
        return o
    if mode == T.B_VR_PRED:
        o[12] = avg3(K, J, I)
        o[8] = avg3(J, I, M)
        o[4] = o[13] = avg3(I, M, A)
        o[0] = o[9] = avg2(M, A)
        o[5] = o[14] = avg3(M, A, B)
        o[1] = o[10] = avg2(A, B)
        o[6] = o[15] = avg3(A, B, C)
        o[2] = o[11] = avg2(B, C)
        o[7] = avg3(B, C, D)
        o[3] = avg2(C, D)
        return o
    if mode == T.B_VL_PRED:
        o[0] = avg2(A, B)
        o[4] = avg3(A, B, C)
        o[8] = o[1] = avg2(B, C)
        o[12] = o[5] = avg3(B, C, D)
        o[9] = o[2] = avg2(C, D)
        o[13] = o[6] = avg3(C, D, E)
        o[10] = o[3] = avg2(D, E)
        o[14] = o[7] = avg3(D, E, F_)
        o[11] = avg3(E, F_, G)
        o[15] = avg3(F_, G, H)
        return o
    if mode == T.B_HD_PRED:
        o[12] = avg2(L, K)
        o[13] = avg3(L, K, J)
        o[8] = o[14] = avg2(K, J)
        o[9] = o[15] = avg3(K, J, I)
        o[4] = o[10] = avg2(J, I)
        o[5] = o[11] = avg3(J, I, M)
        o[0] = o[6] = avg2(I, M)
        o[1] = o[7] = avg3(I, M, A)
        o[2] = avg3(M, A, B)
        o[3] = avg3(A, B, C)
        return o
    if mode == T.B_HU_PRED:
        o[0] = avg2(I, J)
        o[1] = avg3(I, J, K)
        o[2] = o[4] = avg2(J, K)
        o[3] = o[5] = avg3(J, K, L)
        o[6] = o[8] = avg2(K, L)
        o[7] = o[9] = avg3(K, L, L)
        o[10] = o[11] = o[12] = o[13] = o[14] = o[15] = L
        return o
    raise ValueError(f"bad 4x4 intra mode {mode}")


# --- token / coefficient decoding (RFC 6386 §13) -----------------------------

def _decode_block_coeffs(bd: _BoolDec, probs_plane, ctx: int,
                         first_coeff: int, dq: tuple) -> tuple:
    """Decode one 4x4 block's coefficients. Returns (coeffs-in-raster-
    order scaled by the dequant pair, nonzero_flag)."""
    coeffs = [0] * 16
    i = first_coeff
    nonzero = False
    skip_eob = False  # after a ZERO token, EOB cannot follow
    while i < 16:
        pr = probs_plane[T.COEFF_BANDS[i]][ctx]
        tok = bd.tree(T.COEFF_TREE, pr, start=2 if skip_eob else 0)
        if tok == T.EOB_TOKEN:
            break
        if tok == T.ZERO_TOKEN:
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if tok <= T.FOUR_TOKEN:
            val = tok  # ONE..FOUR tokens carry their value
            ctx = 1 if tok == T.ONE_TOKEN else 2
        else:
            cat = tok - T.CAT1_TOKEN
            extra = 0
            for pbit in T.CAT_PROBS[cat]:
                extra = (extra << 1) | bd.bit(pbit)
            val = T.CAT_BASE[cat] + extra
            ctx = 2
        if bd.bit(128):
            val = -val
        coeffs[T.ZIGZAG[i]] = val * (dq[0] if i == 0 else dq[1])
        nonzero = True
        i += 1
    return coeffs, nonzero


# --- loop filter (RFC 6386 §15) ----------------------------------------------

def _s(v: int) -> int:  # unsigned pixel -> signed, the spec's u2s (v ^ 0x80)
    return v - 128


def _c(v: int) -> int:  # clamp to signed char
    return -128 if v < -128 else (127 if v > 127 else v)


def _u(v: int) -> int:  # signed -> unsigned byte
    return v + 128


def _filter_mask(interior: int, edge: int, p3, p2, p1, p0, q0, q1, q2, q3):
    return (abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
            and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior and abs(q3 - q2) <= interior
            and abs(q2 - q1) <= interior and abs(q1 - q0) <= interior)


def _hev(thresh: int, p1, p0, q0, q1) -> bool:
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _common_adjust(use_outer: bool, px: list) -> int:
    # px = [p1, p0, q0, q1] as SIGNED values; mutated in place
    p1, p0, q0, q1 = px
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    px[2] = q0 - f
    px[1] = p0 + e
    return f


def _subblock_filter(hev: bool, interior: int, edge: int, pix: list):
    """pix = 8 UNSIGNED pixels [p3..q3]; returns filtered copy or None."""
    p3, p2, p1, p0, q0, q1, q2, q3 = pix
    if not _filter_mask(interior, edge, *pix):
        return None
    sp = [_s(p1), _s(p0), _s(q0), _s(q1)]
    f = _common_adjust(hev, sp)
    if not hev:
        a = (f + 1) >> 1
        sp[3] = _s(q1) - a
        sp[0] = _s(p1) + a
    return [p3, p2, _u(_c(sp[0])), _u(_c(sp[1])),
            _u(_c(sp[2])), _u(_c(sp[3])), q2, q3]


def _mbedge_filter(hev: bool, interior: int, edge: int, pix: list):
    p3, p2, p1, p0, q0, q1, q2, q3 = pix
    if not _filter_mask(interior, edge, *pix):
        return None
    if hev:
        sp = [_s(p1), _s(p0), _s(q0), _s(q1)]
        _common_adjust(True, sp)
        return [p3, p2, _u(_c(sp[0])), _u(_c(sp[1])),
                _u(_c(sp[2])), _u(_c(sp[3])), q2, q3]
    sp1, sp0, sq0, sq1 = _s(p1), _s(p0), _s(q0), _s(q1)
    sp2, sq2 = _s(p2), _s(q2)
    w = _c(_c(sp1 - sq1) + 3 * (sq0 - sp0))
    a = _c((27 * w + 63) >> 7)
    sq0 -= a
    sp0 += a
    a = _c((18 * w + 63) >> 7)
    sq1 -= a
    sp1 += a
    a = _c((9 * w + 63) >> 7)
    sq2 -= a
    sp2 += a
    return [p3, _u(_c(sp2)), _u(_c(sp1)), _u(_c(sp0)),
            _u(_c(sq0)), _u(_c(sq1)), _u(_c(sq2)), q3]


def _simple_filter(edge: int, pix: list):
    p1, p0, q0, q1 = pix
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > edge:
        return None
    sp = [_s(p1), _s(p0), _s(q0), _s(q1)]
    _common_adjust(True, sp)
    return [p1, _u(_c(sp[1])), _u(_c(sp[2])), q1]


def _loop_filter(frame: "Vp8Frame", hdr: dict, mb_info: list) -> None:
    """Frame-level loop filter pass (RFC 6386 §15.1 ordering: per MB,
    left edge, inner vertical, top edge, inner horizontal)."""
    level0 = hdr["filter_level"]
    if level0 == 0:
        return
    simple = hdr["filter_type"] == 1
    sharp = hdr["sharpness"]
    mb_w, mb_h = hdr["mb_w"], hdr["mb_h"]
    planes = (frame.y,) if simple else (frame.y, frame.u, frame.v)
    for mby in range(mb_h):
        for mbx in range(mb_w):
            info = mb_info[mby * mb_w + mbx]
            level = level0
            if hdr["seg_enabled"]:
                d = hdr["seg_lf"][info["segment"]]
                level = d if hdr["seg_abs"] else level + d
            if hdr["lf_delta_enabled"]:
                level += hdr["ref_lf_delta"][0]  # intra frame
                if info["ymode"] == T.B_PRED:
                    level += hdr["mode_lf_delta"][0]
            level = 0 if level < 0 else (63 if level > 63 else level)
            if level == 0:
                continue
            interior = level
            if sharp:
                interior >>= 2 if sharp > 4 else 1
                if interior > 9 - sharp:
                    interior = 9 - sharp
            if interior < 1:
                interior = 1
            mb_edge = ((level + 2) * 2) + interior
            sb_edge = (level * 2) + interior
            if level >= 40:
                hev_t = 2
            elif level >= 15:
                hev_t = 1
            else:
                hev_t = 0
            inner = (not info["skip"]) or info["ymode"] == T.B_PRED
            if simple:
                _filter_mb_simple(frame.y, mbx, mby, mb_edge, sb_edge,
                                  inner)
                continue
            for pi, plane in enumerate(planes):
                size = 16 if pi == 0 else 8
                px0, py0 = mbx * size, mby * size
                h_, w_ = plane.shape
                # left MB edge (vertical)
                if mbx > 0:
                    _filter_edge(plane, px0, py0, size, True, True,
                                 interior, mb_edge, hev_t)
                if inner:
                    for off in range(4, size, 4):
                        _filter_edge(plane, px0 + off, py0, size, True,
                                     False, interior, sb_edge, hev_t)
                # top MB edge (horizontal)
                if mby > 0:
                    _filter_edge(plane, px0, py0, size, False, True,
                                 interior, mb_edge, hev_t)
                if inner:
                    for off in range(4, size, 4):
                        _filter_edge(plane, px0, py0 + off, size, False,
                                     False, interior, sb_edge, hev_t)


def _filter_edge(plane: np.ndarray, ex: int, ey: int, length: int,
                 vertical: bool, mb: bool, interior: int, edge: int,
                 hev_t: int) -> None:
    for k in range(length):
        if vertical:
            y, x = ey + k, ex
            pix = [int(plane[y, x - 4 + j]) for j in range(8)]
        else:
            y, x = ey, ex + k
            pix = [int(plane[y - 4 + j, x]) for j in range(8)]
        hev = _hev(hev_t, pix[2], pix[3], pix[4], pix[5])
        out = (_mbedge_filter if mb else _subblock_filter)(
            hev, interior, edge, pix)
        if out is None:
            continue
        if vertical:
            for j in range(8):
                plane[y, x - 4 + j] = out[j]
        else:
            for j in range(8):
                plane[y - 4 + j, x] = out[j]


def _filter_mb_simple(y: np.ndarray, mbx: int, mby: int, mb_edge: int,
                      sb_edge: int, inner: bool) -> None:
    px0, py0 = mbx * 16, mby * 16
    edges = []
    if mbx > 0:
        edges.append((px0, True, mb_edge))
    if inner:
        edges += [(px0 + o, True, sb_edge) for o in (4, 8, 12)]
    for ex, _, lim in edges:
        for k in range(16):
            row = py0 + k
            pix = [int(y[row, ex - 2 + j]) for j in range(4)]
            out = _simple_filter(lim, pix)
            if out is not None:
                for j in range(4):
                    y[row, ex - 2 + j] = out[j]
    edges = []
    if mby > 0:
        edges.append((py0, False, mb_edge))
    if inner:
        edges += [(py0 + o, False, sb_edge) for o in (4, 8, 12)]
    for ey, _, lim in edges:
        for k in range(16):
            col = px0 + k
            pix = [int(y[ey - 2 + j, col]) for j in range(4)]
            out = _simple_filter(lim, pix)
            if out is not None:
                for j in range(4):
                    y[ey - 2 + j, col] = out[j]


# --- frame decode ------------------------------------------------------------

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def decode_vp8(data: bytes, loop_filter: bool = True,
               strict: bool = False) -> Vp8Frame:
    """Decode a VP8 KEY frame (the payload of a ``VP8 `` RIFF chunk).

    ``strict=True`` additionally requires every bitstream partition to
    be consumed to within the encoder's flush slack. This is the
    fail-loud integrity gate for REAL-WORLD files: a correct arithmetic
    decode always drains the partitions the encoder sized for its own
    tokens, while any desync (e.g. a defect in the normative
    probability tables, which RFC 6386 publishes as ~3,000 constants
    this module reproduces from its text) surfaces as an under-read —
    raising here instead of returning silently wrong pixels."""
    if len(data) < 10:
        raise ValueError("VP8 payload too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8 inter frame: still-image WebP carries a "
                         "key frame only")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8 key-frame start code missing")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("VP8 frame with zero dimension")
    if 10 + part1_size > len(data):
        raise ValueError("VP8 first partition overruns payload")
    bd = _BoolDec(data[10:10 + part1_size])

    hdr: dict = {"mb_w": (width + 15) // 16, "mb_h": (height + 15) // 16}
    bd.literal(1)  # color space (must be 0 for the profile we decode)
    bd.literal(1)  # clamping type (decoder always clamps; informative)

    # segmentation (§9.3)
    hdr["seg_enabled"] = bool(bd.literal(1))
    hdr["seg_abs"] = False
    hdr["seg_q"] = [0, 0, 0, 0]
    hdr["seg_lf"] = [0, 0, 0, 0]
    seg_update_map = False
    seg_tree_probs = [255, 255, 255]
    if hdr["seg_enabled"]:
        seg_update_map = bool(bd.literal(1))
        update_data = bool(bd.literal(1))
        if update_data:
            hdr["seg_abs"] = bool(bd.literal(1))
            for i in range(4):
                hdr["seg_q"][i] = bd.flagged_delta(7)
            for i in range(4):
                hdr["seg_lf"][i] = bd.flagged_delta(6)
        if seg_update_map:
            for i in range(3):
                seg_tree_probs[i] = bd.literal(8) if bd.bit(128) else 255

    # loop filter (§9.4)
    hdr["filter_type"] = bd.literal(1)
    hdr["filter_level"] = bd.literal(6)
    hdr["sharpness"] = bd.literal(3)
    hdr["lf_delta_enabled"] = bool(bd.literal(1))
    hdr["ref_lf_delta"] = [0, 0, 0, 0]
    hdr["mode_lf_delta"] = [0, 0, 0, 0]
    if hdr["lf_delta_enabled"]:
        if bd.literal(1):  # deltas updated this frame
            for i in range(4):
                if bd.bit(128):
                    hdr["ref_lf_delta"][i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit(128):
                    hdr["mode_lf_delta"][i] = bd.signed_literal(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    hdr["n_parts"] = n_parts
    part_base = 10 + part1_size
    sizes_bytes = 3 * (n_parts - 1)
    if part_base + sizes_bytes > len(data):
        raise ValueError("VP8 partition size table overruns payload")
    offs = part_base + sizes_bytes
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            o = part_base + 3 * i
            sz = data[o] | (data[o + 1] << 8) | (data[o + 2] << 16)
        else:
            sz = len(data) - offs
        if sz < 0 or offs + sz > len(data):
            raise ValueError("VP8 token partition overruns payload")
        parts.append(_BoolDec(data[offs:offs + sz]))
        offs += sz

    # quantizers (§9.6)
    y_ac_qi = bd.literal(7)
    y_dc_d = bd.flagged_delta(4)
    y2_dc_d = bd.flagged_delta(4)
    y2_ac_d = bd.flagged_delta(4)
    uv_dc_d = bd.flagged_delta(4)
    uv_ac_d = bd.flagged_delta(4)

    def dequant_for(seg: int) -> dict:
        qi = y_ac_qi
        if hdr["seg_enabled"]:
            qi = hdr["seg_q"][seg] if hdr["seg_abs"] \
                else qi + hdr["seg_q"][seg]
        qi = 0 if qi < 0 else (127 if qi > 127 else qi)
        y2dc = _q(T.DC_QLOOKUP, qi + y2_dc_d) * 2
        y2ac = _q(T.AC_QLOOKUP, qi + y2_ac_d) * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = _q(T.DC_QLOOKUP, qi + uv_dc_d)
        if uvdc > 132:
            uvdc = 132
        return {
            "y": (_q(T.DC_QLOOKUP, qi + y_dc_d), _q(T.AC_QLOOKUP, qi)),
            "y2": (y2dc, y2ac),
            "uv": (uvdc, _q(T.AC_QLOOKUP, qi + uv_ac_d)),
        }

    dequants = [dequant_for(s) for s in range(4)]

    bd.literal(1)  # refresh_entropy_probs (key frame: state is per-image)

    # live token probabilities, then header-driven updates (§13.4)
    probs = [[[list(T.DEFAULT_COEFF_PROBS[i][j][k]) for k in range(3)]
              for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bit(T.COEFF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)

    mb_no_skip = bd.literal(1)
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    mb_w, mb_h = hdr["mb_w"], hdr["mb_h"]

    # --- pass 1: per-MB modes (still the first partition) -------------------
    mb_info = []
    # subblock-mode context rows (B_DC_PRED outside the frame)
    above_bmodes = [[T.B_DC_PRED] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_bmodes = [T.B_DC_PRED] * 4
        for mbx in range(mb_w):
            seg = 0
            if seg_update_map:
                seg = bd.tree(_SEGMENT_TREE, seg_tree_probs)
            skip_flag = bool(bd.bit(prob_skip_false)) if mb_no_skip \
                else False
            ymode = bd.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB)
            if ymode == T.B_PRED:
                bmodes = [0] * 16
                for r in range(4):
                    for c in range(4):
                        above = above_bmodes[mbx][c] if r == 0 \
                            else bmodes[(r - 1) * 4 + c]
                        left = left_bmodes[r] if c == 0 \
                            else bmodes[r * 4 + c - 1]
                        bmodes[r * 4 + c] = bd.tree(
                            T.BMODE_TREE, T.KF_B_MODE_PROB[above][left])
            else:
                bmodes = [T.YMODE_TO_BMODE[ymode]] * 16
            above_bmodes[mbx] = bmodes[12:16]
            left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            uvmode = bd.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB)
            mb_info.append({"segment": seg, "skip": skip_flag,
                            "ymode": ymode, "bmodes": bmodes,
                            "uvmode": uvmode})

    # --- pass 2: tokens + reconstruction ------------------------------------
    yw, yh = mb_w * 16, mb_h * 16
    y_plane = np.zeros((yh, yw), dtype=np.uint8)
    u_plane = np.zeros((yh // 2, yw // 2), dtype=np.uint8)
    v_plane = np.zeros((yh // 2, yw // 2), dtype=np.uint8)

    # nonzero-coefficient contexts: above[mb_x] and left, per plane
    zero_ctx = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
    above_ctx = [{k: (list(v) if isinstance(v, list) else v)
                  for k, v in zero_ctx.items()} for _ in range(mb_w)]

    for mby in range(mb_h):
        left_ctx = {k: (list(v) if isinstance(v, list) else v)
                    for k, v in zero_ctx.items()}
        td = parts[mby % n_parts]
        for mbx in range(mb_w):
            info = mb_info[mby * mb_w + mbx]
            dq = dequants[info["segment"]]
            has_y2 = info["ymode"] != T.B_PRED
            ac = above_ctx[mbx]
            coeffs_y = [[0] * 16 for _ in range(16)]
            coeffs_u = [[0] * 16 for _ in range(4)]
            coeffs_v = [[0] * 16 for _ in range(4)]
            mb_nonzero = False

            if info["skip"]:
                # no tokens: clear contexts (Y2 context persists for
                # B_PRED macroblocks, which have no Y2 block)
                ac["y"] = [0] * 4
                ac["u"] = [0] * 2
                ac["v"] = [0] * 2
                left_ctx["y"] = [0] * 4
                left_ctx["u"] = [0] * 2
                left_ctx["v"] = [0] * 2
                if has_y2:
                    ac["y2"] = 0
                    left_ctx["y2"] = 0
            else:
                first = 0
                if has_y2:
                    ctx = ac["y2"] + left_ctx["y2"]
                    y2c, nz = _decode_block_coeffs(
                        td, probs[1], ctx, 0, dq["y2"])
                    ac["y2"] = left_ctx["y2"] = int(nz)
                    mb_nonzero |= nz
                    wht = _iwht4x4(y2c)
                    first = 1
                plane = 0 if has_y2 else 3
                for b in range(16):
                    r, c = b // 4, b % 4
                    ctx = ac["y"][c] + left_ctx["y"][r]
                    cf, nz = _decode_block_coeffs(
                        td, probs[plane], ctx, first, dq["y"])
                    ac["y"][c] = left_ctx["y"][r] = int(nz)
                    mb_nonzero |= nz
                    if has_y2:
                        cf[0] = wht[b]
                        mb_nonzero |= cf[0] != 0
                    coeffs_y[b] = cf
                for which, store, ctxk in ((coeffs_u, "u", "u"),
                                           (coeffs_v, "v", "v")):
                    for b in range(4):
                        r, c = b // 2, b % 2
                        ctx = ac[ctxk][c] + left_ctx[ctxk][r]
                        cf, nz = _decode_block_coeffs(
                            td, probs[2], ctx, 0, dq["uv"])
                        ac[ctxk][c] = left_ctx[ctxk][r] = int(nz)
                        mb_nonzero |= nz
                        which[b] = cf
                info["skip"] = not mb_nonzero  # loop-filter inner rule

            # ---- reconstruction ----
            x0, y0 = mbx * 16, mby * 16
            if has_y2:
                pred = _pred_block(y_plane, x0, y0, 16, info["ymode"])
                for b in range(16):
                    r, c = b // 4, b % 4
                    res = _idct4x4(coeffs_y[b])
                    blk = pred[r * 4:r * 4 + 4, c * 4:c * 4 + 4] + \
                        np.array(res, dtype=np.int32).reshape(4, 4)
                    y_plane[y0 + r * 4:y0 + r * 4 + 4,
                            x0 + c * 4:x0 + c * 4 + 4] = \
                        np.clip(blk, 0, 255).astype(np.uint8)
            else:
                # B_PRED: per-subblock predict+add in scan order
                top_right = _top_right_pixels(y_plane, x0, y0, mbx, mb_w)
                for b in range(16):
                    r, c = b // 4, b % 4
                    bx, by = x0 + c * 4, y0 + r * 4
                    a = _above8(y_plane, bx, by, c, top_right)
                    l = [int(y_plane[by + j, bx - 1]) if bx > 0 else 129
                         for j in range(4)]
                    if by > 0 and bx > 0:
                        tl = int(y_plane[by - 1, bx - 1])
                    elif by > 0:
                        tl = 129
                    else:
                        tl = 127
                    pred4 = _pred4(info["bmodes"][b], a, l, tl)
                    res = _idct4x4(coeffs_y[b])
                    for j in range(16):
                        rr, cc = j // 4, j % 4
                        y_plane[by + rr, bx + cc] = _clamp255(
                            pred4[j] + res[j])
            for which, plane, off in ((coeffs_u, u_plane, 0),
                                      (coeffs_v, v_plane, 0)):
                cx0, cy0 = mbx * 8, mby * 8
                pred = _pred_block(plane, cx0, cy0, 8, info["uvmode"])
                for b in range(4):
                    r, c = b // 2, b % 2
                    res = _idct4x4(which[b])
                    blk = pred[r * 4:r * 4 + 4, c * 4:c * 4 + 4] + \
                        np.array(res, dtype=np.int32).reshape(4, 4)
                    plane[cy0 + r * 4:cy0 + r * 4 + 4,
                          cx0 + c * 4:cx0 + c * 4 + 4] = \
                        np.clip(blk, 0, 255).astype(np.uint8)

    if strict:
        # every partition the encoder wrote must be drained (modulo the
        # bool-coder's ~4-byte flush + 2-byte init lookahead); an
        # under-read partition means the token decode desynced
        for pi, bdp in enumerate(parts):
            if len(bdp.data) >= 16 and bdp.pos < len(bdp.data) - 8:
                raise ValueError(
                    "VP8 token partition %d under-consumed (%d of %d "
                    "bytes): arithmetic decode desynced; refusing to "
                    "return unverified pixels" %
                    (pi, bdp.pos, len(bdp.data)))

    frame = Vp8Frame(width=width, height=height,
                     y=y_plane, u=u_plane, v=v_plane,
                     filter_level=hdr["filter_level"],
                     partitions=n_parts,
                     ymodes=[m["ymode"] for m in mb_info])
    if loop_filter:
        _loop_filter(frame, hdr, mb_info)
    frame.y = frame.y[:height, :width]
    frame.u = frame.u[:(height + 1) // 2, :(width + 1) // 2]
    frame.v = frame.v[:(height + 1) // 2, :(width + 1) // 2]
    return frame


def _top_right_pixels(y_plane: np.ndarray, x0: int, y0: int, mbx: int,
                      mb_w: int) -> list:
    """The 4 above-right pixels every right-edge subblock of a B_PRED
    macroblock shares (libwebp/libvpx behavior): the above MB row's
    pixels at columns x0+16..x0+19; 127 on the top row; the above
    row's last in-frame pixel replicated on the rightmost column."""
    if y0 == 0:
        return [127, 127, 127, 127]
    if mbx >= mb_w - 1:
        edge = int(y_plane[y0 - 1, x0 + 15])
        return [edge] * 4
    return [int(y_plane[y0 - 1, x0 + 16 + j]) for j in range(4)]


def _above8(y_plane: np.ndarray, bx: int, by: int, c: int,
            top_right: list) -> list:
    """8 above pixels (4 above + 4 above-right) for subblock prediction."""
    if by == 0:
        return [127] * 8
    a = [int(y_plane[by - 1, bx + j]) for j in range(4)]
    if c == 3:  # right edge of the MB: the shared top-right pixels
        return a + top_right
    return a + [int(y_plane[by - 1, bx + 4 + j]) for j in range(4)]
