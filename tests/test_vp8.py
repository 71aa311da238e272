"""Lossy VP8 (WebP) decoder goldens.

Follows the repo's VP8L/GIF/TIFF/FLAC pattern: a REFERENCE ENCODER
lives here in the tests (RFC 6386 §7.4 boolean encoder + a key-frame
writer) and round-trips through the pure-Python decoder — boolean
coder, frame header, mode trees, token/coefficient decode with context
tracking, dequant, inverse WHT/DCT, every intra predictor family, skip
handling, multiple token partitions, and the loop filter (pinned by
hand-computed RFC §15 arithmetic).

A REAL libwebp-encoded file (CPython's ``python.webp`` test asset,
PSF-licensed public test data) pins the parts that are provable
offline: container walk, frame-header field values, and the ALPH
(VP8L-compressed alpha) plane golden. Its token stream also documents
the STRICT-mode contract: the normative RFC 6386 probability tables
are ~3,000 published constants reproduced from the spec text, and a
table defect desyncs arithmetic decoding — strict mode detects the
under-read and raises instead of returning unverified pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

import telescope_data_pipeline_spark.operators.vp8_tables as T
from telescope_data_pipeline_spark.operators.vp8 import (
    _BoolDec,
    _idct4x4,
    _iwht4x4,
    _mbedge_filter,
    _simple_filter,
    _subblock_filter,
    decode_vp8,
)

# ---------------------------------------------------------------------------
# reference boolean encoder (RFC 6386 §7.4 / libvpx boolhuff form)
# ---------------------------------------------------------------------------


def _norm_shift(r: int) -> int:
    s = 0
    while r < 128:
        r <<= 1
        s += 1
    return s


class _BoolEnc:
    def __init__(self) -> None:
        self.low = 0
        self.range = 255
        self.count = -24
        self.buf = bytearray()

    def bit(self, b: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if b:
            self.low += split
            self.range -= split
        else:
            self.range = split
        shift = _norm_shift(self.range)
        self.range <<= shift
        self.count += shift
        if self.count >= 0:
            offset = shift - self.count
            if offset > 0 and ((self.low << (offset - 1)) & 0x80000000):
                i = len(self.buf) - 1
                while i >= 0 and self.buf[i] == 0xFF:
                    self.buf[i] = 0
                    i -= 1
                if i >= 0:
                    self.buf[i] += 1
            self.buf.append((self.low >> (24 - offset)) & 0xFF)
            self.low = (self.low << offset) & 0xFFFFFF
            shift = self.count
            self.count -= 8
        self.low = (self.low << shift) & 0xFFFFFFFF

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1, 128)

    def tree(self, tree: tuple, probs, leaf: int) -> None:
        # walk the tree to the leaf, emitting branch bits
        path = self._path(tree, leaf, 0)
        assert path is not None, f"leaf {leaf} unreachable"
        i = 0
        for b in path:
            self.bit(b, probs[i >> 1])
            i = tree[i + b]

    def _path(self, tree: tuple, leaf: int, i: int):
        for b in (0, 1):
            nxt = tree[i + b]
            if nxt == -leaf and nxt <= 0:
                return [b]
            if nxt > 0:
                sub = self._path(tree, leaf, nxt)
                if sub is not None:
                    return [b] + sub
        return None

    def stop(self) -> bytes:
        for _ in range(32):
            self.bit(0, 128)
        return bytes(self.buf)


def test_bool_coder_roundtrip_random():
    rng = np.random.default_rng(42)
    for trial in range(8):
        n = 500
        bits = rng.integers(0, 2, size=n)
        probs = rng.integers(1, 255, size=n)
        enc = _BoolEnc()
        for b, p in zip(bits, probs):
            enc.bit(int(b), int(p))
        data = enc.stop()
        dec = _BoolDec(data)
        got = [dec.bit(int(p)) for p in probs]
        assert got == [int(b) for b in bits], f"trial {trial}"


def test_bool_coder_literal_and_tree_roundtrip():
    enc = _BoolEnc()
    enc.literal(26, 7)
    enc.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB, T.B_PRED)
    enc.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB, T.TM_PRED)
    enc.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB, T.H_PRED)
    enc.tree(T.BMODE_TREE, T.KF_B_MODE_PROB[0][0], T.B_HU_PRED)
    data = enc.stop()
    dec = _BoolDec(data)
    assert dec.literal(7) == 26
    assert dec.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB) == T.B_PRED
    assert dec.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB) == T.TM_PRED
    assert dec.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB) == T.H_PRED
    assert dec.tree(T.BMODE_TREE, T.KF_B_MODE_PROB[0][0]) == T.B_HU_PRED


# ---------------------------------------------------------------------------
# inverse transforms vs an independent (vectorized) twin
# ---------------------------------------------------------------------------


def _idct4x4_twin(coeffs):
    """Vectorized twin of the RFC §14.4 integer IDCT."""
    ip = np.asarray(coeffs, dtype=np.int64).reshape(4, 4)

    def pass_(m, final):
        a1 = m[0] + m[2]
        b1 = m[0] - m[2]
        c1 = (m[1] * 35468 >> 16) - (m[3] + (m[3] * 20091 >> 16))
        d1 = (m[1] + (m[1] * 20091 >> 16)) + (m[3] * 35468 >> 16)
        rows = [a1 + d1, b1 + c1, b1 - c1, a1 - d1]
        if final:
            rows = [(r + 4) >> 3 for r in rows]
        return np.stack(rows)

    t = pass_(ip, False)          # columns
    out = pass_(t.T, True).T      # rows
    return out.reshape(-1).tolist()


def test_idct_matches_twin():
    rng = np.random.default_rng(3)
    for _ in range(50):
        c = rng.integers(-2048, 2048, size=16).tolist()
        assert _idct4x4(c) == _idct4x4_twin(c)
    # DC-only pin: uniform (dc + 4) >> 3
    assert _idct4x4([100] + [0] * 15) == [(100 + 4) >> 3] * 16
    assert _idct4x4([-24] + [0] * 15) == [(-24 + 4) >> 3] * 16


def test_iwht_matches_twin():
    def twin(coeffs):
        ip = np.asarray(coeffs, dtype=np.int64).reshape(4, 4)
        a1 = ip[0] + ip[3]
        b1 = ip[1] + ip[2]
        c1 = ip[1] - ip[2]
        d1 = ip[0] - ip[3]
        t = np.stack([a1 + b1, c1 + d1, a1 - b1, d1 - c1])
        a1 = t[:, 0] + t[:, 3]
        b1 = t[:, 1] + t[:, 2]
        c1 = t[:, 1] - t[:, 2]
        d1 = t[:, 0] - t[:, 3]
        out = np.stack([(a1 + b1 + 3) >> 3, (c1 + d1 + 3) >> 3,
                        (a1 - b1 + 3) >> 3, (d1 - c1 + 3) >> 3], axis=1)
        return out.reshape(-1).tolist()

    rng = np.random.default_rng(4)
    for _ in range(50):
        c = rng.integers(-4096, 4096, size=16).tolist()
        assert _iwht4x4(c) == twin(c)


# ---------------------------------------------------------------------------
# loop-filter kernels vs hand-computed RFC §15 arithmetic
# ---------------------------------------------------------------------------


def test_subblock_filter_no_hev_golden():
    # p: 100s, q: 120s -> a=3*20=60, F=8, E=7, refine a=(8+1)>>1=4
    out = _subblock_filter(False, 63, 63,
                           [100, 100, 100, 100, 120, 120, 120, 120])
    assert out == [100, 100, 104, 107, 112, 116, 120, 120]


def test_subblock_filter_hev_golden():
    # hev: outer taps only, no refinement of p1/q1
    out = _subblock_filter(True, 63, 200,
                           [100, 100, 100, 90, 150, 150, 150, 150])
    assert out == [100, 100, 100, 105, 135, 150, 150, 150]


def test_subblock_filter_mask_rejects():
    assert _subblock_filter(False, 2, 5,
                            [100, 100, 100, 100, 200, 200, 200, 200]) is None


def test_mbedge_filter_no_hev_golden():
    # w=120: taps 27/18/9 -> ramp 100,108,117,125,135,143,152,160
    out = _mbedge_filter(False, 200, 160,
                         [100, 100, 100, 100, 160, 160, 160, 160])
    assert out == [100, 108, 117, 125, 135, 143, 152, 160]


def test_simple_filter_golden():
    assert _simple_filter(100, [100, 100, 140, 140]) == [100, 110, 130, 140]


# ---------------------------------------------------------------------------
# key-frame writer (reference encoder)
# ---------------------------------------------------------------------------


class _FrameWriter:
    """Minimal RFC 6386 key-frame bitstream writer for goldens."""

    def __init__(self, mb_w: int, mb_h: int, q_index: int = 8,
                 filter_level: int = 0, n_parts: int = 1,
                 use_skip: bool = False, skip_prob: int = 128) -> None:
        self.mb_w, self.mb_h, self.qi = mb_w, mb_h, q_index
        self.filter_level = filter_level
        self.n_parts = n_parts
        self.use_skip = use_skip
        self.skip_prob = skip_prob
        self.mbs = []  # (ymode, bmodes|None, uvmode, skip, blocks)

    def add_mb(self, ymode, uvmode=T.DC_PRED, bmodes=None, skip=False,
               y2=None, y=None, u=None, v=None):
        """Block coefficient lists are SCAN-ORDER quantization levels."""
        self.mbs.append(dict(ymode=ymode, uvmode=uvmode, bmodes=bmodes,
                             skip=skip, y2=y2 or [],
                             y=y or [[] for _ in range(16)],
                             u=u or [[] for _ in range(4)],
                             v=v or [[] for _ in range(4)]))

    # --- token writing -----------------------------------------------------

    @staticmethod
    def _write_token_value(enc, pr, level, skip_eob):
        a = abs(level)
        if a == 0:
            tok = T.ZERO_TOKEN
        elif a <= 4:
            tok = a  # ONE..FOUR
        else:
            for cat in range(5, -1, -1):
                if a >= T.CAT_BASE[cat]:
                    tok = T.CAT1_TOKEN + cat
                    break
        enc.tree(T.COEFF_TREE[2:] if False else T.COEFF_TREE, pr, tok) \
            if not skip_eob else None
        if skip_eob:
            # emit the tree path starting below the EOB branch
            path = enc._path(T.COEFF_TREE, tok, 2)
            i = 2
            for b in path:
                enc.bit(b, pr[i >> 1])
                i = T.COEFF_TREE[i + b]
        if a == 0:
            return 0
        if a > 4:
            cat = tok - T.CAT1_TOKEN
            extra = a - T.CAT_BASE[cat]
            nb = len(T.CAT_PROBS[cat])
            for j in range(nb - 1, -1, -1):
                enc.bit((extra >> j) & 1, T.CAT_PROBS[cat][nb - 1 - j])
        enc.bit(1 if level < 0 else 0, 128)
        return 1 if a == 1 else 2

    def _write_block(self, enc, probs_plane, ctx, first, levels):
        # levels: scan-order ints beginning at `first`; implicit EOB after
        i = first
        skip_eob = False
        for lv in levels:
            pr = probs_plane[T.COEFF_BANDS[i]][ctx]
            ctx2 = self._write_token_value(enc, pr, lv, skip_eob)
            if lv == 0:
                ctx = 0
                skip_eob = True
            else:
                ctx = ctx2
                skip_eob = False
            i += 1
        if i < 16:
            pr = probs_plane[T.COEFF_BANDS[i]][ctx]
            assert not skip_eob, "trailing zeros must be trimmed"
            enc.tree(T.COEFF_TREE, pr, T.EOB_TOKEN)
        return int(any(lv != 0 for lv in levels))

    # --- assembly ----------------------------------------------------------

    def build(self) -> bytes:
        probs = T.DEFAULT_COEFF_PROBS
        # part 1: header + modes
        e = _BoolEnc()
        e.literal(0, 1)  # color space
        e.literal(0, 1)  # clamping
        e.literal(0, 1)  # segmentation off
        e.literal(0, 1)  # filter type: normal
        e.literal(self.filter_level, 6)
        e.literal(0, 3)  # sharpness
        e.literal(0, 1)  # lf deltas off
        e.literal({1: 0, 2: 1, 4: 2, 8: 3}[self.n_parts], 2)
        e.literal(self.qi, 7)
        for _ in range(5):
            e.bit(0, 128)  # no quantizer deltas
        e.literal(1, 1)  # refresh entropy probs
        for i in range(4):
            for j in range(8):
                for k in range(3):
                    for l in range(11):
                        e.bit(0, T.COEFF_UPDATE_PROBS[i][j][k][l])
        e.literal(1 if self.use_skip else 0, 1)
        if self.use_skip:
            e.literal(self.skip_prob, 8)
        above = [[T.B_DC_PRED] * 4 for _ in range(self.mb_w)]
        for mby in range(self.mb_h):
            left = [T.B_DC_PRED] * 4
            for mbx in range(self.mb_w):
                mb = self.mbs[mby * self.mb_w + mbx]
                if self.use_skip:
                    e.bit(1 if mb["skip"] else 0, self.skip_prob)
                e.tree(T.KF_YMODE_TREE, T.KF_YMODE_PROB, mb["ymode"])
                if mb["ymode"] == T.B_PRED:
                    bm = mb["bmodes"]
                    for r in range(4):
                        for c in range(4):
                            a = above[mbx][c] if r == 0 else bm[(r - 1) * 4 + c]
                            lft = left[r] if c == 0 else bm[r * 4 + c - 1]
                            e.tree(T.BMODE_TREE, T.KF_B_MODE_PROB[a][lft],
                                   bm[r * 4 + c])
                else:
                    bm = [T.YMODE_TO_BMODE[mb["ymode"]]] * 16
                e.tree(T.UV_MODE_TREE, T.KF_UV_MODE_PROB, mb["uvmode"])
                above[mbx] = bm[12:16]
                left = [bm[3], bm[7], bm[11], bm[15]]
        part1 = e.stop()

        # token partitions (row i -> partition i % n_parts)
        encs = [_BoolEnc() for _ in range(self.n_parts)]
        zero = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2, "y2": 0}
        above_ctx = [{k: (list(v) if isinstance(v, list) else v)
                      for k, v in zero.items()} for _ in range(self.mb_w)]
        for mby in range(self.mb_h):
            te = encs[mby % self.n_parts]
            left_ctx = {k: (list(v) if isinstance(v, list) else v)
                        for k, v in zero.items()}
            for mbx in range(self.mb_w):
                mb = self.mbs[mby * self.mb_w + mbx]
                ac = above_ctx[mbx]
                has_y2 = mb["ymode"] != T.B_PRED
                if self.use_skip and mb["skip"]:
                    ac["y"] = [0] * 4
                    ac["u"] = [0] * 2
                    ac["v"] = [0] * 2
                    left_ctx["y"] = [0] * 4
                    left_ctx["u"] = [0] * 2
                    left_ctx["v"] = [0] * 2
                    if has_y2:
                        ac["y2"] = 0
                        left_ctx["y2"] = 0
                    continue
                first = 0
                if has_y2:
                    nz = self._write_block(
                        te, probs[1], ac["y2"] + left_ctx["y2"], 0, mb["y2"])
                    ac["y2"] = left_ctx["y2"] = nz
                    first = 1
                plane = 0 if has_y2 else 3
                for b in range(16):
                    r, c = b // 4, b % 4
                    nz = self._write_block(
                        te, probs[plane], ac["y"][c] + left_ctx["y"][r],
                        first, mb["y"][b])
                    ac["y"][c] = left_ctx["y"][r] = nz
                for key, blocks in (("u", mb["u"]), ("v", mb["v"])):
                    for b in range(4):
                        r, c = b // 2, b % 2
                        nz = self._write_block(
                            te, probs[2], ac[key][c] + left_ctx[key][r],
                            0, blocks[b])
                        ac[key][c] = left_ctx[key][r] = nz
        parts = [e2.stop() for e2 in encs]

        w, h = self.mb_w * 16, self.mb_h * 16
        tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
        out = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        out += b"\x9d\x01\x2a"
        out += bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
        out += part1
        for p in parts[:-1]:
            out += len(p).to_bytes(3, "little")
        for p in parts:
            out += p
        return out


def _wrap_webp(vp8: bytes) -> bytes:
    chunk = b"VP8 " + len(vp8).to_bytes(4, "little") + vp8
    if len(vp8) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


# ---------------------------------------------------------------------------
# full-frame round trips
# ---------------------------------------------------------------------------


def test_empty_dc_frame_is_flat_128():
    fw = _FrameWriter(2, 1, q_index=8)
    fw.add_mb(T.DC_PRED)
    fw.add_mb(T.DC_PRED)
    f = decode_vp8(fw.build(), strict=True)
    assert f.width == 32 and f.height == 16
    # first MB predicts DC=128 from the 127/129 borders; the second
    # predicts from the reconstructed 128s and the 127 top border
    assert np.all(f.y[:, :16] == 128)
    assert np.all(f.u == 128) and np.all(f.v == 128)
    assert int(f.y[:, 16:].min()) >= 127 and int(f.y[:, 16:].max()) <= 128


def test_y2_dc_level_shifts_luma():
    # Y2 DC at level 8, qi=8: y2dc quant = 2*dc_q(8) = 22 -> wht spreads
    # 8*22=176 across the 16 Y DCs; each Y block adds (wht+4)>>3
    fw = _FrameWriter(1, 1, q_index=8)
    fw.add_mb(T.DC_PRED, y2=[8])
    f = decode_vp8(fw.build(), strict=True)
    wht = _iwht4x4([8 * 2 * T.DC_QLOOKUP[8]] + [0] * 15)
    assert all(v == wht[0] for v in wht)
    expect = np.clip(128 + ((wht[0] + 4) >> 3), 0, 255)
    assert np.all(f.y == expect)


def test_all_token_categories_roundtrip_exact():
    """Levels hitting ONE..FOUR and every DCT category (cat1-cat6,
    incl. extra bits and both signs) must reconstruct bit-exactly:
    prediction 128 + IDCT of the dequantized levels."""
    levels = [1, -2, 3, -4, 5, -8, 11, -20, 35, -66, 67, -500, 2047,
              0, 0, 1]  # scan order; ends nonzero so no EOB needed
    fw = _FrameWriter(1, 1, q_index=0)  # dc/ac quant = 4 (fine)
    fw.add_mb(T.B_PRED, bmodes=[T.B_DC_PRED] * 16,
              y=[list(levels)] + [[] for _ in range(15)])
    f = decode_vp8(fw.build(), strict=True)
    coef = [0] * 16
    for i, lv in enumerate(levels):
        coef[T.ZIGZAG[i]] = lv * (T.DC_QLOOKUP[0] if i == 0
                                  else T.AC_QLOOKUP[0])
    res = np.array(_idct4x4_twin(coef)).reshape(4, 4)
    assert np.array_equal(f.y[:4, :4],
                          np.clip(128 + res, 0, 255).astype(np.uint8))
    # untouched blocks stay at their DC prediction
    assert np.all(f.y[8:, 8:] >= 127)


def test_intra16_modes_roundtrip():
    """V/H/TM 16x16 predictions over known reconstructed neighbors."""
    fw = _FrameWriter(2, 2, q_index=8)
    dcq = T.DC_QLOOKUP[8]
    lv = 240 // (8 * dcq) * 8  # a level that stays in range
    fw.add_mb(T.DC_PRED, y2=[10])   # top-left: flat 128 + delta
    fw.add_mb(T.V_PRED)             # top-right: copies 127 border row
    fw.add_mb(T.H_PRED)             # bottom-left: copies left 129 border
    fw.add_mb(T.TM_PRED)            # bottom-right: L + A - TL
    f = decode_vp8(fw.build(), strict=True)
    wht = _iwht4x4([10 * 2 * dcq] + [0] * 15)
    base = np.clip(128 + ((wht[0] + 4) >> 3), 0, 255)
    assert np.all(f.y[:16, :16] == base)
    assert np.all(f.y[:16, 16:] == 127)  # V from the top border
    assert np.all(f.y[16:, :16] == 129)  # H from the left border
    # TM: left = H-block right edge (129), above = V-block bottom
    # (127), top-left = the DC block's corner (base) ->
    # clamp(129 + 127 - base) everywhere
    assert np.all(f.y[16:, 16:] == np.clip(129 + 127 - base, 0, 255))


def test_bpred_submodes_roundtrip():
    """A B_PRED MB cycling through several 4x4 submodes decodes with
    no desync and every subblock equals its twin-predicted value."""
    bmodes = [T.B_DC_PRED, T.B_VE_PRED, T.B_HE_PRED, T.B_TM_PRED,
              T.B_LD_PRED, T.B_RD_PRED, T.B_VR_PRED, T.B_VL_PRED,
              T.B_HD_PRED, T.B_HU_PRED, T.B_DC_PRED, T.B_VE_PRED,
              T.B_HE_PRED, T.B_TM_PRED, T.B_LD_PRED, T.B_RD_PRED]
    y = [[] for _ in range(16)]
    y[0] = [40]          # give the neighborhood some structure
    y[5] = [0, 0, 7]
    fw = _FrameWriter(1, 1, q_index=8)
    fw.add_mb(T.B_PRED, bmodes=bmodes, y=y,
              u=[[3], [], [], []], v=[[], [-3], [], []])
    f = decode_vp8(fw.build(), strict=True)
    assert f.y.shape == (16, 16)
    # block 0: B_DC from 127/129 borders + DC 40*dcq
    dc0 = (4 * 127 + 4 * 129 + 4) >> 3
    expect0 = np.clip(dc0 + ((40 * T.DC_QLOOKUP[8] + 4) >> 3), 0, 255)
    assert np.all(f.y[:4, :4] == expect0)


def test_skip_flag_and_multiple_partitions():
    fw = _FrameWriter(1, 2, q_index=8, n_parts=2, use_skip=True,
                      skip_prob=200)
    fw.add_mb(T.DC_PRED, y2=[6])
    fw.add_mb(T.DC_PRED, skip=True)
    data = fw.build()
    f = decode_vp8(data, strict=True)
    assert f.partitions == 2
    wht = _iwht4x4([6 * 2 * T.DC_QLOOKUP[8]] + [0] * 15)
    top = np.clip(128 + ((wht[0] + 4) >> 3), 0, 255)
    assert np.all(f.y[:16] == top)
    # skipped MB: pure DC prediction from the MB above
    assert np.all(f.y[16:] == top)


def test_loop_filter_smooths_mb_edge():
    """A hard vertical step across an MB edge must be smoothed by the
    normal loop filter, and remain a step without it."""
    fw = _FrameWriter(2, 1, q_index=8, filter_level=32)
    lv = 900 // (8 * T.DC_QLOOKUP[8] // 8)
    fw.add_mb(T.DC_PRED, y2=[12])
    fw.add_mb(T.DC_PRED, y2=[-12])
    raw = decode_vp8(fw.build(), loop_filter=False)
    flt = decode_vp8(fw.build(), loop_filter=True)
    edge_jump_raw = abs(int(raw.y[8, 16]) - int(raw.y[8, 15]))
    edge_jump_flt = abs(int(flt.y[8, 16]) - int(flt.y[8, 15]))
    assert edge_jump_flt < edge_jump_raw
    # interior pixels far from any edge untouched
    assert raw.y[8, 2] == flt.y[8, 2]


def test_strict_mode_rejects_underconsumed_partition():
    fw = _FrameWriter(1, 1, q_index=8)
    fw.add_mb(T.DC_PRED, y2=[6])
    data = fw.build() + b"\x00" * 64  # inflate the last partition
    with pytest.raises(ValueError, match="under-consumed"):
        decode_vp8(data, strict=True)
    decode_vp8(data, strict=False)  # lenient mode still decodes


def test_inter_frame_and_corrupt_raise():
    with pytest.raises(ValueError):
        decode_vp8(b"\x01\x00\x00" + b"\x9d\x01\x2a" + b"\x00" * 10)
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 30)


# ---------------------------------------------------------------------------
# decode_image wiring
# ---------------------------------------------------------------------------


def test_decode_image_takes_lossy_webp():
    from telescope_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    fw = _FrameWriter(1, 1, q_index=8)
    fw.add_mb(T.DC_PRED, y2=[8])
    g = decode_image(_wrap_webp(fw.build()))
    assert g.shape == (16, 16) and g.dtype == np.float32
    wht = _iwht4x4([8 * 2 * T.DC_QLOOKUP[8]] + [0] * 15)
    assert float(g[0, 0]) == float(np.clip(128 + ((wht[0] + 4) >> 3),
                                           0, 255))


# ---------------------------------------------------------------------------
# real libwebp file (CPython test asset): provable-offline parts
# ---------------------------------------------------------------------------

_REAL = ("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
         "test_email/data/python.webp")


def _real_chunks():
    import os

    if not os.path.exists(_REAL):
        pytest.skip("CPython python.webp test asset not present")
    data = open(_REAL, "rb").read()
    pos, chunks = 12, {}
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        chunks[tag] = data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    return chunks


def test_real_libwebp_header_fields_golden():
    """Field-exact frame-header parse of a real libwebp encode: the
    uncompressed tag, dimensions, and every first-partition field up
    to the mode section land on the byte-exact partition boundary."""
    vp8 = _real_chunks()[b"VP8 "]
    tag = vp8[0] | (vp8[1] << 8) | (vp8[2] << 16)
    assert not (tag & 1) and (tag >> 5) == 20  # key frame, part1 = 20B
    f = decode_vp8(vp8, strict=False)
    assert (f.width, f.height) == (16, 16)
    assert f.partitions == 1
    assert f.filter_level == 12
    assert f.ymodes == [T.B_PRED]


def test_real_libwebp_strict_mode_is_honest():
    """Known gap, asserted so it cannot silently rot: this real token
    stream is NOT yet fully consumed by the reproduced RFC 6386
    probability tables, so strict mode (what decode_image uses) must
    refuse rather than return unverified pixels. If a future table fix
    makes the stream drain, this test flips and the assertion should
    be REPLACED with a pixel golden."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        CodecUnavailable,
        _pil_image,
        decode_image,
    )

    vp8 = _real_chunks()[b"VP8 "]
    with pytest.raises(ValueError, match="under-consumed"):
        decode_vp8(vp8, strict=True)
    if _pil_image is None:
        with pytest.raises(CodecUnavailable):
            decode_image(open(_REAL, "rb").read())


def test_real_libwebp_alpha_plane_golden():
    """The ALPH chunk is a VP8L stream (compression method 1); decoding
    it with the repo's VP8L path must reproduce the Python-logo
    silhouette — a REAL libwebp-encoded golden for the VP8L decoder."""
    from telescope_data_pipeline_spark.operators.multimodal import (
        _Vp8lBits,
        _vp8l_decode_image_stream,
    )

    alph = _real_chunks()[b"ALPH"]
    assert alph[0] & 0x03 == 1  # lossless-compressed alpha
    br = _Vp8lBits(alph[1:])
    px = _vp8l_decode_image_stream(br, 16, 16, True)
    a = np.array(px).reshape(16, 16, 4)[..., 2]  # green channel = alpha
    sil = ["".join("#" if v > 128 else "." for v in row) for row in a]
    assert sil == [
        "....#######.....",
        "....#######.....",
        "....#######.....",
        "..#########.....",
        "###########.###.",
        "###########.###.",
        "##########.####.",
        "#####......####.",
        "####.##########.",
        "###.###########.",
        ".##.##########..",
        "....#########...",
        "....#######.....",
        "....#######.....",
        ".....#####......",
        "................",
    ]
