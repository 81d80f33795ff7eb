"""VP8 inter-frame (P-frame) decode + fixture encoder (RFC 6386).

Closes the vp8.py keyframe decoder's documented inter-coded hook with
real motion-compensated prediction: the interframe header layout
(refresh/copy/sign-bias flags, prob_intra/last/gf, mode and MV prob
update fields), per-MB inter mode parsing with the three-neighbor
near-MV survey (weights 2/2/1, last-entry merge, count-indexed mode
contexts, the zero-MV count slot, and the 16-pixel-border clamp), the
ZEROMV / NEARESTMV / NEARMV / NEWMV modes with NEWMV coded as a
residual against the survey's best MV, the two-stream MV component
entropy coder (short tree 0-7, long form bits 0-2 then 9-4 with the
forced bit 3 when no higher bit is set, trailing sign), and six-tap
subpixel motion compensation (8-phase filters, two-pass with
intermediate clamping) over edge-extended reference planes. Intra MBs
inside interframes reconstruct through the shared keyframe predictors;
golden / altref reference selection is parsed and buffered.

Deliberate drops (documented, raise cleanly): SPLITMV (per-subblock
MVs) and the bilinear-filter profiles (version != 0).

Provenance: written from the public RFC 6386 structure. As with the
keyframe tier (vp8.py header), the *spec-constant tables* here — the
count-indexed mode contexts, the default MV context probabilities, the
inter-frame intra mode probabilities, and the MV-probability update
priors — are documented stand-ins: encoder and decoder share them, so
every wire path is pinned by dual-path round-trips; real-file parity
additionally depends on transcription fidelity, unverifiable in this
sandbox. The chroma MV halving convention (luma MV truncated toward
zero to half resolution) is likewise a documented stand-in; fixtures
use even-full-pixel MVs, where every halving convention coincides.

Reference parity note: the reference (tballison/tika) is metadata-only
for video (`video/FLVParser.java`, `mp4/MP4Parser.java`); sample
decode is the pipeline extension, not a port.

Scale contract: per-row decode inside mapInPandas; stateful only
within one stream's frames (a WebM row decodes its own frame chain);
corrupt payloads raise ValueError and become status rows; no shuffle.
"""

from __future__ import annotations

import numpy as np

from tika_spark.analysis.vp8 import (
    B_PRED, BMODE_TREE, COEFF_UPDATE_PROBS, DC_PRED,
    DEFAULT_COEFF_PROBS, SEGMENT_TREE, UV_MODE_TREE, _BoolDec,
    _BoolEnc, _FrameHeader, _MBInfo, _NzCtx, _Quant,
    _apply_loop_filter, _clamp_qi, _dequant, _mb_coeffs,
    _mb_skip_ctx, _pred16, _predict_chroma, _predict_luma,
    _quantize_block, _token_partitions, _write_block, decode_vp8_yuv,
    fdct4x4, fwalsh4x4, idct4x4, iwalsh4x4,
)

# --------------------------------------------------- tables (RFC 6386)

# inter MB modes (local enum; leaves in the repo's tree convention)
ZEROMV, NEARESTMV, NEARMV, NEWMV, SPLITMV = 10, 11, 12, 13, 14

MV_REF_TREE = (-ZEROMV, 2, -NEARESTMV, 4, -NEARMV, 6,
               -NEWMV, -SPLITMV)

# non-keyframe intra mode coding (tree shapes per RFC 6386; the prob
# values are documented stand-ins, shared encoder/decoder)
YMODE_TREE = (-DC_PRED, 2, 4, 6, -1, -2, -3, -B_PRED)  # V/H/TM = 1/2/3
YMODE_PROB = (112, 86, 140, 37)
UV_MODE_PROB = (162, 101, 204)
# fixed (context-free) 4x4 submode probs for interframe intra MBs
BMODE_PROB = (120, 90, 79, 133, 87, 85, 80, 111, 151)

# count-indexed mv_ref mode contexts [cnt 0..5][p0..p3] — stand-ins
MODE_CONTEXTS = (
    (7, 1, 1, 143),
    (14, 18, 14, 107),
    (135, 64, 57, 68),
    (60, 56, 128, 65),
    (234, 160, 1, 1),
    (250, 200, 1, 1),
)

# MV component entropy: 19 probs per component (row, col) —
# [0]=is_long, [1]=sign, [2..8]=short tree, [9..18]=long bits 0..9.
MV_PROBS = (
    (162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254),
    (164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254),
)
# priors for the per-frame MV prob update flags (stand-in: uniform)
MV_UPDATE_PROBS = tuple(tuple([252] * 19) for _ in range(2))

SHORT_MV_TREE = (2, 8, 4, 6, 0, -1, -2, -3, 10, 12, -4, -5, -6, -7)

# 8-phase six-tap subpixel filters (RFC 6386 section 14.1)
SIXTAP = (
    (0, 0, 128, 0, 0, 0),
    (0, -6, 123, 12, -1, 0),
    (2, -11, 108, 36, -8, 1),
    (0, -9, 93, 50, -6, 0),
    (3, -16, 77, 77, -16, 3),
    (0, -6, 50, 93, -9, 0),
    (1, -8, 36, 108, -11, 2),
    (0, -1, 12, 123, -6, 0),
)

_BORDER = 32          # reference-plane edge extension (pixels)


# --------------------------------------------------------- MV entropy


def _read_mvcomponent(bd, p) -> int:
    """One MV component -> eighth-pel value (coded in quarter-pel)."""
    if bd.bool(p[0]):                       # long form (|v| >= 8)
        a = 0
        for i in range(3):
            a |= bd.bool(p[9 + i]) << i
        for i in range(9, 3, -1):
            a |= bd.bool(p[9 + i]) << i
        if a & 0xFFF0:
            a |= bd.bool(p[12]) << 3
        else:
            a |= 8                          # bit 3 forced, not coded
    else:
        a = bd.tree(SHORT_MV_TREE, p[2:9])
    if a and bd.bool(p[1]):
        a = -a
    return a * 2


def _write_mvcomponent(be, p, v8: int):
    """Inverse of :func:`_read_mvcomponent` (``v8`` in eighth-pel,
    must be even)."""
    if v8 & 1:
        raise ValueError("VP8 MVs are quarter-pel (even eighth-pel)")
    v = v8 // 2
    a = abs(v)
    if a >= 1 << 10:
        raise ValueError("MV component out of range")
    if a < 8:
        be.put(0, p[0])
        be.tree(SHORT_MV_TREE, p[2:9], a)
    else:
        be.put(1, p[0])
        for i in range(3):
            be.put((a >> i) & 1, p[9 + i])
        for i in range(9, 3, -1):
            be.put((a >> i) & 1, p[9 + i])
        if a & 0xFFF0:
            be.put((a >> 3) & 1, p[12])
    if a:
        be.put(1 if v < 0 else 0, p[1])


def _read_mv(bd) -> tuple[int, int]:
    return (_read_mvcomponent(bd, MV_PROBS[0]),
            _read_mvcomponent(bd, MV_PROBS[1]))


def _write_mv(be, mv: tuple[int, int]):
    _write_mvcomponent(be, MV_PROBS[0], mv[0])
    _write_mvcomponent(be, MV_PROBS[1], mv[1])


# ----------------------------------------------------- near-MV survey


def _clamp_mv(mv, mx, my, mb_w, mb_h):
    """Clamp to the frame plus a 16-pixel border (eighth-pel)."""
    lo_y = -((my * 16 + 16) << 3)
    hi_y = ((mb_h - 1 - my) * 16 + 16) << 3
    lo_x = -((mx * 16 + 16) << 3)
    hi_x = ((mb_w - 1 - mx) * 16 + 16) << 3
    return (min(max(mv[0], lo_y), hi_y),
            min(max(mv[1], lo_x), hi_x))


def _find_near_mvs(mbs, mx, my, mb_w, mb_h):
    """RFC 6386 section 18.3 survey -> (best, nearest, near, cnt[4]).

    Above/left/above-left inter neighbors vote with weights 2/2/1;
    a nonzero MV merges only with the most recently appended entry
    (the reference's pointer walk); zero-MV inter neighbors count in
    slot 0; slot 3 is the SPLITMV count (always 0 here — SPLITMV is
    a documented drop). The three survey MVs are border-clamped.
    """
    zero = (0, 0)
    near_mvs = [zero, zero, zero, zero]
    cnt = [0, 0, 0, 0]
    idx = 0
    above = mbs[my - 1][mx] if my > 0 else None
    left = mbs[my][mx - 1] if mx > 0 else None
    aleft = mbs[my - 1][mx - 1] if (my > 0 and mx > 0) else None
    for nb, w in ((above, 2), (left, 2), (aleft, 1)):
        if nb is None or not getattr(nb, "is_inter", False):
            continue
        if nb.mv != zero:
            if idx > 0 and near_mvs[idx] == nb.mv:
                cnt[idx] += w
            else:
                idx += 1
                near_mvs[idx] = nb.mv
                cnt[idx] += w
        else:
            cnt[0] += w
    cnt[3] = 0       # the SPLITMV vote slot (SPLITMV never emitted)
    if cnt[2] > cnt[1]:
        near_mvs[1], near_mvs[2] = near_mvs[2], near_mvs[1]
        cnt[1], cnt[2] = cnt[2], cnt[1]
    if cnt[1] >= cnt[0]:
        near_mvs[0] = near_mvs[1]
    best = _clamp_mv(near_mvs[0], mx, my, mb_w, mb_h)
    nearest = _clamp_mv(near_mvs[1], mx, my, mb_w, mb_h)
    near = _clamp_mv(near_mvs[2], mx, my, mb_w, mb_h)
    return best, nearest, near, cnt


def _mv_ref_probs(cnt):
    return tuple(MODE_CONTEXTS[min(cnt[i], 5)][i] for i in range(4))


# ------------------------------------------------ motion compensation


def _extend(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate by _BORDER on all sides (int32)."""
    return np.pad(plane, _BORDER, mode="edge").astype(np.int32)


def _mc_block(ext: np.ndarray, y0: int, x0: int, bh: int, bw: int,
              mvy: int, mvx: int) -> np.ndarray:
    """Six-tap motion-compensated (bh, bw) block from the extended
    plane. ``y0``/``x0`` are unextended coordinates; MVs eighth-pel.
    Two-pass filter with intermediate clamping; phase 0 short-cuts
    to a copy."""
    fy, fx = mvy & 7, mvx & 7
    iy = y0 + (mvy >> 3) + _BORDER
    ix = x0 + (mvx >> 3) + _BORDER
    # clamp the access window into the extended plane (a wild NEWMV
    # stays defined: the border replicates, like the reference's
    # extended frame buffers)
    h_ext, w_ext = ext.shape
    iy = min(max(iy, 2), h_ext - bh - 3)
    ix = min(max(ix, 2), w_ext - bw - 3)
    if fx == 0 and fy == 0:
        return ext[iy:iy + bh, ix:ix + bw].copy()
    rows = bh + (5 if fy else 0)
    ry0 = iy - (2 if fy else 0)
    if fx:
        t = SIXTAP[fx]
        src = ext[ry0:ry0 + rows, ix - 2:ix + bw + 3]
        acc = np.zeros((rows, bw), dtype=np.int32)
        for k in range(6):
            if t[k]:
                acc += t[k] * src[:, k:k + bw]
        tmp = np.clip((acc + 64) >> 7, 0, 255)
    else:
        tmp = ext[ry0:ry0 + rows, ix:ix + bw]
    if fy:
        t = SIXTAP[fy]
        acc = np.zeros((bh, bw), dtype=np.int32)
        for k in range(6):
            if t[k]:
                acc += t[k] * tmp[k:k + bh, :]
        return np.clip((acc + 64) >> 7, 0, 255)
    return tmp.astype(np.int32)


def _chroma_mv(mv: tuple[int, int]) -> tuple[int, int]:
    """Luma MV -> chroma MV at half resolution (truncate toward zero
    — documented stand-in convention; fixtures use even-full-pel MVs
    where all conventions coincide)."""
    def half(c):
        return -((-c) // 2) if c < 0 else c // 2
    return half(mv[0]), half(mv[1])


# --------------------------------------------------- interframe parse


def _parse_inter_headers(data: bytes, width: int, height: int):
    """First-partition header of a non-key frame -> (_FrameHeader,
    inter dict, bool decoder positioned at the mode records)."""
    if len(data) < 3:
        raise ValueError("short VP8 interframe payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if not (tag & 1):
        raise ValueError("keyframe handed to the interframe parser")
    if (tag >> 1) & 7:
        raise ValueError("VP8 bilinear-filter profiles (version != 0)"
                         " are a documented drop")
    part1_size = tag >> 5
    h = _FrameHeader()
    h.width, h.height = width, height
    h.mb_w = (width + 15) >> 4
    h.mb_h = (height + 15) >> 4
    h.part1_off = 3
    h.part1_size = part1_size
    if 3 + part1_size > len(data):
        raise ValueError("VP8 first partition overruns payload")
    bd = _BoolDec(data, 3, 3 + part1_size)
    # segmentation (same layout as keyframes)
    h.seg_qi = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_abs = 0
    h.seg_tree_probs = [255, 255, 255]
    h.seg_map_update = 0
    h.segmentation = bd.bool()
    if h.segmentation:
        h.seg_map_update = bd.bool()
        if bd.bool():
            h.seg_abs = bd.bool()
            for i in range(4):
                if bd.bool():
                    h.seg_qi[i] = bd.signed(7)
            for i in range(4):
                if bd.bool():
                    h.seg_lf[i] = bd.signed(6)
        if h.seg_map_update:
            for i in range(3):
                h.seg_tree_probs[i] = (bd.literal(8) if bd.bool()
                                       else 255)
    h.filter_type = bd.bool()
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta = bd.bool()
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta and bd.bool():
        for i in range(4):
            if bd.bool():
                h.ref_lf_deltas[i] = bd.signed(6)
        for i in range(4):
            if bd.bool():
                h.mode_lf_deltas[i] = bd.signed(6)
    h.n_parts = 1 << bd.literal(2)
    h.q_index = bd.literal(7)
    h.q_deltas = [bd.signed(4) if bd.bool() else 0 for _ in range(5)]
    inter = {}
    inter["refresh_golden"] = bd.bool()
    inter["refresh_alt"] = bd.bool()
    if not inter["refresh_golden"]:
        inter["copy_to_golden"] = bd.literal(2)
    else:
        inter["copy_to_golden"] = 0
    if not inter["refresh_alt"]:
        inter["copy_to_alt"] = bd.literal(2)
    else:
        inter["copy_to_alt"] = 0
    inter["sign_bias_golden"] = bd.bool()
    inter["sign_bias_alt"] = bd.bool()
    bd.bool()                                # refresh_entropy_probs
    inter["refresh_last"] = bd.bool()
    probs = [[[list(DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for k in range(11):
                    if bd.bool(COEFF_UPDATE_PROBS[t][b][c][k]):
                        probs[t][b][c][k] = bd.literal(8)
    h.coeff_probs = probs
    h.skip_enabled = bd.bool()
    h.skip_prob = bd.literal(8) if h.skip_enabled else 0
    inter["prob_intra"] = bd.literal(8)
    inter["prob_last"] = bd.literal(8)
    inter["prob_gf"] = bd.literal(8)
    ymode_prob = list(YMODE_PROB)
    if bd.bool():
        for i in range(4):
            ymode_prob[i] = bd.literal(8)
    uv_prob = list(UV_MODE_PROB)
    if bd.bool():
        for i in range(3):
            uv_prob[i] = bd.literal(8)
    inter["ymode_prob"] = ymode_prob
    inter["uv_prob"] = uv_prob
    # MV prob updates (values replace the defaults; fixtures never
    # update, so the shared MV_PROBS stand-ins stay in force)
    mv_probs = [list(MV_PROBS[0]), list(MV_PROBS[1])]
    for c in range(2):
        for j in range(19):
            if bd.bool(MV_UPDATE_PROBS[c][j]):
                x = bd.literal(7)
                mv_probs[c][j] = (x << 1) if x else 1
    inter["mv_probs"] = mv_probs
    return h, inter, bd


def _read_modes_inter(bd, h, inter, mb_w, mb_h):
    """Per-MB records of an interframe: intra/inter split, reference
    choice, mv_ref mode with survey contexts, NEWMV residuals."""
    mbs = [[_MBInfo() for _ in range(mb_w)] for _ in range(mb_h)]
    mv_probs = inter["mv_probs"]
    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my][mx]
            mb.is_inter = False
            mb.mv = (0, 0)
            mb.ref = "last"
            if h.segmentation and h.seg_map_update:
                mb.segment = bd.tree(SEGMENT_TREE, h.seg_tree_probs)
            if h.skip_enabled:
                mb.skip = bd.bool(h.skip_prob)
            if bd.bool(inter["prob_intra"]):
                mb.is_inter = True
                if bd.bool(inter["prob_last"]):
                    mb.ref = ("altref" if bd.bool(inter["prob_gf"])
                              else "golden")
                best, nearest, near, cnt = _find_near_mvs(
                    mbs, mx, my, mb_w, mb_h)
                mode = bd.tree(MV_REF_TREE, _mv_ref_probs(cnt))
                mb.inter_mode = mode
                if mode == ZEROMV:
                    mb.mv = (0, 0)
                elif mode == NEARESTMV:
                    mb.mv = nearest
                elif mode == NEARMV:
                    mb.mv = near
                elif mode == NEWMV:
                    dy = _read_mvcomponent(bd, mv_probs[0])
                    dx = _read_mvcomponent(bd, mv_probs[1])
                    mb.mv = (best[0] + dy, best[1] + dx)
                else:
                    raise ValueError(
                        "VP8 SPLITMV is a documented drop")
            else:
                mb.ymode = bd.tree(YMODE_TREE, inter["ymode_prob"])
                if mb.ymode == B_PRED:
                    # fixed-prob submodes in interframes
                    mb.bmodes = [bd.tree(BMODE_TREE, BMODE_PROB)
                                 for _ in range(16)]
                mb.uvmode = bd.tree(UV_MODE_TREE, inter["uv_prob"])
    return mbs


# ------------------------------------------------- stateful decoding


class VP8Decoder:
    """Keyframe + interframe VP8 decoder with last/golden/altref
    buffers (one instance per elementary stream)."""

    def __init__(self):
        self.last = None            # (yp, up, vp) padded planes
        self.golden = None
        self.altref = None
        self.width = None
        self.height = None

    # -- keyframe path: reuse vp8.py wholesale, keep padded planes

    def _decode_keyframe(self, data: bytes):
        y, u, v, w, hh = decode_vp8_yuv(data)
        self.width, self.height = w, hh
        mb_w, mb_h = (w + 15) >> 4, (hh + 15) >> 4
        yp = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
        up = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
        vp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
        for src, dst in ((y, yp), (u, up), (v, vp)):
            sh, sw = src.shape
            dst[:sh, :sw] = src
            dst[:sh, sw:] = src[:, -1:]
            dst[sh:, :] = dst[sh - 1:sh, :]
        planes = (yp, up, vp)
        self.last = self.golden = self.altref = planes
        return y, u, v

    def decode_yuv(self, data: bytes):
        """One frame -> (y, u, v) uint8 planes (cropped)."""
        data = bytes(data)
        if len(data) < 3:
            raise ValueError("short VP8 payload")
        if not (data[0] & 1):
            return self._decode_keyframe(data)
        if self.last is None:
            raise ValueError("VP8 interframe before any keyframe")
        h, inter, bd = _parse_inter_headers(data, self.width,
                                            self.height)
        mb_w, mb_h = h.mb_w, h.mb_h
        mbs = _read_modes_inter(bd, h, inter, mb_w, mb_h)
        parts = _token_partitions(data, h)
        quants = []
        for seg in range(4):
            qi = ((h.seg_qi[seg] if h.seg_abs
                   else h.q_index + h.seg_qi[seg])
                  if h.segmentation else h.q_index)
            d = h.q_deltas
            quants.append(_Quant(_clamp_qi(qi), d[0], d[1], d[2],
                                 d[3], d[4]))
        refs = {"last": self.last, "golden": self.golden,
                "altref": self.altref}
        ext = {name: tuple(_extend(p) for p in planes)
               for name, planes in refs.items()}
        yp = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
        up = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
        vp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
        ctx = _NzCtx(mb_w)
        for my in range(mb_h):
            ctx.start_row()
            bd_t = parts[my % len(parts)]
            for mx in range(mb_w):
                mb = mbs[my][mx]
                has_y2 = (mb.ymode != B_PRED if not mb.is_inter
                          else True)
                if mb.skip:
                    y_res = np.zeros((16, 16), dtype=np.int32)
                    u_res = np.zeros((8, 8), dtype=np.int32)
                    v_res = np.zeros((8, 8), dtype=np.int32)
                    _mb_skip_ctx(ctx, mx, has_y2)
                    mb.has_nonzero = False
                else:
                    q = quants[mb.segment]
                    y_res, u_res, v_res, any_nz = _mb_coeffs(
                        bd_t, h, q, ctx, mx, has_y2)
                    mb.has_nonzero = any_nz
                if mb.is_inter:
                    ey, eu, ev = ext[mb.ref]
                    mvy, mvx = mb.mv
                    pred = _mc_block(ey, my * 16, mx * 16, 16, 16,
                                     mvy, mvx)
                    yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                        np.clip(pred + y_res, 0, 255)
                    cmy, cmx = _chroma_mv(mb.mv)
                    for eplane, out, res in ((eu, up, u_res),
                                             (ev, vp, v_res)):
                        pred = _mc_block(eplane, my * 8, mx * 8, 8, 8,
                                         cmy, cmx)
                        out[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                            np.clip(pred + res, 0, 255)
                else:
                    _predict_luma(mb, yp, mx, my, mb_w, y_res)
                    _predict_chroma(mb.uvmode, up, mx, my, u_res)
                    _predict_chroma(mb.uvmode, vp, mx, my, v_res)
        _apply_loop_filter(h, mbs, yp, up, vp, mb_w, mb_h)
        planes = (yp, up, vp)
        if inter["copy_to_golden"] == 1:
            self.golden = self.last
        elif inter["copy_to_golden"] == 2:
            self.golden = self.altref
        if inter["copy_to_alt"] == 1:
            self.altref = self.last
        elif inter["copy_to_alt"] == 2:
            self.altref = self.golden
        if inter["refresh_golden"]:
            self.golden = planes
        if inter["refresh_alt"]:
            self.altref = planes
        if inter["refresh_last"]:
            self.last = planes
        w, hh = self.width, self.height
        cw, ch = (w + 1) // 2, (hh + 1) // 2
        return (yp[:hh, :w].astype(np.uint8),
                up[:ch, :cw].astype(np.uint8),
                vp[:ch, :cw].astype(np.uint8))

    def decode_rgba(self, data: bytes) -> np.ndarray:
        from tika_spark.analysis.vp8 import yuv_to_rgb
        y, u, v = self.decode_yuv(data)
        rgb = yuv_to_rgb(y, u, v)
        out = np.empty((*y.shape, 4), dtype=np.uint8)
        out[:, :, :3] = rgb
        out[:, :, 3] = 255
        return out


# -------------------------------------------------- fixture encoder


def encode_vp8_inter_yuv(prev, y, u, v, mv=(0, 0), qindex: int = 0,
                         plan: str = "auto",
                         intra_every: int = 0,
                         filter_level: int = 0,
                         ref: str = "last",
                         refresh=("last",)):
    """Encode one interframe against reconstruction ``prev`` (padded
    (yp, up, vp) int32 planes — the buffer named by ``ref`` on the
    decode side, e.g. a :class:`VP8Decoder`'s ``last`` or
    ``golden``). Returns ``(payload, recon_planes)``.

    Every inter MB uses the global motion ``mv`` (eighth-pel,
    even-full-pixel recommended); the mode coded per MB is chosen
    from the shared survey (ZEROMV / NEARESTMV / NEARMV / NEWMV
    residual), so the decoder's survey logic is exercised end to
    end. ``intra_every`` > 0 makes every Nth MB an intra DC MB
    inside the interframe (the intra-in-inter path). ``ref`` selects
    the reference every inter MB names (last / golden / altref) and
    ``refresh`` which buffers this frame refreshes — between them
    the decoder's full reference-buffer management round-trips.
    """
    if ref not in ("last", "golden", "altref"):
        raise ValueError(f"unknown reference {ref!r}")
    y = np.asarray(y, dtype=np.int32)
    u = np.asarray(u, dtype=np.int32)
    v = np.asarray(v, dtype=np.int32)
    hh, w = y.shape
    mb_w, mb_h = (w + 15) >> 4, (hh + 15) >> 4
    pyp, pup, pvp = prev
    if pyp.shape != (mb_h * 16, mb_w * 16):
        raise ValueError("previous reconstruction shape mismatch")
    if any(c & 1 for c in mv):
        raise ValueError("VP8 MVs are quarter-pel (even eighth-pel)")
    # pad sources
    yp = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
    yp[:hh, :w] = y
    yp[:hh, w:] = y[:, -1:]
    yp[hh:, :] = yp[hh - 1:hh, :]
    ch, cw = u.shape
    up = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    vp = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    for src, dst in ((u, up), (v, vp)):
        dst[:ch, :cw] = src
        dst[:ch, cw:] = src[:, -1:]
        dst[ch:, :] = dst[ch - 1:ch, :]
    q = _Quant(_clamp_qi(qindex))
    exty, extu, extv = (_extend(p) for p in prev)
    ry = np.zeros_like(yp)
    ru = np.zeros_like(up)
    rv = np.zeros_like(vp)
    mbs = [[_MBInfo() for _ in range(mb_w)] for _ in range(mb_h)]
    coeff_store = [[None] * mb_w for _ in range(mb_h)]
    k = 0
    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my][mx]
            mb.segment = 0
            k += 1
            intra = intra_every and (k % intra_every == 0)
            mb.is_inter = not intra
            mb.mv = (0, 0) if intra else tuple(mv)
            mb.ref = ref
            blocks = {"y2": None, "y": [], "u": [], "v": []}
            x0, y0 = mx * 16, my * 16
            if intra:
                mb.ymode = DC_PRED
                mb.uvmode = DC_PRED
                above = ry[y0 - 1, x0:x0 + 16] if my > 0 else None
                left = ry[y0:y0 + 16, x0 - 1] if mx > 0 else None
                aleft = (ry[y0 - 1, x0 - 1]
                         if (mx > 0 and my > 0) else None)
                ypred = _pred16(DC_PRED, above, left, aleft, 16)
            else:
                ypred = _mc_block(exty, y0, x0, 16, 16, mv[0], mv[1])
            resid = yp[y0:y0 + 16, x0:x0 + 16] - ypred
            dcs = np.zeros((4, 4), dtype=np.int32)
            raw = []
            for i in range(16):
                r4, c4 = i >> 2, i & 3
                co = fdct4x4(resid[r4 * 4:r4 * 4 + 4,
                                   c4 * 4:c4 * 4 + 4])
                dcs[r4][c4] = co[0][0]
                raw.append(co)
            y2co = fwalsh4x4(dcs)
            y2q = [0] * 16
            for i in range(16):
                qq = q.y2dc if i == 0 else q.y2ac
                c = int(y2co[i >> 2][i & 3])
                y2q[i] = int(np.sign(c)) * (abs(c) // qq)
            blocks["y2"] = y2q
            for co in raw:
                bq = [0] * 16
                for i in range(1, 16):
                    c = int(co[i >> 2][i & 3])
                    bq[i] = int(np.sign(c)) * (abs(c) // q.y1ac)
                blocks["y"].append(bq)
            dcs_dq = iwalsh4x4(_dequant(y2q, q.y2dc, q.y2ac))
            y_res = np.zeros((16, 16), dtype=np.int32)
            for i in range(16):
                r4, c4 = i >> 2, i & 3
                dq = _dequant(blocks["y"][i], q.y1dc, q.y1ac)
                dq[0][0] = int(dcs_dq[r4][c4])
                y_res[r4 * 4:r4 * 4 + 4, c4 * 4:c4 * 4 + 4] = \
                    idct4x4(dq)
            ry[y0:y0 + 16, x0:x0 + 16] = np.clip(ypred + y_res, 0, 255)
            cx0, cy0 = mx * 8, my * 8
            cmy, cmx = _chroma_mv(mb.mv)
            for plane, rplane, eplane, key in (
                    (up, ru, extu, "u"), (vp, rv, extv, "v")):
                if intra:
                    above = (rplane[cy0 - 1, cx0:cx0 + 8]
                             if my > 0 else None)
                    left = (rplane[cy0:cy0 + 8, cx0 - 1]
                            if mx > 0 else None)
                    aleft = (rplane[cy0 - 1, cx0 - 1]
                             if (mx > 0 and my > 0) else None)
                    cpred = _pred16(DC_PRED, above, left, aleft, 8)
                else:
                    cpred = _mc_block(eplane, cy0, cx0, 8, 8, cmy, cmx)
                cres = plane[cy0:cy0 + 8, cx0:cx0 + 8] - cpred
                qs = []
                res = np.zeros((8, 8), dtype=np.int32)
                for i in range(4):
                    r2, c2 = i >> 1, i & 1
                    bq = _quantize_block(
                        cres[r2 * 4:r2 * 4 + 4, c2 * 4:c2 * 4 + 4],
                        q.uvdc, q.uvac)
                    qs.append(bq)
                    res[r2 * 4:r2 * 4 + 4, c2 * 4:c2 * 4 + 4] = \
                        idct4x4(_dequant(bq, q.uvdc, q.uvac))
                blocks[key] = qs
                rplane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(
                    cpred + res, 0, 255)
            coeff_store[my][mx] = blocks
            mb.skip = int(
                all(all(c == 0 for c in b) for b in blocks["y"])
                and all(all(c == 0 for c in b) for b in blocks["u"])
                and all(all(c == 0 for c in b) for b in blocks["v"])
                and all(c == 0 for c in blocks["y2"]))
            mb.has_nonzero = not mb.skip
    # ---- first partition
    skip_prob = 128
    prob_intra, prob_last, prob_gf = 128, 32, 128
    be = _BoolEnc()
    be.put(0)                                 # segmentation
    be.put(0)                                 # filter type
    be.literal(filter_level, 6)
    be.literal(0, 3)                          # sharpness
    be.put(0)                                 # lf delta
    be.literal(0, 2)                          # 1 token partition
    be.literal(qindex, 7)
    for _ in range(5):
        be.put(0)                             # q deltas
    be.put(1 if "golden" in refresh else 0)   # refresh golden
    be.put(1 if "altref" in refresh else 0)   # refresh alt
    if "golden" not in refresh:
        be.literal(0, 2)                      # copy to golden: none
    if "altref" not in refresh:
        be.literal(0, 2)                      # copy to alt: none
    be.put(0)                                 # sign bias golden
    be.put(0)                                 # sign bias alt
    be.put(0)                                 # refresh entropy
    be.put(1 if "last" in refresh else 0)     # refresh last
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for kk in range(11):
                    be.put(0, COEFF_UPDATE_PROBS[t][b][c][kk])
    be.put(1)                                 # mb_no_coeff_skip
    be.literal(skip_prob, 8)
    be.literal(prob_intra, 8)
    be.literal(prob_last, 8)
    be.literal(prob_gf, 8)
    be.put(0)                                 # ymode update
    be.put(0)                                 # uv mode update
    for c in range(2):
        for j in range(19):
            be.put(0, MV_UPDATE_PROBS[c][j])
    # per-MB records (mirror _read_modes_inter; survey over the SAME
    # partially-built mb grid the decoder sees)
    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my][mx]
            be.put(mb.skip, skip_prob)
            be.put(1 if mb.is_inter else 0, prob_intra)
            if mb.is_inter:
                if ref == "last":
                    be.put(0, prob_last)
                else:
                    be.put(1, prob_last)
                    be.put(1 if ref == "altref" else 0, prob_gf)
                best, nearest, near, cnt = _find_near_mvs(
                    mbs, mx, my, mb_w, mb_h)
                probs = _mv_ref_probs(cnt)
                if mb.mv == (0, 0):
                    be.tree(MV_REF_TREE, probs, ZEROMV)
                elif mb.mv == nearest:
                    be.tree(MV_REF_TREE, probs, NEARESTMV)
                elif mb.mv == near:
                    be.tree(MV_REF_TREE, probs, NEARMV)
                else:
                    be.tree(MV_REF_TREE, probs, NEWMV)
                    _write_mv(be, (mb.mv[0] - best[0],
                                   mb.mv[1] - best[1]))
            else:
                be.tree(YMODE_TREE, YMODE_PROB, DC_PRED)
                be.tree(UV_MODE_TREE, UV_MODE_PROB, DC_PRED)
    part1 = be.bytes()
    # ---- token partition
    et = _BoolEnc()
    ctx = _NzCtx(mb_w)
    probs = [[[DEFAULT_COEFF_PROBS[t][b][c] for c in range(3)]
              for b in range(8)] for t in range(4)]
    for my in range(mb_h):
        ctx.start_row()
        for mx in range(mb_w):
            mb = mbs[my][mx]
            if mb.skip:
                _mb_skip_ctx(ctx, mx, True)
                continue
            blocks = coeff_store[my][mx]
            c = ((1 if ctx.above_y2[mx] else 0)
                 + (1 if ctx.left_y2 else 0))
            nz = _write_block(et, probs[1], 0, c, blocks["y2"])
            ctx.above_y2[mx] = ctx.left_y2 = nz
            for i in range(16):
                r4, c4 = i >> 2, i & 3
                c = ((1 if ctx.above_y[mx][c4] else 0)
                     + (1 if ctx.left_y[r4] else 0))
                nz = _write_block(et, probs[0], 1, c, blocks["y"][i])
                ctx.above_y[mx][c4] = ctx.left_y[r4] = nz
            for key, anz, lnz in (("u", ctx.above_u, ctx.left_u),
                                  ("v", ctx.above_v, ctx.left_v)):
                for i in range(4):
                    r2, c2 = i >> 1, i & 1
                    c = ((1 if anz[mx][c2] else 0)
                         + (1 if lnz[r2] else 0))
                    nz = _write_block(et, probs[2], 0, c,
                                      blocks[key][i])
                    anz[mx][c2] = lnz[r2] = nz
    tokens = et.bytes()
    tag = 1 | (0 << 1) | (1 << 4) | (len(part1) << 5)
    out = bytearray()
    out += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    out += part1
    out += tokens
    if filter_level > 0:
        fh = _FrameHeader()
        fh.filter_type = 0
        fh.filter_level = filter_level
        fh.sharpness = 0
        fh.segmentation = 0
        fh.lf_delta = 0
        _apply_loop_filter(fh, mbs, ry, ru, rv, mb_w, mb_h)
    return bytes(out), (ry, ru, rv)
