"""COCO RLE mask codec: ctypes bindings to the native C++ library
(csrc/rle.cpp) with a vectorized NumPy fallback.

Capability parity with the reference's `pyutils/refer/external/mask.py`
API surface (decode/encode/merge/area/iou/frPyObjects) over the public
COCO RLE format: column-major alternating-run counts, compressed-string
form with 6-bit groups offset by 48 and delta coding from index 2.
Polygon rasterization is bit-exact to maskApi's integer-upsampling
rasterizer by default (fr_poly method='maskapi'); the faster
cv2.fillPoly path remains as method='cv2' with a measured boundary-pixel
bound (tests/test_ref_exact.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Union

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc",
    "liblang2seg_rle.so")

_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.rle_str_decode.restype = ctypes.c_int
        _lib.rle_str_encode.restype = ctypes.c_int
        _lib.rle_encode.restype = ctypes.c_int
        _lib.rle_merge.restype = ctypes.c_int
        _lib.rle_area.restype = ctypes.c_uint64
        _lib.rle_iou.restype = ctypes.c_double
    except OSError:
        _lib = None


def native_available() -> bool:
    return _lib is not None


RLE = Dict  # {'size': [h, w], 'counts': bytes|str|list}


# ---------- string codec ----------

def _counts_from_obj(rle: RLE) -> np.ndarray:
    c = rle["counts"]
    if isinstance(c, (list, np.ndarray)):
        return np.asarray(c, dtype=np.uint32)
    if isinstance(c, str):
        c = c.encode("ascii")
    return str_decode(c)


def str_decode(s: bytes) -> np.ndarray:
    """Compressed RLE string -> uint32 counts."""
    if _lib is not None:
        cap = len(s) + 8
        out = np.empty(cap, np.uint32)
        n = _lib.rle_str_decode(s, len(s),
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                                cap)
        assert n >= 0
        return out[:n]
    # numpy/python fallback
    counts: List[int] = []
    i = 0
    while i < len(s):
        x, k, more = 0, 0, True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2 - 1:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, dtype=np.uint32)


def str_encode(counts: np.ndarray) -> bytes:
    counts = np.asarray(counts, dtype=np.uint32)
    if _lib is not None:
        cap = len(counts) * 8 + 8
        out = ctypes.create_string_buffer(cap)
        n = _lib.rle_str_encode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts), out, cap)
        assert n >= 0
        return out.raw[:n]
    # fallback
    chunks = []
    for i, c in enumerate(counts.tolist()):
        x = c - (int(counts[i - 2]) if i > 1 else 0)
        more = True
        while more:
            d = x & 0x1F
            x >>= 5
            more = (x != -1) if (d & 0x10) else (x != 0)
            if more:
                d |= 0x20
            chunks.append(d + 48)
    return bytes(chunks)


# ---------- pixel codec ----------

def decode(rle: Union[RLE, List[RLE]]) -> np.ndarray:
    """RLE(s) -> (h, w) or (h, w, n) uint8 mask (matching reference
    mask.decode output layout)."""
    if isinstance(rle, list):
        ms = [decode(r) for r in rle]
        return np.stack(ms, axis=-1)
    h, w = rle["size"]
    counts = _counts_from_obj(rle)
    total = h * w
    if _lib is not None:
        out = np.empty(total, np.uint8)
        _lib.rle_decode(
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(counts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(total))
        return out.reshape(w, h).T  # column-major -> (h, w)
    vals = np.arange(len(counts), dtype=np.uint8) % 2
    flat = np.repeat(vals, counts)
    if flat.size < total:
        flat = np.concatenate([flat, np.zeros(total - flat.size, np.uint8)])
    return flat[:total].reshape(w, h).T


def encode(mask: np.ndarray) -> RLE:
    """(h, w) {0,1} uint8 -> RLE with compressed-string counts."""
    h, w = mask.shape
    flat = np.asfortranarray(mask).T.reshape(-1)  # column-major
    if _lib is not None:
        flat = np.ascontiguousarray(flat, dtype=np.uint8)
        cap = 2 * h * w + 2
        out = np.empty(cap, np.uint32)
        n = _lib.rle_encode(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(h * w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
        counts = out[:n]
    else:
        flat = flat.astype(np.int8)
        change = np.flatnonzero(np.diff(flat)) + 1
        bounds = np.concatenate([[0], change, [flat.size]])
        counts = np.diff(bounds).astype(np.uint32)
        if flat[0] == 1:
            counts = np.concatenate([[0], counts]).astype(np.uint32)
    return {"size": [h, w], "counts": str_encode(counts)}


def area(rle: RLE) -> int:
    counts = _counts_from_obj(rle)
    return int(counts[1::2].sum())


def merge(rles: List[RLE], intersect: bool = False) -> RLE:
    assert len(rles) > 0
    h, w = rles[0]["size"]
    acc = _counts_from_obj(rles[0])
    for r in rles[1:]:
        b = _counts_from_obj(r)
        if _lib is not None:
            cap = len(acc) + len(b) + 2
            out = np.empty(cap, np.uint32)
            n = _lib.rle_merge(
                acc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(acc),
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(b),
                int(intersect),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
            assert n >= 0
            acc = out[:n]
        else:
            ma = decode({"size": [h, w], "counts": acc})
            mb = decode({"size": [h, w], "counts": b})
            m = (ma & mb) if intersect else (ma | mb)
            acc = _counts_from_obj(encode(m))
    return {"size": [h, w], "counts": str_encode(acc)}


def iou(a: RLE, b: RLE) -> float:
    ca, cb = _counts_from_obj(a), _counts_from_obj(b)
    if _lib is not None:
        return float(_lib.rle_iou(
            ca.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(ca),
            cb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(cb)))
    inter = area(merge([a, b], intersect=True))
    uni = area(a) + area(b) - inter
    return inter / uni if uni else 0.0


def _poly_boundary_counts(xy: np.ndarray, h: int, w: int) -> np.ndarray:
    """One polygon (flat [x0,y0,x1,y1,...]) -> uint32 RLE counts,
    bit-exact to the COCO maskApi rasterization (the public spec the
    dataset's GT bits are defined by; reference
    pyutils/refer/external/maskApi.c:161-201 rleFrPoly): vertices are
    scaled 5x and rounded, every edge is densified to unit steps along
    its major axis, column-crossing points are mapped back to the pixel
    grid, and the sorted crossing positions toggle alternating runs in
    column-major order.

    Degenerate edges (repeated vertex after scaling) emit a point whose
    row value is never read: both of its neighbour pairs share the same
    column, so the crossing filter drops them (the C code computes a
    0/0 NaN there and relies on the same property)."""
    S = 5  # maskApi upsampling factor
    xy = np.asarray(xy, np.float64)
    px = np.trunc(S * xy[0::2] + 0.5).astype(np.int64)
    py = np.trunc(S * xy[1::2] + 0.5).astype(np.int64)
    px = np.append(px, px[0])
    py = np.append(py, py[0])
    us: List[np.ndarray] = []
    vs: List[np.ndarray] = []
    for j in range(len(px) - 1):
        xa, xb = int(px[j]), int(px[j + 1])
        ya, yb = int(py[j]), int(py[j + 1])
        dx, dy = abs(xb - xa), abs(ya - yb)
        flip = (dx >= dy and xa > xb) or (dx < dy and ya > yb)
        if flip:
            xa, xb, ya, yb = xb, xa, yb, ya
        if dx >= dy:
            d = np.arange(dx + 1, dtype=np.int64)
            t = (dx - d) if flip else d
            u = t + xa
            if dx == 0:
                v = np.array([ya], np.int64)  # value never read
            else:
                v = np.trunc(ya + (yb - ya) / dx * t + 0.5).astype(np.int64)
        else:
            d = np.arange(dy + 1, dtype=np.int64)
            t = (dy - d) if flip else d
            v = t + ya
            u = np.trunc(xa + (xb - xa) / dy * t + 0.5).astype(np.int64)
        us.append(u)
        vs.append(v)
    u = np.concatenate(us)
    v = np.concatenate(vs)

    # keep only points where the dense walk crosses a pixel-column
    # boundary; the crossing's pixel column must land exactly on the
    # integer grid after downsampling
    cur, prev = u[1:], u[:-1]
    xd = np.where(cur < prev, cur, cur - 1).astype(np.float64)
    xd = (xd + 0.5) / S - 0.5
    keep = (cur != prev) & (np.floor(xd) == xd) & (xd >= 0) & (xd <= w - 1)
    yd = np.minimum(v[1:], v[:-1]).astype(np.float64)
    yd = (yd + 0.5) / S - 0.5
    yd = np.ceil(np.clip(yd, 0.0, float(h)))
    bx = xd[keep].astype(np.int64)
    by = yd[keep].astype(np.int64)

    # sorted column-major toggle positions -> alternating run lengths;
    # a zero gap (double toggle at one position) cancels out and its
    # following gap folds into the previous run
    a = np.sort(bx * h + by)
    a = np.append(a, h * w)
    diffs = np.diff(a, prepend=0).astype(np.int64)
    counts = [int(diffs[0])]
    j = 1
    while j < len(diffs):
        if diffs[j] > 0:
            counts.append(int(diffs[j]))
            j += 1
        else:
            j += 1
            if j < len(diffs):
                counts[-1] += int(diffs[j])
                j += 1
    return np.asarray(counts, dtype=np.uint32)


def fr_poly(polys: List[List[float]], h: int, w: int,
            method: str = "maskapi") -> RLE:
    """Polygon(s) -> RLE (reference frPyObjects + merge for polygon
    input, utils/mask_utils.py:14-18). method='maskapi' (default) is
    bit-exact to the COCO maskApi rasterizer that defines the dataset's
    GT masks; method='cv2' keeps the earlier cv2.fillPoly path (boundary
    pixels differ — bound measured in tests/test_ref_exact.py)."""
    if method == "maskapi":
        rles = [{"size": [h, w],
                 "counts": str_encode(_poly_boundary_counts(p, h, w))}
                for p in polys]
        return rles[0] if len(rles) == 1 else merge(rles)
    import cv2
    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polys]
    cv2.fillPoly(mask, pts, 1)
    return encode(mask)


def fr_uncompressed(rle_obj: Dict) -> RLE:
    """Uncompressed-counts RLE dict -> compressed RLE."""
    h, w = rle_obj["size"]
    return {"size": [h, w],
            "counts": str_encode(np.asarray(rle_obj["counts"], np.uint32))}


def decode_resize_batch(rles: List[RLE], out_h: int, out_w: int,
                        res_h: int, res_w: int) -> np.ndarray:
    """Decode N same-size RLEs and nearest-resize each to (res_h, res_w)
    inside a zero-padded (out_h, out_w) canvas — the loader's per-ref mask
    prep (gt_mrcn_loader.py:199-211) as one parallel native call."""
    num = len(rles)
    out = np.zeros((num, out_h, out_w), np.uint8)
    if num == 0:
        return out
    h, w = rles[0]["size"]
    if _lib is not None:
        counts_list = [_counts_from_obj(r) for r in rles]
        lens = np.asarray([len(c) for c in counts_list], np.int32)
        offsets = np.zeros(num, np.int64)
        offsets[1:] = np.cumsum(lens[:-1])
        allc = np.concatenate(counts_list).astype(np.uint32)
        _lib.rle_decode_resize_batch(
            allc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            num, h, w, out_h, out_w, res_h, res_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    ys = ((2 * np.arange(res_h) + 1) * h) // (2 * res_h)
    xs = ((2 * np.arange(res_w) + 1) * w) // (2 * res_w)
    for i, r in enumerate(rles):
        m = decode(r)
        out[i, :res_h, :res_w] = m[np.ix_(ys, xs)]
    return out
