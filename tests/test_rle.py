"""RLE codec tests: native C++ vs NumPy fallback vs brute-force oracles."""

import numpy as np
import pytest

from lang2seg_tpu.data import rle


def rand_mask(rng, h=40, w=60, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_native_lib_loaded():
    assert rle.native_available(), "native RLE library must build and load"


def test_roundtrip(rng):
    for _ in range(5):
        m = rand_mask(rng)
        r = rle.encode(m)
        back = rle.decode(r)
        np.testing.assert_array_equal(back, m)


def test_roundtrip_numpy_fallback(rng, monkeypatch):
    monkeypatch.setattr(rle, "_lib", None)
    m = rand_mask(rng)
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)


def test_native_and_fallback_agree(rng, monkeypatch):
    m = rand_mask(rng)
    r_native = rle.encode(m)
    monkeypatch.setattr(rle, "_lib", None)
    r_np = rle.encode(m)
    assert r_native["counts"] == r_np["counts"]
    np.testing.assert_array_equal(rle.decode(r_native), m)


def test_str_codec_roundtrip(rng):
    counts = rng.randint(0, 5000, 31).astype(np.uint32)
    s = rle.str_encode(counts)
    back = rle.str_decode(s)
    np.testing.assert_array_equal(back, counts)


def test_area(rng):
    m = rand_mask(rng)
    assert rle.area(rle.encode(m)) == int(m.sum())


def test_merge_union_and_intersect(rng):
    a, b = rand_mask(rng), rand_mask(rng)
    ra, rb = rle.encode(a), rle.encode(b)
    uni = rle.decode(rle.merge([ra, rb]))
    np.testing.assert_array_equal(uni, a | b)
    inter = rle.decode(rle.merge([ra, rb], intersect=True))
    np.testing.assert_array_equal(inter, a & b)


def test_merge_three_fallback(rng, monkeypatch):
    """3+ RLE merge must accumulate across ALL inputs in the NumPy
    fallback path (regression: it used to return after the first pair)."""
    a, b, c = rand_mask(rng), rand_mask(rng), rand_mask(rng)
    rs = [rle.encode(m) for m in (a, b, c)]
    monkeypatch.setattr(rle, "_lib", None)
    np.testing.assert_array_equal(rle.decode(rle.merge(rs)), a | b | c)
    np.testing.assert_array_equal(
        rle.decode(rle.merge(rs, intersect=True)), a & b & c)


def test_merge_three_native_matches_fallback(rng, monkeypatch):
    if rle._lib is None:
        import pytest
        pytest.skip("native lib not built")
    rs = [rle.encode(rand_mask(rng)) for _ in range(3)]
    native = rle.decode(rle.merge(rs))
    monkeypatch.setattr(rle, "_lib", None)
    np.testing.assert_array_equal(rle.decode(rle.merge(rs)), native)


def test_iou(rng):
    a, b = rand_mask(rng), rand_mask(rng)
    got = rle.iou(rle.encode(a), rle.encode(b))
    inter = (a & b).sum()
    uni = (a | b).sum()
    assert abs(got - inter / uni) < 1e-9


def test_fr_poly_square():
    r = rle.fr_poly([[10, 10, 30, 10, 30, 25, 10, 25]], 40, 50)
    m = rle.decode(r)
    # interior definitely filled
    assert m[15, 15] == 1 and m[11, 11] == 1
    assert m[5, 5] == 0 and m[30, 40] == 0
    # area close to the 21x16 rectangle (boundary convention tolerance)
    assert abs(int(m.sum()) - 21 * 16) <= 2 * (21 + 16)


def test_decode_resize_batch(rng):
    masks = [rand_mask(rng, 37, 53) for _ in range(4)]
    rles = [rle.encode(m) for m in masks]
    out = rle.decode_resize_batch(rles, out_h=20, out_w=30, res_h=18,
                                  res_w=27)
    assert out.shape == (4, 20, 30)
    ys = ((2 * np.arange(18) + 1) * 37) // (2 * 18)
    xs = ((2 * np.arange(27) + 1) * 53) // (2 * 27)
    for i, m in enumerate(masks):
        np.testing.assert_array_equal(out[i, :18, :27], m[np.ix_(ys, xs)])
        assert (out[i, 18:, :] == 0).all() and (out[i, :, 27:] == 0).all()


def test_batch_native_matches_fallback(rng, monkeypatch):
    masks = [rand_mask(rng, 31, 41) for _ in range(3)]
    rles = [rle.encode(m) for m in masks]
    native = rle.decode_resize_batch(rles, 16, 16, 14, 14)
    monkeypatch.setattr(rle, "_lib", None)
    fallback = rle.decode_resize_batch(rles, 16, 16, 14, 14)
    np.testing.assert_array_equal(native, fallback)
