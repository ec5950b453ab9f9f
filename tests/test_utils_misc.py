"""Prefetcher, visualization, timer utilities."""

import os
import time

import numpy as np
import pytest

from lang2seg_tpu.data.prefetch import Prefetcher
from lang2seg_tpu.utils.timer import Timer
from lang2seg_tpu.utils.visualization import (draw_boxes,
                                              save_response_map,
                                              save_topk_channels)


def test_prefetcher_orders_and_overlaps():
    counter = iter(range(1000))

    def make():
        return {"i": next(counter)}

    pf = Prefetcher(make, depth=2)
    got = [pf.get()["i"] for _ in range(5)]
    assert got == [0, 1, 2, 3, 4]
    pf.close()


def test_prefetcher_propagates_errors():
    def boom():
        raise RuntimeError("loader died")

    pf = Prefetcher(boom, depth=1)
    with pytest.raises(RuntimeError, match="loader died"):
        pf.get()


def test_timer_averages():
    t = Timer()
    t.tic("x")
    time.sleep(0.01)
    dt = t.toc("x")
    assert dt >= 0.01
    assert t.average_time("x") == pytest.approx(dt)


def test_visualization_outputs(tmp_path, rng):
    resp = rng.randn(20, 30).astype(np.float32)
    p = save_response_map(resp, str(tmp_path), "img1", sent_id=2)
    assert os.path.exists(p) and p.endswith("img1_2.png")

    feat = rng.randn(10, 12, 8).astype(np.float32)
    paths = save_topk_channels(feat, str(tmp_path), "img1", k=3)
    assert len(paths) == 3 and all(os.path.exists(q) for q in paths)

    img = (rng.rand(50, 60, 3) * 255).astype(np.uint8)
    out = draw_boxes(img, np.array([[5, 5, 30, 40]]), np.array([7]))
    assert out.shape == img.shape
    assert not np.array_equal(out, img)   # something was drawn
