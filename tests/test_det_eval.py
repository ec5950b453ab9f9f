"""Detection mAP evaluator sanity tests."""

import numpy as np

from lang2seg_tpu.utils.det_eval import DetectionEvaluator, _ap_from_matches


def test_perfect_detections():
    ev = DetectionEvaluator()
    gt = np.array([[0, 0, 10, 10], [50, 50, 80, 90]], float)
    cls = np.array([1, 2])
    ev.add_image(gt, np.array([0.9, 0.8]), cls, gt, cls)
    s = ev.summary()
    assert s["mAP@0.5"] == 1.0
    assert s["mAP@[.5:.95]"] == 1.0


def test_missed_and_false_positive():
    ev = DetectionEvaluator(iou_thresholds=[0.5])
    gt = np.array([[0, 0, 10, 10], [50, 50, 80, 90]], float)
    det = np.array([[0, 0, 10, 10], [200, 200, 210, 210]], float)
    ev.add_image(det, np.array([0.9, 0.8]), np.array([1, 1]),
                 gt, np.array([1, 1]))
    s = ev.summary()
    # one of two GTs found, one FP after it: AP = 0.5 (prec 1 at rec 0.5)
    assert abs(s["mAP@0.5"] - 0.5) < 1e-9


def test_ap_ordering_matters():
    # TP with high score beats TP with low score mixed under FPs
    good = _ap_from_matches([0.9, 0.1], [1, 0], num_gt=1)
    bad = _ap_from_matches([0.9, 0.1], [0, 1], num_gt=1)
    assert good == 1.0 and bad == 0.5


def test_localization_threshold():
    ev = DetectionEvaluator(iou_thresholds=[0.5, 0.95])
    gt = np.array([[0, 0, 100, 100]], float)
    det = np.array([[10, 10, 110, 110]], float)  # IoU ~0.68
    ev.add_image(det, np.array([0.9]), np.array([1]), gt, np.array([1]))
    s = ev.summary()
    assert s["mAP@0.5"] == 1.0
    assert s["mAP@[.5:.95]"] == 0.5   # hits 0.5, misses 0.95
