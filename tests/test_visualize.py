"""Visualizer unit tests (fast, pure numpy/matplotlib).

Covers the per-instance coloring path the reference implements via
Array_Index.find_point_in_instance_bbox_with_yaw (visual/vis_mos_bbox.py:
318-331): score gating, ground offset, instance membership, and the three
color modes.
"""

import numpy as np

from insmos_tpu.cli.visualize import CLS_COLOR, gate_boxes, point_colors


def _scene():
    # two boxes: a car at (5, 0) and a pedestrian at (-4, 2), one point in
    # each, one moving point outside any box, one static background point
    scan = np.array(
        [
            [5.0, 0.0, -0.5, 0.1],   # inside car box
            [-4.0, 2.0, -0.5, 0.1],  # inside ped box
            [20.0, 5.0, -0.5, 0.1],  # moving, no box
            [0.0, -10.0, -0.5, 0.1], # static background
        ],
        np.float32,
    )
    mos = np.array([2, 1, 2, 1], np.int32)
    boxes = np.array(
        [
            [5.0, 0.0, -0.7, 4.0, 2.0, 1.6, 0.3],
            [-4.0, 2.0, -0.7, 0.8, 0.8, 1.7, 0.0],
        ],
        np.float32,
    )
    labels = np.array([1, 2], np.int32)
    return scan, mos, boxes, labels


def test_gate_boxes_reference_thresholds():
    pred = {
        "pred_boxes": np.zeros((3, 7), np.float32),
        "pred_scores": np.array([0.45, 0.25, 0.15], np.float32),
        "pred_labels": np.array([1, 2, 3], np.int32),
    }
    boxes, labels = gate_boxes(pred)
    # car gated at 0.5 (0.45 dropped); ped/cyc at 0.2 (0.25 kept, 0.15 not)
    assert labels.tolist() == [2]


def test_point_colors_class_mode():
    scan, mos, boxes, labels = _scene()
    c = point_colors(scan, mos, boxes, labels, "class")
    assert np.allclose(c[0], CLS_COLOR[2])
    assert np.allclose(c[1], CLS_COLOR[1])


def test_point_colors_ref_mode():
    scan, mos, boxes, labels = _scene()
    c = point_colors(scan, mos, boxes, labels, "ref")
    assert np.allclose(c[1], (0.0, 1.0, 1.0))  # in-box, not moving: cyan
    assert np.allclose(c[0], (1.0, 0.0, 0.0))  # moving wins over in-box
    assert np.allclose(c[2], (1.0, 0.0, 0.0))  # moving outside boxes
    assert np.allclose(c[3], (0.5, 0.5, 0.5))  # background gray


def test_point_colors_instance_mode_distinct():
    scan, mos, boxes, labels = _scene()
    c = point_colors(scan, mos, boxes, labels, "instance")
    # the two instances get different palette colors; background stays gray
    assert not np.allclose(c[0], c[1])
    assert np.allclose(c[3], (0.5, 0.5, 0.5))
    # a point in NO box but moving stays red
    assert np.allclose(c[2], (1.0, 0.0, 0.0))
