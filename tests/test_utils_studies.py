"""Utility timers + rolling-shutter study."""

import numpy as np

from mqslam_tpu.utils import Timer, timers
from mqslam_tpu.studies import rolling_shutter as rs


def test_timer_accumulates():
    t = Timer("x")
    with t:
        sum(range(1000))
    with t:
        sum(range(1000))
    assert t.count == 2
    assert t.total > 0
    assert "x" in repr(t)


def test_registry():
    timers["unit-test-timer"].start()
    timers["unit-test-timer"].stop()
    assert timers["unit-test-timer"].count >= 1


def test_classify_tracks():
    dev_x = np.array([[0.0, 0.3, 0.8, 2.0, 5.0],
                      [0.0, -0.3, -0.8, -2.0, -5.0]])
    dev_y = np.array([[0.0, 0.1, 0.1, 0.1, 4.0],
                      [0.0, -0.1, -0.1, -0.1, -4.0]])
    classes, stds = rs.classify_tracks(dev_x, dev_y)
    assert list(classes["zero"]) == [0]
    assert list(classes["half"]) == [1]
    assert list(classes["one"]) == [2]
    assert list(classes["three"]) == [3]
    assert list(classes["bad"]) == [4]


def test_analyze_static_sequence(rng):
    from mqslam_tpu.frontend import synthetic
    tex = synthetic.make_texture(rng)
    P = np.eye(4)[None].repeat(4, axis=0)
    imgs = synthetic.render_plane_sequence(P, tex, size=(160, 120), f=140.0)
    # perfectly static scene + camera: deviations ~ 0
    stats = rs.analyze_sequence(list(imgs), max_tracks=64)
    assert np.abs(stats.deviations_x).max() < 0.3
