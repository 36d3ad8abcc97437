"""Point-evidence yaw refinement on synthetic door-like planes."""
import numpy as np

from automatic_as_built_reconstruction_tpu.core import point_refine


def _plane_points(center, width, height, yaw, n=400, noise=0.01, seed=0):
    """Points on a vertical plane (a door leaf) at ``yaw`` (l-axis)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(-width / 2, width / 2, n)       # along the leaf
    v = rng.normal(0.0, noise, n)                   # off-plane noise
    z = rng.uniform(0.0, height, n)
    c, s = np.cos(yaw), np.sin(yaw)
    # l-axis (leaf direction) in world = (-sin yaw, cos yaw)
    x = center[0] - u * s + v * c
    y = center[1] + u * c + v * s
    return np.stack([x, y, center[2] + z], axis=1)


def _yaw_err(a, b):
    """Smallest angle between two pi-symmetric orientations."""
    d = abs((a - b) % np.pi)
    return min(d, np.pi - d)


def test_quarter_turn_flip_recovered():
    true_yaw = 0.7
    pts = _plane_points((4.0, 2.0, 0.0), 0.9, 2.0, true_yaw)
    det = np.array([[4.0, 2.0, 0.0, 0.06, 0.9, 2.0,
                     true_yaw + np.pi / 2]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([2]), classes=(2,))
    assert _yaw_err(out[0, 6], true_yaw) < np.deg2rad(4)


def test_small_yaw_noise_polished():
    true_yaw = -0.3
    pts = _plane_points((1.0, -3.0, 0.0), 1.0, 2.1, true_yaw, seed=3)
    det = np.array([[1.0, -3.0, 0.0, 0.05, 1.0, 2.1,
                     true_yaw + np.deg2rad(17)]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([2]), classes=(2,))
    assert _yaw_err(out[0, 6], true_yaw) < np.deg2rad(4)


def test_correct_yaw_left_alone():
    true_yaw = 1.1
    pts = _plane_points((0.0, 0.0, 0.0), 0.9, 2.0, true_yaw, seed=5)
    det = np.array([[0.0, 0.0, 0.0, 0.06, 0.9, 2.0, true_yaw]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([2]), classes=(2,))
    assert _yaw_err(out[0, 6], true_yaw) < np.deg2rad(4)


def test_non_target_class_untouched():
    pts = _plane_points((0.0, 0.0, 0.0), 0.9, 2.0, 0.0)
    det = np.array([[0.0, 0.0, 0.0, 0.06, 0.9, 2.0, np.pi / 2]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([0]), classes=(2,))
    assert out[0, 6] == np.pi / 2


def test_too_few_points_untouched():
    pts = _plane_points((0.0, 0.0, 0.0), 0.9, 2.0, 0.0, n=3)
    det = np.array([[0.0, 0.0, 0.0, 0.06, 0.9, 2.0, np.pi / 2]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([2]), classes=(2,), min_points=8)
    assert out[0, 6] == np.pi / 2


def test_recenter_pulls_onto_plane():
    true_yaw = 0.4
    pts = _plane_points((2.0, 2.0, 0.0), 0.9, 2.0, true_yaw, seed=7)
    # detection offset 6 cm along the thin (normal) axis
    nx, ny = np.cos(true_yaw), np.sin(true_yaw)
    det = np.array([[2.0 + 0.06 * nx, 2.0 + 0.06 * ny, 0.0,
                     0.06, 0.9, 2.0, true_yaw]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([2]), classes=(2,), recenter=True)
    assert abs(out[0, 0] - 2.0) < 0.02
    assert abs(out[0, 1] - 2.0) < 0.02


def test_refine_detections_dict():
    pts = _plane_points((0.0, 0.0, 0.0), 0.9, 2.0, 0.0)
    det = {"box3d_lidar": np.array([[0.0, 0.0, 0.0, 0.06, 0.9, 2.0,
                                     np.pi / 2]]),
           "scores": np.array([0.9]),
           "label_preds": np.array([2])}
    out = point_refine.refine_detections(det, pts, classes=(2,))
    assert _yaw_err(out["box3d_lidar"][0, 6], 0.0) < np.deg2rad(4)
    assert out["scores"][0] == det["scores"][0]


def test_length_trim_shrinks_to_plane_extent():
    """A wall detection 25% longer than the supporting plane is trimmed
    to the measured extent (VERDICT r4: refine-for-walls)."""
    true_yaw = 0.3
    pts = _plane_points((5.0, 1.0, 0.0), 4.0, 2.5, true_yaw, n=1200,
                        seed=11)
    det = np.array([[5.0, 1.0, 0.0, 0.12, 5.0, 2.5, true_yaw]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([0]), classes=(0,), trim_length=True)
    assert abs(out[0, 4] - 4.0) < 0.25
    assert abs(out[0, 0] - 5.0) < 0.1
    assert abs(out[0, 1] - 1.0) < 0.1


def test_length_trim_recovers_offset_endpoint():
    """Wall length correct but slid along the element: trim recenters
    the span midpoint onto the evidence."""
    true_yaw = 0.0
    # plane centered at y=0 along l-axis (l dir = (0, 1) at yaw 0)
    pts = _plane_points((2.0, 0.0, 0.0), 4.0, 2.5, true_yaw, n=1200,
                        seed=12)
    det = np.array([[2.0, 0.8, 0.0, 0.12, 4.4, 2.5, true_yaw]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([0]), classes=(0,), trim_length=True)
    assert abs(out[0, 1] - 0.0) < 0.15


def test_length_trim_guard_rejects_large_change():
    """Evidence far exceeding the detection (a 7 m wall under a 3 m
    detection — e.g. a fragment of a longer run) must not blow the
    length up: the change guard rejects the ambiguous evidence."""
    pts = _plane_points((0.0, 0.0, 0.0), 7.0, 2.5, 0.0, n=1400, seed=13)
    det = np.array([[0.0, 0.0, 0.0, 0.12, 3.0, 2.5, 0.0]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([0]), classes=(0,), trim_length=True)
    assert out[0, 4] == 3.0


def test_refinement_robust_to_noise_and_dropout():
    """VERDICT r4 weak 5: refinement must not hurt under point noise
    (3 cm sigma) and 30% dropout — both yaw recovery and the no-churn
    case."""
    rng = np.random.default_rng(99)
    for seed, yaw_off in ((21, np.pi / 2), (22, np.deg2rad(15)),
                          (23, 0.0)):
        true_yaw = 0.5
        pts = _plane_points((3.0, -2.0, 0.0), 0.9, 2.0, true_yaw,
                            n=600, noise=0.03, seed=seed)
        keep = rng.random(len(pts)) > 0.30
        pts = pts[keep]
        det = np.array([[3.0, -2.0, 0.0, 0.06, 0.9, 2.0,
                         true_yaw + yaw_off]])
        out = point_refine.refine_yaw_by_points(
            pts, det, np.array([2]), classes=(2,), recenter=True)
        assert _yaw_err(out[0, 6], true_yaw) < np.deg2rad(6), \
            f"seed={seed} yaw_off={yaw_off}"


def test_trim_applies_even_when_yaw_guard_declines():
    """Correct yaw (guard declines the yaw commit) + wrong length:
    the trim must still land."""
    true_yaw = 0.9
    pts = _plane_points((1.0, 1.0, 0.0), 4.0, 2.5, true_yaw, n=1200,
                        seed=15)
    det = np.array([[1.0, 1.0, 0.0, 0.12, 5.0, 2.5, true_yaw]])
    out = point_refine.refine_yaw_by_points(
        pts, det, np.array([0]), classes=(0,), trim_length=True)
    assert abs(out[0, 4] - 4.0) < 0.25
