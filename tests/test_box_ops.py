import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import box_ops


def random_boxes(n, rng, z=(-2, 1)):
    return np.stack([
        rng.uniform(-10, 10, n),            # x
        rng.uniform(-10, 10, n),            # y
        rng.uniform(*z, n),                 # z (bottom)
        rng.uniform(0.5, 4.0, n),           # w
        rng.uniform(0.5, 6.0, n),           # l
        rng.uniform(0.8, 3.0, n),           # h
        rng.uniform(-np.pi, np.pi, n),      # yaw
    ], axis=1).astype(np.float32)


class TestEncodings:
    @pytest.mark.parametrize("vec", [False, True])
    @pytest.mark.parametrize("smooth", [False, True])
    def test_roundtrip(self, vec, smooth):
        rng = np.random.default_rng(0)
        boxes = random_boxes(64, rng).astype(np.float64)
        anchors = random_boxes(64, rng).astype(np.float64)
        enc = box_ops.second_box_encode(boxes, anchors, vec, smooth)
        dec = box_ops.second_box_decode(enc, anchors, vec, smooth)
        if vec:
            # yaw only recoverable modulo 2pi; compare via sin/cos
            np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(boxes[:, 6]),
                                       atol=1e-9)
            np.testing.assert_allclose(np.cos(dec[:, 6]), np.cos(boxes[:, 6]),
                                       atol=1e-9)
            np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=1e-9)
        else:
            np.testing.assert_allclose(dec, boxes, atol=1e-9)

    def test_zero_residual_for_identical(self):
        rng = np.random.default_rng(1)
        b = random_boxes(16, rng).astype(np.float64)
        enc = box_ops.second_box_encode(b, b)
        np.testing.assert_allclose(enc, 0.0, atol=1e-12)

    def test_bev_roundtrip(self):
        rng = np.random.default_rng(2)
        b = random_boxes(32, rng).astype(np.float64)[:, [0, 1, 3, 4, 6]]
        a = random_boxes(32, rng).astype(np.float64)[:, [0, 1, 3, 4, 6]]
        enc = box_ops.bev_box_encode(b, a)
        dec = box_ops.bev_box_decode(enc, a)
        np.testing.assert_allclose(dec, b, atol=1e-9)


class TestCorners:
    def test_axis_aligned_extent(self):
        c = box_ops.center_to_corner_box2d(
            np.array([[1.0, 2.0]]), np.array([[2.0, 4.0]]), np.array([0.0]))
        assert c.shape == (1, 4, 2)
        np.testing.assert_allclose(c[0].min(0), [0.0, 0.0])
        np.testing.assert_allclose(c[0].max(0), [2.0, 4.0])

    def test_rotation_90(self):
        c = box_ops.center_to_corner_box2d(
            np.array([[0.0, 0.0]]), np.array([[2.0, 4.0]]),
            np.array([np.pi / 2]))
        np.testing.assert_allclose(c[0].min(0), [-2.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(c[0].max(0), [2.0, 1.0], atol=1e-6)

    def test_3d_bottom_origin(self):
        c = box_ops.center_to_corner_box3d(
            np.array([[0.0, 0.0, 5.0]]), np.array([[2.0, 2.0, 3.0]]),
            np.array([0.0]))
        assert c.shape == (1, 8, 3)
        np.testing.assert_allclose(c[0, :, 2].min(), 5.0)
        np.testing.assert_allclose(c[0, :, 2].max(), 8.0)

    def test_rotation_3d_matches_2d(self):
        rng = np.random.default_rng(3)
        pts = rng.normal(size=(5, 7, 3))
        ang = rng.uniform(-np.pi, np.pi, 5)
        r3 = box_ops.rotation_3d_in_axis(pts, ang, axis=2)
        r2 = box_ops.rotation_2d(pts[..., :2], ang)
        np.testing.assert_allclose(r3[..., :2], r2, atol=1e-12)
        np.testing.assert_allclose(r3[..., 2], pts[..., 2])


class TestPointsInRbbox:
    def test_axis_aligned(self):
        box = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
        pts = np.array([
            [0.0, 0.0, 1.0],     # inside
            [0.9, 1.9, 0.1],     # inside near corner
            [1.1, 0.0, 1.0],     # outside x
            [0.0, 0.0, 2.5],     # above
            [0.0, 0.0, -0.5],    # below bottom
        ])
        m = box_ops.points_in_rbbox(pts, box)
        np.testing.assert_array_equal(m[:, 0], [True, True, False, False, False])

    def test_rotated(self):
        box = np.array([[0.0, 0.0, 0.0, 2.0, 6.0, 2.0, np.pi / 2]])
        # after 90° rotation the long axis lies along x
        pts = np.array([[2.5, 0.0, 1.0], [0.0, 2.5, 1.0]])
        m = box_ops.points_in_rbbox(pts, box)
        np.testing.assert_array_equal(m[:, 0], [True, False])

    def test_matches_corner_based_membership(self):
        rng = np.random.default_rng(4)
        boxes = random_boxes(10, rng)
        pts = rng.uniform(-12, 12, size=(500, 3)).astype(np.float32)
        m = box_ops.points_in_rbbox(pts, boxes)
        # cross-check with local-frame transform done independently
        for bi in range(len(boxes)):
            x, y, z, w, l, h, yaw = boxes[bi]
            d = pts - np.array([x, y, z + h / 2])
            c, s = np.cos(yaw), np.sin(yaw)
            lx = d[:, 0] * c + d[:, 1] * s
            ly = -d[:, 0] * s + d[:, 1] * c
            ref = (np.abs(lx) <= w / 2) & (np.abs(ly) <= l / 2) & (
                np.abs(d[:, 2]) <= h / 2)
            np.testing.assert_array_equal(m[:, bi], ref)


class TestAnchors:
    def test_range_grid_shape(self):
        a = box_ops.create_anchors_3d_range(
            (1, 4, 8), [0, -40, -1, 70.4, 40, -1],
            sizes=[(1.6, 3.9, 1.56)], rotations=(0, np.pi / 2))
        assert a.shape == (1, 4, 8, 2, 7)
        # x varies along W, y along H
        assert a[0, 0, 0, 0, 0] != a[0, 0, 1, 0, 0]
        assert a[0, 0, 0, 0, 1] != a[0, 1, 0, 0, 1]
        np.testing.assert_allclose(a[..., 3], 1.6)
        np.testing.assert_allclose(a[..., 4], 3.9)

    def test_stride_grid(self):
        a = box_ops.create_anchors_3d_stride(
            (1, 2, 2), anchor_strides=(0.5, 0.5, 0.0),
            anchor_offsets=(0.25, 0.25, -1.0))
        np.testing.assert_allclose(a[0, 0, :, 0, 0], [0.25, 0.75])
        np.testing.assert_allclose(a[0, :, 0, 0, 1], [0.25, 0.75])


class TestMisc:
    def test_limit_period(self):
        np.testing.assert_allclose(box_ops.limit_period(np.pi + 0.1), 0.1 - 0.0,
                                   atol=1e-9)
        v = box_ops.limit_period(np.array([0.2, -0.2, 3.2, -3.2]))
        assert (v >= -np.pi / 2).all() and (v < np.pi / 2 + 1e-9).all()

    def test_iou_2d(self):
        b = np.array([[0, 0, 2, 2]], dtype=np.float64)
        q = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float64)
        iou = box_ops.iou_2d(b, q)
        np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-12)

    def test_anchors_mask_area(self):
        dense = np.zeros((4, 4), np.float32)
        dense[1, 1] = 2; dense[2, 2] = 3
        bv = np.array([[0.0, 0.0, 4.0, 4.0], [0.0, 0.0, 1.9, 1.9]])
        area = box_ops.fused_get_anchors_area(
            dense, bv, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0), (4, 4))
        np.testing.assert_allclose(area, [5.0, 2.0])

    def test_camera_lidar_roundtrip(self):
        rng = np.random.default_rng(5)
        r_rect = np.eye(4)
        velo2cam = np.eye(4)
        velo2cam[:3, 3] = [0.1, -0.2, 0.3]
        th = 0.3
        velo2cam[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                            [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        pts = rng.normal(size=(20, 3))
        cam = box_ops.lidar_to_camera(pts, r_rect, velo2cam)
        back = box_ops.camera_to_lidar(cam, r_rect, velo2cam)
        np.testing.assert_allclose(back, pts, atol=1e-10)

    def test_box_camera_lidar_roundtrip(self):
        rng = np.random.default_rng(6)
        r_rect, velo2cam = np.eye(4), np.eye(4)
        boxes_cam = np.concatenate([
            rng.normal(size=(8, 3)), rng.uniform(1, 3, size=(8, 3)),
            rng.uniform(-np.pi, np.pi, size=(8, 1))], axis=1)
        lidar = box_ops.box_camera_to_lidar(boxes_cam, r_rect, velo2cam)
        back = box_ops.box_lidar_to_camera(lidar, r_rect, velo2cam)
        np.testing.assert_allclose(back, boxes_cam, atol=1e-10)


class TestFrustumCrop:
    def test_remove_outside_points_pinhole(self):
        """Synthetic pinhole camera: only points projecting inside the
        image survive the frustum crop."""
        from automatic_as_built_reconstruction_tpu.core import box_ops
        rng = np.random.default_rng(0)
        fx = fy = 500.0
        cx, cy = 320.0, 240.0
        P2 = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]],
                      np.float32)
        r_rect = np.eye(4, dtype=np.float32)
        # lidar x-forward -> camera z-forward
        velo2cam = np.array([[0, -1, 0, 0], [0, 0, -1, 0],
                             [1, 0, 0, 0], [0, 0, 0, 1]], np.float32)
        pts = np.concatenate([
            rng.uniform(1, 50, (4000, 1)),          # forward
            rng.uniform(-40, 40, (4000, 1)),        # left
            rng.uniform(-10, 10, (4000, 1)),        # up
            rng.random((4000, 1))], axis=1).astype(np.float32)
        kept = box_ops.remove_outside_points(pts, r_rect, velo2cam, P2,
                                             image_shape=(480, 640))
        assert 0 < len(kept) < len(pts)
        # oracle: project every point, compare membership
        cam = box_ops.lidar_to_camera(pts[:, :3], r_rect, velo2cam)
        uv = box_ops.project_to_image(cam, P2)
        in_img = ((cam[:, 2] > 0) & (uv[:, 0] >= 0) & (uv[:, 0] <= 640)
                  & (uv[:, 1] >= 0) & (uv[:, 1] <= 480)
                  & (cam[:, 2] < 100.0))
        assert len(kept) == int(in_img.sum())

    def test_frustum_corners_unproject_exactly(self):
        from automatic_as_built_reconstruction_tpu.core import box_ops
        P2 = np.array([[700.0, 1.5, 600, 45.0], [0, 710, 170, 0.3],
                       [0, 0, 1, 0.005]], np.float64)
        bbox = np.array([0, 0, 1242, 375], np.float64)
        fr = box_ops.image_bbox_to_camera_frustum(P2, bbox, near=0.01,
                                                  far=80.0)
        # every corner re-projects onto its source pixel
        uv = box_ops.project_to_image(fr, P2)
        expect = np.array([[0, 0], [0, 375], [1242, 375], [1242, 0]] * 2,
                          np.float64)
        np.testing.assert_allclose(uv, expect, atol=1e-6)
