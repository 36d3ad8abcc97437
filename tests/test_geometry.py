import numpy as np

from automatic_as_built_reconstruction_tpu.core import box_ops, geometry


class TestRotatedIoU:
    def test_identical(self):
        b = np.array([[1.0, 2.0, 2.0, 4.0, 0.7]])
        iou = geometry.rotate_iou_matrix(b, b)
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)

    def test_disjoint(self):
        a = np.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
        b = np.array([[10.0, 10.0, 2.0, 2.0, -0.8]])
        np.testing.assert_allclose(geometry.rotate_iou_matrix(a, b), [[0.0]])

    def test_axis_aligned_matches_iou2d(self):
        rng = np.random.default_rng(0)
        n, k = 12, 9
        a = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                      rng.uniform(1, 4, n), rng.uniform(1, 4, n),
                      np.zeros(n)], axis=1)
        b = np.stack([rng.uniform(-5, 5, k), rng.uniform(-5, 5, k),
                      rng.uniform(1, 4, k), rng.uniform(1, 4, k),
                      np.zeros(k)], axis=1)
        riou = geometry.rotate_iou_matrix(a, b)
        aab = np.concatenate([a[:, :2] - a[:, 2:4] / 2,
                              a[:, :2] + a[:, 2:4] / 2], axis=1)
        bab = np.concatenate([b[:, :2] - b[:, 2:4] / 2,
                              b[:, :2] + b[:, 2:4] / 2], axis=1)
        iou = box_ops.iou_2d(aab, bab)
        np.testing.assert_allclose(riou, iou, atol=1e-5)

    def test_45_deg_known_value(self):
        # unit square vs the same square rotated 45°: intersection is a
        # regular octagon with area 2*(sqrt(2)-1) ≈ 0.828427
        a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
        inter = geometry.rotated_box_intersection_area(a[0], b[0])
        np.testing.assert_allclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-6)

    def test_containment(self):
        a = np.array([[0.0, 0.0, 4.0, 4.0, 0.3]])
        b = np.array([[0.0, 0.0, 1.0, 1.0, 1.1]])
        iou = geometry.rotate_iou_matrix(a, b)
        np.testing.assert_allclose(iou, [[1.0 / 16.0]], atol=1e-6)

    def test_rotation_invariance(self):
        rng = np.random.default_rng(1)
        for _ in range(20):
            a = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                          rng.uniform(1, 3), rng.uniform(1, 3),
                          rng.uniform(-np.pi, np.pi)])
            b = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                          rng.uniform(1, 3), rng.uniform(1, 3),
                          rng.uniform(-np.pi, np.pi)])
            i0 = geometry.rotated_box_intersection_area(a, b)
            # rotate both boxes (and centers) by a common angle
            th = rng.uniform(-np.pi, np.pi)
            c, s = np.cos(th), np.sin(th)

            def rot(box):
                x, y = box[0], box[1]
                return np.array([x * c - y * s, x * s + y * c,
                                 box[2], box[3], box[4] + th])

            i1 = geometry.rotated_box_intersection_area(rot(a), rot(b))
            np.testing.assert_allclose(i0, i1, atol=1e-8)


class Test3DOverlap:
    def test_z_separated(self):
        a = np.array([[0, 0, 0.0, 2, 2, 1, 0.0]], np.float64)
        b = np.array([[0, 0, 5.0, 2, 2, 1, 0.0]], np.float64)
        np.testing.assert_allclose(geometry.d3_box_overlap(a, b), [[0.0]])

    def test_identical(self):
        a = np.array([[1, 2, -1.0, 2, 3, 1.5, 0.4]], np.float64)
        np.testing.assert_allclose(geometry.d3_box_overlap(a, a), [[1.0]],
                                   atol=1e-6)

    def test_half_height_overlap(self):
        a = np.array([[0, 0, 0.0, 2, 2, 2, 0.0]], np.float64)
        b = np.array([[0, 0, 1.0, 2, 2, 2, 0.0]], np.float64)
        # inter = 4*1=4, union = 8+8-4=12
        np.testing.assert_allclose(geometry.d3_box_overlap(a, b), [[1 / 3]],
                                   atol=1e-6)


class TestCollision:
    def test_vs_intersection_area(self):
        rng = np.random.default_rng(2)
        n, k = 15, 15
        boxes = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                          rng.uniform(0.5, 3, n), rng.uniform(0.5, 3, n),
                          rng.uniform(-np.pi, np.pi, n)], axis=1)
        qboxes = np.stack([rng.uniform(-4, 4, k), rng.uniform(-4, 4, k),
                           rng.uniform(0.5, 3, k), rng.uniform(0.5, 3, k),
                           rng.uniform(-np.pi, np.pi, k)], axis=1)
        coll = geometry.box_collision_test(boxes, qboxes)
        for i in range(n):
            for j in range(k):
                inter = geometry.rotated_box_intersection_area(
                    boxes[i], qboxes[j])
                if inter > 1e-6:
                    assert coll[i, j], (i, j, inter)
                # SAT reports touching contact too; only check the positive
                # direction (area > 0 => collision)


class TestPolygonTests:
    def test_points_in_convex_polygon(self):
        square = np.array([[[0, 0], [1, 0], [1, 1], [0, 1.0]]])
        pts = np.array([[0.5, 0.5], [1.5, 0.5], [-0.1, 0.2]])
        res = geometry.points_in_convex_polygon(pts, square)
        np.testing.assert_array_equal(res[:, 0], [True, False, False])

    def test_points_in_box_surfaces_matches_rbbox(self):
        rng = np.random.default_rng(3)
        boxes = np.stack([
            rng.uniform(-5, 5, 6), rng.uniform(-5, 5, 6),
            rng.uniform(-1, 0, 6), rng.uniform(1, 3, 6),
            rng.uniform(1, 3, 6), rng.uniform(1, 2, 6),
            rng.uniform(-np.pi, np.pi, 6)], axis=1)
        corners = box_ops.center_to_corner_box3d(
            boxes[:, :3], boxes[:, 3:6], boxes[:, 6])
        surfaces = geometry.corner_to_surfaces_3d_jit(corners)
        pts = rng.uniform(-6, 6, size=(300, 3))
        via_surface = geometry.points_in_convex_polygon_3d(pts, surfaces)
        via_rbbox = box_ops.points_in_rbbox(pts, boxes)
        # exclude points within eps of a face (boundary tie-breaks differ)
        disagree = via_surface != via_rbbox
        assert disagree.mean() < 0.01
