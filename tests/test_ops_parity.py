"""Parity: device ops (JAX) vs NumPy oracles in core/."""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import (
    box_ops, geometry, nms as nms_np, voxelize)

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import (  # noqa: E402
    box_jax, nms_jax, rotated_iou, voxelize_jax)


def random_boxes(n, rng):
    return np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
        rng.uniform(-2, 1, n), rng.uniform(0.5, 4.0, n),
        rng.uniform(0.5, 6.0, n), rng.uniform(0.8, 3.0, n),
        rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)


class TestBoxJaxParity:
    @pytest.mark.parametrize("vec,smooth", [(False, False), (True, False),
                                            (False, True), (True, True)])
    def test_encode_decode(self, vec, smooth):
        rng = np.random.default_rng(0)
        boxes = random_boxes(128, rng)
        anchors = random_boxes(128, rng)
        enc_np = box_ops.second_box_encode(boxes, anchors, vec, smooth)
        enc_j = np.asarray(box_jax.second_box_encode(
            jnp.asarray(boxes), jnp.asarray(anchors), vec, smooth))
        # XLA's fp32 exp/log differ from numpy by a few ULP
        np.testing.assert_allclose(enc_j, enc_np, rtol=5e-4, atol=1e-4)
        dec_np = box_ops.second_box_decode(enc_np, anchors, vec, smooth)
        dec_j = np.asarray(box_jax.second_box_decode(
            jnp.asarray(enc_np), jnp.asarray(anchors), vec, smooth))
        # XLA's fp32 exp/log differ from numpy by a few ULP
        np.testing.assert_allclose(dec_j, dec_np, rtol=5e-4, atol=1e-4)

    def test_limit_period(self):
        v = np.linspace(-10, 10, 100).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(box_jax.limit_period(jnp.asarray(v))),
            box_ops.limit_period(v), atol=1e-6)

    def test_corners2d(self):
        rng = np.random.default_rng(1)
        b = random_boxes(32, rng)
        c_np = box_ops.center_to_corner_box2d(b[:, :2], b[:, 3:5], b[:, 6])
        c_j = np.asarray(box_jax.center_to_corner_box2d(
            jnp.asarray(b[:, :2]), jnp.asarray(b[:, 3:5]), jnp.asarray(b[:, 6])))
        np.testing.assert_allclose(c_j, c_np, atol=1e-5)


class TestVoxelizeParity:
    @pytest.mark.parametrize("max_points,max_voxels", [(35, 4000), (5, 500),
                                                       (3, 50)])
    def test_fcfs_parity(self, max_points, max_voxels):
        rng = np.random.default_rng(2)
        pts = np.concatenate([
            rng.uniform(-1, 71, (3000, 1)), rng.uniform(-41, 41, (3000, 1)),
            rng.uniform(-3.5, 1.5, (3000, 1)), rng.random((3000, 1))],
            axis=1).astype(np.float32)
        vs, pr = (0.2, 0.2, 0.4), (0, -40, -3, 70.4, 40, 1)
        gen = voxelize.VoxelGenerator(vs, pr, max_points, max_voxels)
        v_np, c_np, n_np = gen.generate(pts)
        res = voxelize_jax.voxelize(
            jnp.asarray(pts), jnp.int32(len(pts)), voxel_size=vs, pc_range=pr,
            grid_size=tuple(gen.grid_size), max_points=max_points,
            max_voxels=max_voxels)
        nv = int(res.num_voxels)
        assert nv == len(v_np)
        np.testing.assert_array_equal(np.asarray(res.coords)[:nv], c_np)
        np.testing.assert_array_equal(np.asarray(res.num_points)[:nv], n_np)
        np.testing.assert_array_equal(np.asarray(res.voxels)[:nv], v_np)
        # padding region must be zero / -1
        np.testing.assert_array_equal(np.asarray(res.coords)[nv:], -1)
        np.testing.assert_array_equal(np.asarray(res.voxels)[nv:], 0)

    def test_padded_input_ignored(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(1, 5, (100, 4)).astype(np.float32)
        padded = np.concatenate([pts, np.full((28, 4), 777, np.float32)])
        vs, pr = (0.5, 0.5, 0.5), (0, 0, 0, 8, 8, 8)
        res_a = voxelize_jax.voxelize(
            jnp.asarray(padded), jnp.int32(100), voxel_size=vs, pc_range=pr,
            grid_size=(16, 16, 16), max_points=10, max_voxels=64)
        res_b = voxelize_jax.voxelize(
            jnp.asarray(pts), jnp.int32(100), voxel_size=vs, pc_range=pr,
            grid_size=(16, 16, 16), max_points=10, max_voxels=64)
        np.testing.assert_array_equal(np.asarray(res_a.voxels),
                                      np.asarray(res_b.voxels))
        assert int(res_a.num_voxels) == int(res_b.num_voxels)

    def test_dynamic_voxelize_means(self):
        rng = np.random.default_rng(4)
        pts = rng.uniform(0.1, 7.9, (500, 4)).astype(np.float32)
        vs, pr = (1.0, 1.0, 1.0), (0, 0, 0, 8, 8, 8)
        res = voxelize_jax.dynamic_voxelize(
            jnp.asarray(pts), jnp.int32(500), voxel_size=vs, pc_range=pr,
            grid_size=(8, 8, 8), max_voxels=600)
        nv = int(res.num_voxels)
        # oracle: group by cell, mean
        cell = np.floor(pts[:, :3]).astype(int)
        feats = np.asarray(res.features)
        coords = np.asarray(res.coords)
        for v in range(nv):
            cz, cy, cx = coords[v]
            mask = (cell[:, 0] == cx) & (cell[:, 1] == cy) & (cell[:, 2] == cz)
            assert mask.sum() == int(res.num_points[v])
            np.testing.assert_allclose(feats[v], pts[mask].mean(0), rtol=1e-5)
        # per-point voxel index consistency
        pv = np.asarray(res.point_voxel_idx)
        assert (pv >= 0).all()
        for i in range(0, 500, 50):
            cz, cy, cx = coords[pv[i]]
            assert (cell[i] == [cx, cy, cz]).all()


class TestRotatedIouParity:
    def test_vs_oracle(self):
        rng = np.random.default_rng(5)
        n, k = 24, 17
        a = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                      rng.uniform(0.5, 4, n), rng.uniform(0.5, 4, n),
                      rng.uniform(-np.pi, np.pi, n)], axis=1).astype(np.float32)
        b = np.stack([rng.uniform(-5, 5, k), rng.uniform(-5, 5, k),
                      rng.uniform(0.5, 4, k), rng.uniform(0.5, 4, k),
                      rng.uniform(-np.pi, np.pi, k)], axis=1).astype(np.float32)
        iou_j = np.asarray(rotated_iou.rotate_iou_matrix(
            jnp.asarray(a), jnp.asarray(b)))
        iou_np = geometry.rotate_iou_matrix(a.astype(np.float64),
                                            b.astype(np.float64))
        np.testing.assert_allclose(iou_j, iou_np, atol=2e-4)

    def test_d3_vs_oracle(self):
        rng = np.random.default_rng(6)
        a = random_boxes(10, rng)
        b = random_boxes(8, rng)
        iou_j = np.asarray(rotated_iou.d3_iou_matrix(
            jnp.asarray(a), jnp.asarray(b)))
        iou_np = geometry.d3_box_overlap(a.astype(np.float64),
                                         b.astype(np.float64))
        np.testing.assert_allclose(iou_j, iou_np, atol=2e-4)

    def test_identical_boxes(self):
        b = jnp.asarray([[1.0, 2.0, 2.0, 4.0, 0.7]])
        np.testing.assert_allclose(
            np.asarray(rotated_iou.rotate_iou_matrix(b, b)), [[1.0]],
            atol=1e-5)


class TestNmsParity:
    def test_rotate_nms_vs_oracle(self):
        rng = np.random.default_rng(7)
        n = 40
        base = np.array([0.0, 0.0, 2.0, 4.0, 0.4])
        boxes = (base[None] + np.concatenate([
            rng.normal(0, 1.5, (n, 2)), rng.normal(0, 0.2, (n, 2)),
            rng.normal(0, 0.2, (n, 1))], axis=1)).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep_np = nms_np.rotate_nms(boxes, scores, 0.3)
        idx_j, valid_j = nms_jax.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3,
            pre_max_size=n, post_max_size=n)
        keep_j = np.asarray(idx_j)[np.asarray(valid_j)]
        np.testing.assert_array_equal(np.sort(keep_j), np.sort(keep_np))
        # order should both be score-descending
        np.testing.assert_array_equal(keep_j, keep_np)

    def test_center_suppress_vs_oracle(self):
        """Greedy center-distance suppression == numpy greedy loop."""
        rng = np.random.default_rng(13)
        R, K, r = 4, 32, 0.7
        centers = rng.uniform(-3, 3, (R, K, 2)).astype(np.float32)
        valid = rng.random((R, K)) > 0.2
        keep_j = np.asarray(nms_jax.center_suppress_presorted(
            jnp.asarray(centers), jnp.asarray(valid), r))
        for b in range(R):
            kept = []
            for i in range(K):
                if not valid[b, i]:
                    continue
                d = [np.hypot(*(centers[b, i] - centers[b, j]))
                     for j in kept]
                if all(x >= r for x in d):
                    kept.append(i)
            oracle = np.zeros(K, bool)
            oracle[kept] = True
            np.testing.assert_array_equal(keep_j[b], oracle)

    def test_presorted_matches_topk_variants(self):
        # rotate_nms_presorted / nearest_nms_presorted on pre-sorted rows
        # must agree with the top_k-inclusive entry points (modulo the
        # index space: presorted returns positions in the sorted row)
        rng = np.random.default_rng(11)
        R, n = 3, 48
        boxes = np.stack([
            np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                      np.full(n, 2.0) + rng.uniform(0, 1, n),
                      np.full(n, 4.0) + rng.uniform(0, 1, n),
                      rng.uniform(-np.pi, np.pi, n)], axis=1)
            for _ in range(R)]).astype(np.float32)
        scores = rng.uniform(0, 1, (R, n)).astype(np.float32)
        idx_b, val_b = nms_jax.rotate_nms_batch(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3,
            pre_max_size=n, post_max_size=n)
        order = np.argsort(-scores, axis=1, kind="stable")
        boxes_s = np.take_along_axis(boxes, order[..., None], axis=1)
        scores_s = np.take_along_axis(scores, order, axis=1)
        idx_p, val_p = nms_jax.rotate_nms_presorted(
            jnp.asarray(boxes_s), jnp.asarray(scores_s), 0.3,
            post_max_size=n)
        for r in range(R):
            kept_b = np.asarray(idx_b[r])[np.asarray(val_b[r])]
            kept_p = order[r][np.asarray(idx_p[r])[np.asarray(val_p[r])]]
            np.testing.assert_array_equal(kept_b, kept_p)

        near = np.asarray(jax.vmap(nms_jax.rbbox_to_near_bbox)(
            jnp.asarray(boxes_s)))
        idx_n, val_n = nms_jax.nearest_nms_presorted(
            jnp.asarray(near), jnp.asarray(scores_s), 0.3, post_max_size=n)
        for r in range(R):
            idx1, val1 = nms_jax.nearest_nms(
                jnp.asarray(near[r]),
                jnp.asarray(scores_s[r]), 0.3,
                pre_max_size=n, post_max_size=n)
            np.testing.assert_array_equal(
                np.asarray(idx_n[r])[np.asarray(val_n[r])],
                np.asarray(idx1)[np.asarray(val1)])

    def test_presorted_compaction_exact(self):
        """The compact_cap fast path (valid prefix fits a narrower width)
        must return exactly the full-width result, and rows overflowing
        the cap must fall back without changing answers."""
        rng = np.random.default_rng(23)
        R, n = 4, 48
        boxes = np.stack([
            np.stack([rng.uniform(-15, 15, n), rng.uniform(-15, 15, n),
                      np.full(n, 2.0), np.full(n, 4.0),
                      rng.uniform(-np.pi, np.pi, n)], axis=1)
            for _ in range(R)]).astype(np.float32)
        scores = -np.sort(-rng.uniform(0, 1, (R, n)).astype(np.float32), 1)
        for nvalid in (10, 40):      # 10 < cap=16 (compact), 40 > cap
            sc = scores.copy()
            sc[:, nvalid:] = -np.inf
            idx_full, val_full = nms_jax.rotate_nms_presorted(
                jnp.asarray(boxes), jnp.asarray(sc), 0.3,
                post_max_size=n, compact_cap=n)
            idx_c, val_c = nms_jax.rotate_nms_presorted(
                jnp.asarray(boxes), jnp.asarray(sc), 0.3,
                post_max_size=n, compact_cap=16)
            for r in range(R):
                np.testing.assert_array_equal(
                    np.asarray(idx_full[r])[np.asarray(val_full[r])],
                    np.asarray(idx_c[r])[np.asarray(val_c[r])],
                    err_msg=f"nvalid={nvalid} row={r}")
            # same contract for the axis-aligned variant
            near = np.asarray(jax.vmap(nms_jax.rbbox_to_near_bbox)(
                jnp.asarray(boxes)))
            in_f, vn_f = nms_jax.nearest_nms_presorted(
                jnp.asarray(near), jnp.asarray(sc), 0.3,
                post_max_size=n, compact_cap=n)
            in_c, vn_c = nms_jax.nearest_nms_presorted(
                jnp.asarray(near), jnp.asarray(sc), 0.3,
                post_max_size=n, compact_cap=16)
            for r in range(R):
                np.testing.assert_array_equal(
                    np.asarray(in_f[r])[np.asarray(vn_f[r])],
                    np.asarray(in_c[r])[np.asarray(vn_c[r])],
                    err_msg=f"nearest nvalid={nvalid} row={r}")

    def test_post_max_size(self):
        rng = np.random.default_rng(8)
        boxes = np.stack([rng.uniform(-50, 50, 64), rng.uniform(-50, 50, 64),
                          np.full(64, 2.0), np.full(64, 4.0),
                          np.zeros(64)], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        idx, valid = nms_jax.rotate_nms(jnp.asarray(boxes),
                                        jnp.asarray(scores), 0.3,
                                        pre_max_size=64, post_max_size=5)
        assert idx.shape == (5,)
        assert int(valid.sum()) == 5  # spread-out boxes: nothing suppressed

    def test_neg_inf_scores_excluded(self):
        boxes = np.zeros((8, 5), np.float32)
        boxes[:, 2:4] = 1.0
        scores = np.full(8, -np.inf, np.float32)
        scores[3] = 0.5
        idx, valid = nms_jax.rotate_nms(jnp.asarray(boxes),
                                        jnp.asarray(scores), 0.5,
                                        pre_max_size=8, post_max_size=8)
        kept = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(kept, [3])


class TestVoxelizeFastPath:
    def test_keyorder_path_matches_content(self):
        """first_appearance=False: same voxel set/contents, key order."""
        rng = np.random.default_rng(9)
        pts = np.concatenate([
            rng.uniform(-1, 71, (2000, 1)), rng.uniform(-41, 41, (2000, 1)),
            rng.uniform(-3.5, 1.5, (2000, 1)), rng.random((2000, 1))],
            axis=1).astype(np.float32)
        vs, pr = (0.2, 0.2, 0.4), (0, -40, -3, 70.4, 40, 1)
        gen = voxelize.VoxelGenerator(vs, pr, 5, 4000)
        v_np, c_np, n_np = gen.generate(pts)
        res = voxelize_jax.voxelize(
            jnp.asarray(pts), jnp.int32(len(pts)), voxel_size=vs, pc_range=pr,
            grid_size=tuple(gen.grid_size), max_points=5, max_voxels=4000,
            first_appearance=False)
        nv = int(res.num_voxels)
        assert nv == len(v_np)
        # match voxels by coordinate key
        def keyed(coords):
            return coords[:, 0] * 10_000_00 + coords[:, 1] * 1000 + coords[:, 2]
        k_ref = keyed(c_np.astype(np.int64))
        k_jax = keyed(np.asarray(res.coords[:nv]).astype(np.int64))
        order_ref, order_jax = np.argsort(k_ref), np.argsort(k_jax)
        np.testing.assert_array_equal(k_ref[order_ref], k_jax[order_jax])
        np.testing.assert_array_equal(n_np[order_ref],
                                      np.asarray(res.num_points[:nv])[order_jax])
        np.testing.assert_array_equal(v_np[order_ref],
                                      np.asarray(res.voxels[:nv])[order_jax])
        # key order => depth-minor (y, x, z) keys ascending
        cj = np.asarray(res.coords[:nv]).astype(np.int64)
        k_dm = (cj[:, 1] * 10_000_00 + cj[:, 2]) * 1000 + cj[:, 0]
        assert (np.diff(k_dm) > 0).all()

    def test_keyorder_padded_and_empty(self):
        vs, pr = (0.5, 0.5, 0.5), (0, 0, 0, 8, 8, 8)
        res = voxelize_jax.voxelize(
            jnp.zeros((16, 4)), jnp.int32(0), voxel_size=vs, pc_range=pr,
            grid_size=(16, 16, 16), max_points=4, max_voxels=8,
            first_appearance=False)
        assert int(res.num_voxels) == 0
        np.testing.assert_array_equal(np.asarray(res.coords), -1)
        np.testing.assert_array_equal(np.asarray(res.voxels), 0)


class TestBlockedRotateIoU:
    def test_blocked_matches_unblocked(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(12)
        a = np.stack([rng.uniform(0, 40, 300), rng.uniform(-20, 20, 300),
                      rng.uniform(0.5, 4, 300), rng.uniform(0.5, 4, 300),
                      rng.uniform(-np.pi, np.pi, 300)], 1).astype(np.float32)
        full = np.asarray(rotated_iou.rotate_iou_matrix(
            jnp.asarray(a), jnp.asarray(a)))
        blocked = np.asarray(rotated_iou.rotate_iou_matrix_blocked(
            jnp.asarray(a), jnp.asarray(a), row_block=64))
        np.testing.assert_allclose(blocked, full, atol=1e-5, rtol=1e-5)


class TestFixpointNmsChains:
    """The fixpoint greedy NMS must preserve exact chain semantics:
    A suppresses B, so C (overlapping B but not A) SURVIVES."""

    def test_explicit_chain(self):
        # three collinear overlapping boxes, scores A > B > C
        boxes = np.array([[0.0, 0, 4, 4, 0],
                          [2.5, 0, 4, 4, 0],     # iou(A,B) > 0.3
                          [5.0, 0, 4, 4, 0]],    # iou(B,C) > 0.3, iou(A,C)=0
                         np.float32)
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        idx, valid = nms_jax.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.2,
            pre_max_size=3, post_max_size=3)
        kept = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(kept, [0, 2])

    def test_dense_cluster_chains_vs_oracle(self):
        rng = np.random.default_rng(21)
        n = 300
        # long chains: boxes along a line spaced to overlap neighbors
        x = np.cumsum(rng.uniform(1.0, 2.5, n))
        boxes = np.stack([x, rng.normal(0, 0.3, n),
                          np.full(n, 4.0), np.full(n, 3.0),
                          rng.normal(0, 0.1, n)], 1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep_np = nms_np.rotate_nms(boxes, scores, 0.25)
        idx_j, valid_j = nms_jax.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.25,
            pre_max_size=n, post_max_size=n)
        keep_j = np.asarray(idx_j)[np.asarray(valid_j)]
        np.testing.assert_array_equal(keep_j, keep_np)


class TestNeighborPrunedNms:
    def _boxes(self, rng, n, spread=60.0):
        return np.stack([rng.uniform(0, spread, n),
                         rng.uniform(-spread / 2, spread / 2, n),
                         rng.uniform(1, 4, n), rng.uniform(1, 4, n),
                         rng.uniform(-np.pi, np.pi, n)],
                        1).astype(np.float32)

    def test_pruned_matches_oracle(self):
        rng = np.random.default_rng(31)
        boxes = self._boxes(rng, 400)
        scores = rng.uniform(0, 1, 400).astype(np.float32)
        keep_np = nms_np.rotate_nms(boxes, scores, 0.3)
        idx, valid = nms_jax.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.3,
            pre_max_size=400, post_max_size=400)
        keep_j = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(keep_j, keep_np)

    def test_overflow_falls_back_to_full_and_stays_exact(self):
        # 60 boxes crammed into a 6m disc: every row has > neighbor_cap
        # in-radius neighbors with a tiny cap -> full-matrix fallback
        rng = np.random.default_rng(32)
        n = 60
        boxes = np.stack([rng.uniform(0, 6, n), rng.uniform(0, 6, n),
                          rng.uniform(2, 4, n), rng.uniform(2, 4, n),
                          rng.uniform(-np.pi, np.pi, n)],
                         1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep_np = nms_np.rotate_nms(boxes, scores, 0.4)
        idx, valid = nms_jax.rotate_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.4,
            pre_max_size=n, post_max_size=n, neighbor_cap=4)
        keep_j = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(keep_j, keep_np)

    def test_pruned_keep_matches_full_keep(self):
        rng = np.random.default_rng(33)
        boxes = jnp.asarray(self._boxes(rng, 200))
        valid = jnp.ones((200,), bool)
        pruned = np.asarray(
            nms_jax.rotate_nms_keep_batch(boxes[None], valid[None],
                                          0.3, 64)[0])
        full_iou = rotated_iou.rotate_iou_matrix(boxes, boxes)
        full = np.asarray(nms_jax._greedy_suppress(full_iou, valid, 0.3))
        np.testing.assert_array_equal(pruned, full)

    def test_pair_iou_matches_matrix_diag(self):
        rng = np.random.default_rng(34)
        a = jnp.asarray(self._boxes(rng, 128, spread=10.0))
        b = jnp.asarray(self._boxes(rng, 128, spread=10.0))
        pairs = np.asarray(rotated_iou.rotate_iou_pairs(a, b))
        mat = np.asarray(rotated_iou.rotate_iou_matrix(a, b))
        np.testing.assert_allclose(pairs, np.diagonal(mat), atol=2e-4)
