"""Model zoo tests: shapes, loss decrease on a synthetic scene, predict."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from automatic_as_built_reconstruction_tpu.core import (  # noqa: E402
    anchors as anchors_mod, box_coders, region_similarity, target_assign,
    voxelize)
from automatic_as_built_reconstruction_tpu.models import voxelnet  # noqa: E402
from automatic_as_built_reconstruction_tpu.models.voxelnet import (  # noqa: E402
    VoxelNet, VoxelNetConfig, compute_loss, predict)

PC_RANGE = (0.0, -8.0, -3.0, 16.0, 8.0, 1.0)
VOXEL_SIZE = (0.5, 0.5, 4.0)
GRID = (32, 32, 1)  # gx, gy, gz


def tiny_cfg(**kw):
    defaults = dict(
        num_class=1,
        vfe_name="PillarFeatureNet",
        vfe_num_filters=(16,),
        voxel_size=VOXEL_SIZE,
        pc_range=PC_RANGE,
        grid_size=GRID,
        rpn_layer_nums=(1, 1),
        rpn_layer_strides=(2, 2),
        rpn_num_filters=(16, 32),
        rpn_upsample_strides=(1, 2),
        rpn_num_upsample_filters=(16, 16),
        num_anchor_per_loc=2,
        nms_pre_max_size=64,
        nms_post_max_size=8,
        nms_score_threshold=0.3,
    )
    defaults.update(kw)
    return VoxelNetConfig(**defaults)


def make_scene(rng, gt_boxes):
    """Synthetic scan: dense box points + sparse background."""
    pts = [np.c_[rng.uniform(0, 16, (600, 1)), rng.uniform(-8, 8, (600, 1)),
                 rng.uniform(-2, 0, (600, 1)), rng.random((600, 1))]]
    for b in gt_boxes:
        local = rng.uniform(-0.5, 0.5, (200, 3)) * b[3:6] + [0, 0, b[5] / 2]
        c, s = np.cos(b[6]), np.sin(b[6])
        world = np.c_[local[:, 0] * c - local[:, 1] * s + b[0],
                      local[:, 0] * s + local[:, 1] * c + b[1],
                      local[:, 2] + b[2]]
        pts.append(np.c_[world, np.ones((200, 1))])
    return np.concatenate(pts).astype(np.float32)


def make_example(cfg, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.array([[5.0, 2.0, -1.7, 1.6, 3.9, 1.56, 0.0],
                   [11.0, -4.0, -1.7, 1.6, 3.9, 1.56, np.pi / 2]], np.float32)
    points = make_scene(rng, gt)
    gen = voxelize.VoxelGenerator(VOXEL_SIZE, PC_RANGE, 20, 600)
    voxels, coords, num_points = gen.generate(points)
    V = 600
    pad = V - len(voxels)
    voxels = np.pad(voxels, ((0, pad), (0, 0), (0, 0)))
    coords = np.pad(coords, ((0, pad), (0, 0)), constant_values=-1)
    num_points = np.pad(num_points, (0, pad))

    # anchors on the stride-2 feature map (16x16)
    agen = anchors_mod.AnchorGeneratorRange(
        anchor_ranges=(0, -8, -1.78, 16, 8, -1.78),
        sizes=((1.6, 3.9, 1.56),), rotations=(0, np.pi / 2),
        match_threshold=0.5, unmatch_threshold=0.35)
    anchors = agen.generate((1, 16, 16)).reshape(-1, 7).astype(np.float32)
    assigner_res = target_assign.create_targets(
        anchors, gt, region_similarity.NearestIouSimilarity().compare,
        box_coders.GroundBox3dCoder().encode, gt_classes=np.array([1, 1]),
        matched_threshold=0.5, unmatched_threshold=0.35)
    ex = {
        "voxels": voxels[None], "num_points": num_points[None],
        "coordinates": coords[None], "anchors": anchors[None],
        "labels": assigner_res["labels"][None],
        "reg_targets": assigner_res["bbox_targets"][None],
    }
    return {k: jnp.asarray(v) for k, v in ex.items()}, gt


class TestForward:
    def test_shapes_pointpillars(self):
        cfg = tiny_cfg()
        ex, _ = make_example(cfg)
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), ex["voxels"],
                               ex["num_points"], ex["coordinates"])
        preds = model.apply(variables, ex["voxels"], ex["num_points"],
                            ex["coordinates"])
        # grid 32x32, rpn stride 2 -> 16x16 maps
        assert preds["box_preds"].shape == (1, 16, 16, 2 * 7)
        assert preds["cls_preds"].shape == (1, 16, 16, 2 * 1)
        assert preds["dir_cls_preds"].shape == (1, 16, 16, 2 * 2)

    def test_yaw_quality_head(self):
        """Quality head: extra per-anchor logit, a loss term on positives,
        and score multiplication that demotes wrong-yaw duplicates."""
        cfg = tiny_cfg(use_yaw_quality_head=True)
        ex, _ = make_example(cfg)
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), ex["voxels"],
                               ex["num_points"], ex["coordinates"])
        preds = model.apply(variables, ex["voxels"], ex["num_points"],
                            ex["coordinates"])
        assert preds["quality_preds"].shape == (1, 16, 16, 2)
        loss, metrics = compute_loss(preds, ex, cfg)
        assert "loss_quality" in metrics
        assert np.isfinite(float(metrics["loss_quality"]))

        # predict: force one anchor's quality logit very negative -> its
        # final score must drop below a lower-cls-score rival
        flat = voxelnet._flatten_preds(preds, cfg)
        A = flat["cls_preds"].shape[1]
        hi, lo = 5, 6
        cls = np.full((1, A, 1), -6.0, np.float32)
        cls[0, hi, 0] = 3.0            # sigmoid 0.95 — but bad yaw
        cls[0, lo, 0] = 1.0            # sigmoid 0.73 — good yaw
        qual = np.full((1, A), 8.0, np.float32)
        qual[0, hi] = -8.0             # quality ~0
        forged = {
            "box_preds": np.asarray(preds["box_preds"]),
            "cls_preds": cls.reshape(1, 16, 16, 2),
            "dir_cls_preds": np.asarray(preds["dir_cls_preds"]),
            "quality_preds": qual.reshape(1, 16, 16, 2),
        }
        det = predict({k: jnp.asarray(v) for k, v in forged.items()},
                      ex["anchors"], cfg)
        scores = np.asarray(det["scores"][0])
        valid = np.asarray(det["valid"][0])
        assert valid.any()
        # the winning score is the quality-weighted good-yaw anchor
        # (~0.73), not the bad-yaw 0.95 anchor
        assert abs(scores[valid].max() - 0.73) < 0.02

    def test_center_distance_suppression(self):
        """Two perpendicular same-center boxes survive rotated NMS (IoU
        ~0.26 < 0.5) but center suppression keeps only the winner."""
        cfg0 = tiny_cfg()
        ex, _ = make_example(cfg0)
        A = ex["anchors"].shape[1]
        # anchors come in per-location rotation pairs (2*i, 2*i+1):
        # same center, yaw 0 vs pi/2
        loc = 40
        cls = np.full((1, A, 1), -9.0, np.float32)
        cls[0, 2 * loc, 0] = 3.0        # winner
        cls[0, 2 * loc + 1, 0] = 2.0    # same-center perpendicular dup
        forged = {
            "box_preds": np.zeros((1, 16, 16, 14), np.float32),
            "cls_preds": cls.reshape(1, 16, 16, 2),
        }
        preds = {k: jnp.asarray(v) for k, v in forged.items()}
        det0 = predict(preds, ex["anchors"],
                       tiny_cfg(use_direction_classifier=False))
        n0 = int(np.asarray(det0["valid"]).sum())
        det1 = predict(preds, ex["anchors"],
                       tiny_cfg(use_direction_classifier=False,
                                nms_center_suppress_radius=0.3))
        n1 = int(np.asarray(det1["valid"]).sum())
        assert n0 == 2 and n1 == 1
        s1 = np.asarray(det1["scores"][0])
        assert abs(s1.max() - 1 / (1 + np.exp(-3.0))) < 1e-3

    def test_shapes_dense_middle(self):
        cfg = tiny_cfg(vfe_name="SimpleVoxel", middle_name="DenseMiddle",
                       grid_size=(32, 32, 8),
                       voxel_size=(0.5, 0.5, 0.5),
                       middle_num_filters=(8, 16))
        ex, _ = make_example(cfg)
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), ex["voxels"],
                               ex["num_points"], ex["coordinates"])
        preds = model.apply(variables, ex["voxels"], ex["num_points"],
                            ex["coordinates"])
        # middle z-downsamples 8->2, xy 32->16 (one stride-2 xy block),
        # rpn stride 2,2 from 16 -> then upsampled concat at 8
        assert preds["box_preds"].shape[0] == 1
        assert preds["box_preds"].shape[-1] == 14


class TestOverfit:
    def test_loss_decreases_and_predict_recovers(self):
        cfg = tiny_cfg()
        ex, gt = make_example(cfg)
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), ex["voxels"],
                               ex["num_points"], ex["coordinates"],
                               train=True)
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(2e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                preds, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    ex["voxels"], ex["num_points"], ex["coordinates"],
                    train=True, mutable=["batch_stats"])
                loss, metrics = compute_loss(preds, ex, cfg)
                return loss, (metrics, mut["batch_stats"])

            (loss, (metrics, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        losses = []
        for _ in range(300):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.5, losses[::10]

        preds = model.apply({"params": params, "batch_stats": batch_stats},
                            ex["voxels"], ex["num_points"],
                            ex["coordinates"], train=False)
        det = predict(preds, ex["anchors"], cfg)
        valid = np.asarray(det["valid"][0])
        boxes = np.asarray(det["box3d_lidar"][0])[valid]
        scores = np.asarray(det["scores"][0])[valid]
        assert len(boxes) >= 2, f"expected >=2 detections, got {len(boxes)}"
        # the two best detections should be near the two gt boxes
        top2 = boxes[np.argsort(-scores)[:2]]
        dists = np.linalg.norm(
            top2[:, None, :2] - gt[None, :, :2], axis=-1).min(axis=0)
        assert (dists < 1.0).all(), (top2, gt)


class TestLossFunctions:
    def test_focal_loss_zero_for_perfect(self):
        from automatic_as_built_reconstruction_tpu.models.losses import (
            SigmoidFocalClassificationLoss)
        focal = SigmoidFocalClassificationLoss()
        logits = jnp.array([[[20.0], [-20.0]]])
        targets = jnp.array([[[1.0], [0.0]]])
        w = jnp.ones((1, 2))
        loss = focal(logits, targets, w)
        assert float(loss.sum()) < 1e-6

    def test_smooth_l1_quadratic_to_linear(self):
        from automatic_as_built_reconstruction_tpu.models.losses import (
            WeightedSmoothL1LocalizationLoss)
        l1 = WeightedSmoothL1LocalizationLoss(sigma=1.0)
        pred = jnp.array([[[0.5, 3.0]]])
        tgt = jnp.zeros((1, 1, 2))
        w = jnp.ones((1, 1))
        out = np.asarray(l1(pred, tgt, w))[0, 0]
        np.testing.assert_allclose(out, [0.125, 2.5], atol=1e-6)

    def test_prepare_loss_weights_norm(self):
        from automatic_as_built_reconstruction_tpu.models.losses import (
            prepare_loss_weights)
        labels = jnp.array([[1, 1, 0, 0, -1, 0]])
        cls_w, reg_w, cared = prepare_loss_weights(labels)
        np.testing.assert_allclose(np.asarray(reg_w).sum(), 1.0, atol=1e-6)
        assert np.asarray(cls_w)[0, 4] == 0.0  # ignored anchor
        np.testing.assert_array_equal(
            np.asarray(cared)[0], [True, True, True, True, False, True])


class TestRegistryAliases:
    def test_lineage_middle_names_build(self):
        """Every lineage SpMiddle* spelling resolves to the sparse stack."""
        from automatic_as_built_reconstruction_tpu.models.voxelnet import (
            MIDDLE_REGISTRY)
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        for name in ("SpMiddleFHD", "SpMiddleFHDV2", "SpMiddleFHDLite",
                     "SpMiddleD4HD", "SpMiddleD8HD", "SpMiddle2K",
                     "SpMiddle2KMerged"):
            assert MIDDLE_REGISTRY[name] is SparseMiddle

    def test_simple_voxel_radius_forward(self):
        cfg = tiny_cfg()
        import dataclasses
        cfg = dataclasses.replace(cfg, vfe_name="SimpleVoxelRadius")
        ex, _ = make_example(cfg)
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), ex["voxels"],
                               ex["num_points"], ex["coordinates"])
        preds = model.apply(variables, ex["voxels"], ex["num_points"],
                            ex["coordinates"])
        assert np.isfinite(np.asarray(preds["box_preds"])).all()
