import numpy as np

from automatic_as_built_reconstruction_tpu.core import (
    anchors as anchors_mod,
    box_coders,
    box_ops,
    region_similarity,
    target_assign,
)


def simple_scene():
    """Anchors on a small grid + two gt cars sitting exactly on anchors."""
    gen = anchors_mod.AnchorGeneratorRange(
        anchor_ranges=(0, -8, -1.0, 16, 8, -1.0),
        sizes=((1.6, 3.9, 1.56),), rotations=(0.0, np.pi / 2),
        match_threshold=0.6, unmatch_threshold=0.45)
    anchors = gen.generate((1, 8, 16)).reshape(-1, 7)
    # pick two anchors as gt (perfect matches)
    gt = anchors[[10, 101]].copy()
    return anchors, gt


class TestCreateTargets:
    def test_perfect_match(self):
        anchors, gt = simple_scene()
        sim = region_similarity.NearestIouSimilarity()
        coder = box_coders.GroundBox3dCoder()
        res = target_assign.create_targets(
            anchors, gt, sim.compare, coder.encode,
            gt_classes=np.array([1, 1]),
            matched_threshold=0.6, unmatched_threshold=0.45)
        labels = res["labels"]
        assert labels[10] == 1 and labels[101] == 1
        # most anchors are background; a few near the gts may sit in the
        # [unmatched, matched) ignore band
        assert (labels == 0).sum() > 0.9 * len(labels)
        # residuals of exact matches are zero
        np.testing.assert_allclose(res["bbox_targets"][10], 0.0, atol=1e-6)
        assert res["assigned_gt_inds"][10] == 0
        assert res["assigned_gt_inds"][101] == 1

    def test_force_match_low_iou(self):
        anchors, _ = simple_scene()
        # a gt that overlaps nothing well still force-matches its best anchor
        gt = np.array([[3.3, 1.1, -1.0, 0.9, 1.2, 1.0, 0.3]])
        sim = region_similarity.NearestIouSimilarity()
        coder = box_coders.GroundBox3dCoder()
        res = target_assign.create_targets(
            anchors, gt, sim.compare, coder.encode,
            matched_threshold=0.6, unmatched_threshold=0.45)
        assert (res["labels"] > 0).sum() >= 1

    def test_no_gt_all_background(self):
        anchors, _ = simple_scene()
        sim = region_similarity.NearestIouSimilarity()
        coder = box_coders.GroundBox3dCoder()
        res = target_assign.create_targets(
            anchors, np.zeros((0, 7)), sim.compare, coder.encode)
        assert (res["labels"] == 0).all()

    def test_anchor_mask(self):
        anchors, gt = simple_scene()
        mask = np.zeros(len(anchors), bool)
        mask[:50] = True  # gt at anchor 101 excluded from matching
        sim = region_similarity.NearestIouSimilarity()
        coder = box_coders.GroundBox3dCoder()
        res = target_assign.create_targets(
            anchors, gt, sim.compare, coder.encode,
            gt_classes=np.array([1, 1]), anchor_mask=mask,
            matched_threshold=0.6, unmatched_threshold=0.45)
        assert res["labels"][10] == 1
        assert res["labels"][101] == -1
        assert (res["labels"][~mask] == -1).all()

    def test_ignore_band(self):
        # anchor with IoU between unmatched and matched must be ignored
        anchors = np.array([[0.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.0]])
        gt = np.array([[0.0, 1.1, -1.0, 1.6, 3.9, 1.56, 0.0]])
        bev_a = anchors[:, [0, 1, 3, 4, 6]]
        bev_g = gt[:, [0, 1, 3, 4, 6]]
        iou = region_similarity.NearestIouSimilarity().compare(bev_a, bev_g)[0, 0]
        assert 0.2 < iou < 0.8
        coder = box_coders.GroundBox3dCoder()
        res = target_assign.create_targets(
            anchors, gt, region_similarity.NearestIouSimilarity().compare,
            coder.encode, matched_threshold=iou + 0.05,
            unmatched_threshold=iou - 0.05)
        # force match wins: the single anchor is this gt's best anchor
        assert res["labels"][0] == 1

    def test_multiclass_assigner(self):
        gen_car = anchors_mod.AnchorGeneratorRange(
            anchor_ranges=(0, -8, -1.0, 16, 8, -1.0),
            sizes=((1.6, 3.9, 1.56),), class_name="Car")
        gen_ped = anchors_mod.AnchorGeneratorRange(
            anchor_ranges=(0, -8, -0.6, 16, 8, -0.6),
            sizes=((0.6, 0.8, 1.73),), class_name="Pedestrian",
            match_threshold=0.5, unmatch_threshold=0.35)
        assigner = target_assign.TargetAssigner(
            box_coder=box_coders.GroundBox3dCoder(),
            anchor_generators=[gen_car, gen_ped],
            classes=["Car", "Pedestrian"])
        ret = assigner.generate_anchors((1, 8, 16))
        anchors = ret["anchors"]
        assert anchors.shape == (8 * 16 * 4, 7)
        assert assigner.num_anchors_per_location == 4
        # thresholds follow per-location interleave [car, car, ped, ped]
        np.testing.assert_allclose(ret["matched_thresholds"][:4],
                                   [0.6, 0.6, 0.5, 0.5])
        gt = anchors[[0]]  # a car anchor
        res = assigner.assign(anchors, gt, gt_classes=np.array([1]),
                              matched_thresholds=ret["matched_thresholds"],
                              unmatched_thresholds=ret["unmatched_thresholds"])
        assert res["labels"][0] == 1
