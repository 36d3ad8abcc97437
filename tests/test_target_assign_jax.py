"""Device target assignment (ops.target_assign_jax) vs the host numpy
oracle (core.target_assign) — labels/ids exact, encodings to fp32
tolerance, over random + adversarial (ties, empty gt, masked, padded)
cases."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.core import (  # noqa: E402
    box_coders, region_similarity, target_assign)
from automatic_as_built_reconstruction_tpu.ops import (  # noqa: E402
    target_assign_jax as taj)

SIM_BUILDERS = {
    "nearest": region_similarity.NearestIouSimilarity,
    "rotate": region_similarity.RotateIouSimilarity,
    "distance": lambda: region_similarity.DistanceSimilarity(
        distance_norm=2.0),
}


def random_anchors(rng, n=60):
    a = np.zeros((n, 7), np.float32)
    a[:, 0] = rng.uniform(0, 20, n)
    a[:, 1] = rng.uniform(0, 20, n)
    a[:, 2] = rng.uniform(-1, 0, n)
    a[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
    a[:, 6] = rng.choice([0.0, np.pi / 2], n)
    return a


def random_gt(rng, g):
    b = np.zeros((g, 7), np.float32)
    b[:, 0] = rng.uniform(0, 20, g)
    b[:, 1] = rng.uniform(0, 20, g)
    b[:, 2] = rng.uniform(-1, 0, g)
    b[:, 3:6] = rng.uniform(0.5, 4.0, (g, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, g)
    return b


def run_pair(anchors, gt, gt_classes, sim_kind, matched, unmatched,
             mask=None, gmax=None, vec_encode=False, linear_dim=False):
    coder = box_coders.GroundBox3dCoder(linear_dim=linear_dim,
                                        vec_encode=vec_encode)
    ref = target_assign.create_targets(
        anchors, gt,
        similarity_fn=SIM_BUILDERS[sim_kind]().compare,
        box_encoding_fn=coder.encode,
        gt_classes=gt_classes if len(gt) else None,
        matched_threshold=matched, unmatched_threshold=unmatched,
        box_code_size=coder.code_size, anchor_mask=mask)

    gmax = gmax or max(len(gt), 1)
    gt_pad = np.zeros((gmax, 7), np.float32)
    gt_pad[:len(gt)] = gt
    gt_valid = np.arange(gmax) < len(gt)
    cls_pad = np.ones((gmax,), np.int32)
    if gt_classes is not None and len(gt):
        cls_pad[:len(gt)] = gt_classes
    out = jax.jit(taj.create_targets_jax, static_argnames=(
        "similarity", "box_code", "vec_encode", "linear_dim"))(
        jnp.asarray(anchors), jnp.asarray(gt_pad), jnp.asarray(gt_valid),
        jnp.asarray(cls_pad), jnp.asarray(matched, jnp.float32),
        jnp.asarray(unmatched, jnp.float32), similarity=sim_kind,
        vec_encode=vec_encode, linear_dim=linear_dim,
        anchor_mask=None if mask is None else jnp.asarray(mask))
    return ref, jax.device_get(out)


def assert_match(ref, out):
    np.testing.assert_array_equal(out["labels"], ref["labels"])
    np.testing.assert_array_equal(out["assigned_gt_inds"],
                                  ref["assigned_gt_inds"])
    np.testing.assert_allclose(out["bbox_targets"], ref["bbox_targets"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out["bbox_outside_weights"],
                               ref["bbox_outside_weights"])


@pytest.mark.parametrize("sim_kind", ["nearest", "rotate", "distance"])
def test_random_parity(sim_kind):
    rng = np.random.default_rng(0)
    for trial in range(5):
        anchors = random_anchors(rng)
        gt = random_gt(rng, rng.integers(1, 8))
        cls = rng.integers(1, 4, len(gt)).astype(np.int32)
        ref, out = run_pair(anchors, gt, cls, sim_kind,
                            matched=0.5, unmatched=0.35, gmax=10)
        assert_match(ref, out)


def test_empty_gt_all_background():
    rng = np.random.default_rng(1)
    anchors = random_anchors(rng)
    ref, out = run_pair(anchors, np.zeros((0, 7), np.float32), None,
                        "nearest", 0.5, 0.35, gmax=4)
    assert (out["labels"] == 0).all()
    assert_match(ref, out)


def test_anchor_mask_parity():
    rng = np.random.default_rng(2)
    anchors = random_anchors(rng)
    gt = random_gt(rng, 5)
    mask = rng.random(len(anchors)) > 0.4
    ref, out = run_pair(anchors, gt, np.ones(5, np.int32), "nearest",
                        0.5, 0.35, mask=mask, gmax=8)
    assert_match(ref, out)
    assert (out["labels"][~mask] == -1).all()


def test_exact_tie_force_match():
    """Two identical gts -> every force-matched anchor takes the HIGHER
    gt index (numpy last-write order)."""
    anchors = np.array([[5, 5, -0.5, 2, 4, 1.6, 0]], np.float32)
    gt = np.tile(np.array([[5, 5, -0.5, 2, 4, 1.6, 0]], np.float32),
                 (2, 1))
    # matched=1.01 -> the threshold pass never fires, so the pure
    # force-match tie-break is observable (numpy last-write order)
    ref, out = run_pair(anchors, gt, np.array([1, 2], np.int32),
                        "nearest", 1.01, 0.35, gmax=4)
    assert_match(ref, out)
    assert out["assigned_gt_inds"][0] == 1   # higher index wins the tie


def test_dead_zone_stays_ignore():
    """Anchor overlap in [unmatched, matched) -> label -1."""
    anchors = np.array([[5.0, 5.0, -0.5, 2, 4, 1.6, 0]], np.float32)
    gt = np.array([[6.0, 5.0, -0.5, 2, 4, 1.6, 0]], np.float32)  # IoU=1/3
    ref, out = run_pair(anchors, gt, np.array([1], np.int32), "nearest",
                        matched=0.6, unmatched=0.2, gmax=2)
    # the gt force-matches its best anchor (the only one) -> label 1 even
    # in the dead zone: oracle-traced
    assert_match(ref, out)


@pytest.mark.parametrize("vec_encode,linear_dim", [(True, False),
                                                   (False, True)])
def test_coder_variants(vec_encode, linear_dim):
    rng = np.random.default_rng(3)
    anchors = random_anchors(rng)
    gt = random_gt(rng, 4)
    ref, out = run_pair(anchors, gt, np.ones(4, np.int32), "nearest",
                        0.5, 0.35, gmax=6, vec_encode=vec_encode,
                        linear_dim=linear_dim)
    assert_match(ref, out)


def test_vmaps_over_batch():
    rng = np.random.default_rng(4)
    anchors = random_anchors(rng, 40)
    gts = np.stack([random_gt(rng, 6) for _ in range(3)])
    valid = np.ones((3, 6), bool)
    cls = np.ones((3, 6), np.int32)
    fn = jax.vmap(lambda g, v, c: taj.create_targets_jax(
        jnp.asarray(anchors), g, v, c, 0.5, 0.35))
    out = fn(jnp.asarray(gts), jnp.asarray(valid), jnp.asarray(cls))
    assert out["labels"].shape == (3, 40)
    for b in range(3):
        ref, single = run_pair(anchors, gts[b], cls[b], "nearest", 0.5,
                               0.35, gmax=6)
        np.testing.assert_array_equal(np.asarray(out["labels"][b]),
                                      ref["labels"])
