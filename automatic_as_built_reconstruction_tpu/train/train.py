"""train() / evaluate() — the primary runtime entry points.

[ref: second/pytorch/train.py — lineage-expected, UNVERIFIED]

Functional jax version: one jit-compiled train step (forward + loss + grad
+ optimizer update, donated state), host input pipeline feeding static-shape
batches, orbax checkpoint/resume, jsonl + text metrics logging, in-loop
eval.
"""
from __future__ import annotations

import functools
import json
import pathlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..builder import (box_coder_builder, config_io, input_reader_builder,
                       optimizer_builder, second_builder,
                       target_assigner_builder, voxel_builder)

# Persistent XLA compilation cache: chunked training (fresh process per
# chunk, resuming from orbax — the relay leaks host RSS per dispatched
# step) re-compiles an identical train-step program every restart,
# ~5-10 min each through the relay.  The disk cache hands it back in
# seconds (verified working for bench.py's programs: .jax_cache).
try:
    _cache_dir = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    _cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
from ..data import batching
from ..models import voxelnet as voxelnet_mod
from . import checkpoint as ckpt_mod
from . import metrics as metrics_mod


class Bundle:
    """Everything built from one config file."""

    def __init__(self, config_path):
        self.config = config_io.load_config(config_path)
        m = self.config.model.second
        self.model_proto = m
        self.voxel_generator = voxel_builder.build(m.voxel_generator)
        self.box_coder = box_coder_builder.build(m.box_coder)
        self.target_assigner = target_assigner_builder.build(
            m.target_assigner, self.box_coder)
        self.model, self.model_cfg, self.feature_map_size = (
            second_builder.build(m, self.voxel_generator,
                                 self.target_assigner))
        if self.config.train_config.enable_mixed_precision:
            import dataclasses as _dc
            self.model_cfg = _dc.replace(self.model_cfg,
                                         compute_dtype="bfloat16")
            from ..models.voxelnet import VoxelNet as _VN
            self.model = _VN(cfg=self.model_cfg)

    def input_reader(self, training: bool, seed: int = 0):
        reader_cfg = (self.config.train_input_reader if training
                      else self.config.eval_input_reader)
        v_cap = (int(reader_cfg.preprocess.max_number_of_voxels)
                 or 12000)
        plan = voxelnet_mod.middle_plan(self.model_cfg, v_cap)
        if (self.model_cfg.sparse_keymatch
                and self.model_cfg.sparse_use_pallas_gemm):
            # key-match mode joins keys inside the kernel — no host
            # rulebooks at all.  Besides the host-prep cost, each
            # dispatched rulebook batch is ~140 MB/step at honest FHD
            # capacities, which the TPU relay leaks into host RSS.
            plan = None
        out_caps = self.model_cfg.sparse_out_caps
        tail = self.model_cfg.sparse_dense_tail_blocks
        if plan is not None and tail > 0:
            # dense-tail blocks run as masked dense convs — no host
            # rulebooks needed (and none built: host prep is the
            # training bottleneck on this box)
            keep = max(len(plan) - tail, 0)
            plan = plan[:keep] or None
            if out_caps is not None:
                out_caps = out_caps[:keep] or None
        return input_reader_builder.build(
            reader_cfg, training, self.voxel_generator, self.target_assigner,
            self.feature_map_size, seed=seed, middle_plan=plan,
            capacity_shrink=self.model_cfg.sparse_capacity_shrink,
            out_caps=out_caps)


def make_mesh(num_devices: Optional[int]) -> Optional[Mesh]:
    """1-D ``data`` mesh over the first ``num_devices`` devices (or None
    for the plain single-device path)."""
    if not num_devices or num_devices <= 1:
        return None
    devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} visible")
    return Mesh(np.asarray(devices[:num_devices]), ("data",))


def _to_device(batch: Dict[str, np.ndarray],
               mesh: Optional[Mesh] = None) -> Dict[str, jnp.ndarray]:
    if mesh is None:
        return {k: _put_static(k, v) if k in _STATIC_BATCH_KEYS
                else jnp.asarray(v) for k, v in batch.items()}
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(np.asarray(v), sh) for k, v in batch.items()}


# Keys whose value is a run constant (the anchor grid comes from the
# input reader's anchor_cache — identical rows every step).  Shipping
# them per step costs ~2 MB/example of H2D transfer AND, through the
# axon relay, leaks those bytes into host RSS every step (the r4b
# steps/s decay).  The cache holds the host copy too and re-verifies
# with an EXACT array_equal every step (~1-2 ms SIMD memcmp for the
# 6 MB anchors batch) — a sampled checksum could silently alias a
# legitimately changed array onto the stale device buffer.
_STATIC_BATCH_KEYS = ("anchors",)
_STATIC_DEVICE_CACHE: Dict = {}


def _put_static(key, value):
    v = np.asarray(value)
    hit = _STATIC_DEVICE_CACHE.get(key)
    if (hit is not None and hit[0].shape == v.shape
            and hit[0].dtype == v.dtype and np.array_equal(hit[0], v)):
        return hit[1]
    arr = jnp.asarray(v)
    _STATIC_DEVICE_CACHE[key] = (np.array(v, copy=True), arr)
    return arr


def init_state(bundle: Bundle, rng_seed: int = 0, example=None,
               total_steps: int | None = None):
    """Initialize {params, batch_stats, opt_state, step} from one example."""
    model = bundle.model
    if example is None:
        V, T = 64, bundle.voxel_generator.max_num_points
        C = int(bundle.model_proto.num_point_features) or 4
        example = {
            "voxels": jnp.zeros((1, V, T, C), jnp.float32),
            "num_points": jnp.zeros((1, V), jnp.int32),
            "coordinates": jnp.full((1, V, 3), -1, jnp.int32),
        }
    variables = model.init(jax.random.key(rng_seed), example["voxels"],
                           example["num_points"], example["coordinates"],
                           train=True)
    if total_steps is None:
        total_steps = int(bundle.config.train_config.steps) or 100000
    tx = optimizer_builder.build(bundle.config.train_config.optimizer,
                                 total_steps)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": tx.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }
    return state, tx


def _middle_rulebooks(example, cfg):
    """Pull host-precomputed rulebooks (rb* keys) out of an example.

    The block count comes from the keys actually present — with
    ``sparse_dense_tail_blocks`` the host pipeline only builds books for
    the leading sparse blocks."""
    from ..ops import rulebook_host
    _, rb_flat = rulebook_host.split_example(example)
    if not rb_flat:
        return None
    n = sum(1 for k in rb_flat if k.endswith("_out_valid"))
    return rulebook_host.unflatten(
        rb_flat, min(n, voxelnet_mod.num_middle_blocks(cfg)))


def make_train_step(bundle: Bundle, tx, mesh: Optional[Mesh] = None):
    """Jit-compiled train step; with ``mesh`` it is data-parallel over the
    ``data`` axis (batch-sharded example, replicated state, XLA-inserted
    psum for the grads — the trainer-integrated DP path the reference
    never had [ref: SURVEY.md §2.8])."""
    model, cfg = bundle.model, bundle.model_cfg

    jit_kwargs = dict(donate_argnums=(0,))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jit_kwargs.update(in_shardings=(repl, data), out_shardings=(repl, repl))

    @functools.partial(jax.jit, **jit_kwargs)
    def train_step(state, example):
        books = _middle_rulebooks(example, cfg)

        def loss_fn(params):
            preds, mut = model.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                example["voxels"], example["num_points"],
                example["coordinates"], train=True,
                middle_rulebooks=books,
                mutable=["batch_stats", "intermediates"])
            loss, metrics = voxelnet_mod.compute_loss(preds, example, cfg)
            # sparse-middle capacity-overflow telemetry (middle.py sows
            # one saturation count per strided block)
            sat = [v for p, v in jax.tree_util.tree_leaves_with_path(
                mut.get("intermediates", {}))
                   if "capacity_saturated" in jax.tree_util.keystr(p)]
            if sat:
                metrics["mid_capacity_saturated"] = sum(
                    jnp.sum(s) for s in sat)
            flat = voxelnet_mod._flatten_preds(preds, cfg)
            pr = metrics_mod.precision_recall_counts(
                jax.lax.stop_gradient(flat["cls_preds"]),
                example["labels"])
            return loss, (metrics, mut["batch_stats"], pr)

        (loss, (metrics, new_bs, pr_counts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = clip_by_global_norm(grads, 10.0)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params, "batch_stats": new_bs,
            "opt_state": opt_state, "step": state["step"] + 1,
        }
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["num_pos"] = (example["labels"] > 0).sum()
        # thresholded PR counts of the cls head, accumulated host-side
        # (the reference logs PrecisionRecall during training [ref:
        # torchplus/metrics.py via second/pytorch/train.py])
        metrics["pr"] = pr_counts
        return new_state, metrics

    return train_step


def clip_by_global_norm(grads, max_norm: float):
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree.map(lambda g: g * scale, grads)


def make_stage_timer_fns(bundle: Bundle):
    """Per-stage jit programs for the reference-style ``--measure_time``
    breakdown (vfe / middle / rpn / predict ms).  Each program returns
    only its stage's output reduced to a scalar, so XLA dead-code-
    eliminates everything after it; successive differences give per-stage
    device time [ref: second/pytorch/train.py --measure_time wraps
    net-internal stage timers]."""
    model, cfg = bundle.model, bundle.model_cfg

    def run(params, batch_stats, example, which):
        books = _middle_rulebooks(example, cfg)
        preds, stages = model.apply(
            {"params": params, "batch_stats": batch_stats},
            example["voxels"], example["num_points"],
            example["coordinates"], train=False, middle_rulebooks=books,
            return_stages=True)
        if which == "vfe":
            out = stages["voxel_features"]
        elif which == "middle":
            out = stages["spatial_features"]
        elif which == "rpn":
            return sum(jnp.sum(v) for v in preds.values())
        else:  # predict
            det = voxelnet_mod.predict(
                preds, example["anchors"], cfg,
                anchors_mask=example.get("anchors_mask"))
            return sum(jnp.sum(v.astype(jnp.float32)) for v in det.values())
        return jnp.sum(out.astype(jnp.float32))

    return {w: jax.jit(functools.partial(run, which=w))
            for w in ("vfe", "middle", "rpn", "predict")}


def make_predict_fn(bundle: Bundle, mesh: Optional[Mesh] = None):
    model, cfg = bundle.model, bundle.model_cfg

    jit_kwargs = {}
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jit_kwargs.update(in_shardings=(repl, repl, data),
                          out_shardings=data)

    @functools.partial(jax.jit, **jit_kwargs)
    def predict_fn(params, batch_stats, example):
        books = _middle_rulebooks(example, cfg)
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            example["voxels"], example["num_points"],
            example["coordinates"], train=False,
            middle_rulebooks=books)
        return voxelnet_mod.predict(
            preds, example["anchors"], cfg,
            anchors_mask=example.get("anchors_mask"))

    return predict_fn


class MetricsLogger:
    """log.txt + metrics.jsonl + tensorboard scalars under
    ``<model_dir>/summary`` (the reference's summary dir [ref:
    second/pytorch/train.py tensorboard logging — lineage-expected])."""

    def __init__(self, model_dir: pathlib.Path):
        model_dir.mkdir(parents=True, exist_ok=True)
        self._log = open(model_dir / "log.txt", "a")
        self._jsonl = open(model_dir / "metrics.jsonl", "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=str(model_dir / "summary"))
        except Exception:
            pass   # tensorboard optional; jsonl always written

    def log(self, step: int, metrics: Dict[str, float], prefix="train"):
        metrics = {k: float(v) for k, v in metrics.items()}
        line = (f"step={step} " +
                " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())))
        print(f"[{prefix}] {line}", flush=True)
        self._log.write(f"[{prefix}] {line}\n")
        self._log.flush()
        self._jsonl.write(json.dumps(
            {"step": step, "prefix": prefix, **metrics}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
            self._tb.flush()

    def text(self, s: str):
        print(s, flush=True)
        self._log.write(s + "\n")
        self._log.flush()


class CapacitySaturationError(RuntimeError):
    """Sparse-middle static capacities are truncating active sites —
    training would silently converge to garbage (the round-3 failure
    mode: 2500 steps at AP 0.00)."""


def train(config_path, model_dir, *, resume: bool = True,
          max_steps: Optional[int] = None, display_step: int = 50,
          seed: int = 0, num_devices: Optional[int] = None,
          profile_steps: int = 0, saturation_abort_windows: int = 3):
    """Full training loop with checkpoint/resume and in-loop eval.

    ``num_devices > 1`` trains data-parallel over a 1-D device mesh:
    batch-sharded inputs, replicated state, XLA collectives over ICI.
    The global batch (``train_input_reader.batch_size``) must divide by
    ``num_devices``; loss and updates match the single-device program.
    ``profile_steps > 0`` captures a jax.profiler trace of that many steps
    (skipping compilation) to ``<model_dir>/profile`` for
    tensorboard-plugin-profile.

    ``saturation_abort_windows``: abort with CapacitySaturationError when
    the ``mid_capacity_saturated`` telemetry stays > 0 for this many
    consecutive display windows — static sparse-middle capacities are
    dropping active sites and every further step is wasted.  Fix by
    sizing ``middle_feature_extractor.out_site_caps`` from the data with
    ``ops.sparse_conv.measure_site_caps``.  0 disables the guard.
    """
    model_dir = pathlib.Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    bundle = Bundle(config_path)
    config_io.save_config(bundle.config, model_dir / "pipeline.config")
    logger = MetricsLogger(model_dir)
    mesh = make_mesh(num_devices)
    if mesh is not None:
        bs = int(bundle.config.train_input_reader.batch_size) or 1
        if bs % mesh.size:
            raise ValueError(f"batch_size {bs} not divisible by "
                             f"num_devices {mesh.size}")
        logger.text(f"data-parallel training over {mesh.size} devices")

    _, loader = bundle.input_reader(training=True, seed=seed)
    total_steps = max_steps or int(bundle.config.train_config.steps) or 1000
    state, tx = init_state(bundle, rng_seed=seed, total_steps=total_steps)
    if not resume:
        import shutil
        shutil.rmtree(model_dir / "checkpoints", ignore_errors=True)
    mgr = ckpt_mod.CheckpointManager(model_dir)
    start_step = 0
    if resume:
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state, latest)
            start_step = int(latest)
            logger.text(f"resumed from checkpoint at step {start_step}")
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))

    train_step = make_train_step(bundle, tx, mesh=mesh)
    save_secs = int(bundle.config.train_config.save_checkpoints_secs) or 1800
    steps_per_eval = int(bundle.config.train_config.steps_per_eval) or 0

    step = start_step
    last_save = time.time()
    window: Dict[str, list] = {}
    pr = metrics_mod.PrecisionRecall()
    t_window = time.time()
    sat_windows = 0
    try:
        for batch in loader:
            if step >= total_steps:
                break
            example = _to_device(batching.device_example(batch), mesh)
            if profile_steps and step == start_step + 2:   # post-compile
                jax.profiler.start_trace(str(model_dir / "profile"))
            state, metrics = train_step(state, example)
            step += 1
            if profile_steps and step == start_step + 2 + profile_steps:
                jax.tree.map(lambda x: x.block_until_ready(), state)
                jax.profiler.stop_trace()
                logger.text(f"profile trace written to "
                            f"{model_dir / 'profile'}")
                profile_steps = 0
            # keep metrics as device arrays: a float()/device_get here
            # would sync every step, serializing host dispatch with the
            # device (expensive over a high-latency PJRT relay). All
            # transfers happen once per display window.
            window.setdefault("pr", []).append(metrics.pop("pr"))
            for k, v in metrics.items():
                window.setdefault(k, []).append(v)
            if step % display_step == 0:
                host = jax.device_get(window)
                for p in host.pop("pr"):
                    pr.update(p)
                avg = {k: float(np.mean([float(x) for x in v]))
                       for k, v in host.items()}
                avg["steps_per_sec"] = (
                    display_step / max(time.time() - t_window, 1e-9))
                logger.log(step, avg)
                logger.text(f"[train] step={step} {pr.summary()}")
                pr.clear()
                window.clear()
                t_window = time.time()
                if avg.get("mid_capacity_saturated", 0.0) > 0:
                    sat_windows += 1
                    logger.text(
                        f"WARNING: mid_capacity_saturated="
                        f"{avg['mid_capacity_saturated']:.1f} — sparse "
                        f"middle is TRUNCATING active sites "
                        f"({sat_windows}/{saturation_abort_windows} "
                        f"consecutive windows before abort)")
                    if (saturation_abort_windows
                            and sat_windows >= saturation_abort_windows):
                        mgr.save(step, jax.device_get(state), force=True)
                        raise CapacitySaturationError(
                            "mid_capacity_saturated > 0 for "
                            f"{sat_windows} consecutive display windows: "
                            "the sparse middle's static out_site_caps are "
                            "too small and active sites are being dropped "
                            "(training would silently fail, see round-3 "
                            "AP-0.00 rehearsal). Size "
                            "model.second.middle_feature_extractor."
                            "out_site_caps from your data with "
                            "automatic_as_built_reconstruction_tpu.ops."
                            "sparse_conv.measure_site_caps, or clear it "
                            "for the expansion-aware heuristic.")
                else:
                    sat_windows = 0
            if time.time() - last_save > save_secs:
                mgr.save(step, jax.device_get(state))
                last_save = time.time()
            if steps_per_eval and step % steps_per_eval == 0:
                mgr.save(step, jax.device_get(state))
                result = evaluate(config_path, model_dir, bundle=bundle,
                                  state=state)
                if "result_str" in result:
                    logger.text(result["result_str"])
                else:
                    logger.log(step, {k: v for k, v in result.items()
                                      if isinstance(v, (int, float))},
                               prefix="eval")
    finally:
        try:
            mgr.save(step, jax.device_get(state), force=True)
        except Exception as e:   # e.g. StepAlreadyExistsError on a no-op run
            logger.text(f"final checkpoint save skipped: {e}")
        mgr.close()
    logger.text(f"training finished at step {step}")
    return state


def evaluate(config_path, model_dir, *, ckpt_step: Optional[int] = None,
             bundle: Optional[Bundle] = None, state=None,
             output_dir=None, measure_time: bool = False,
             num_devices: Optional[int] = None):
    """Run eval split through predict + the dataset's official eval.

    ``measure_time`` reports per-stage wall time (host prep+feed, device
    network+predict, host convert) like the reference's ``--measure_time``
    [ref: second/pytorch/train.py].  ``num_devices > 1`` batch-shards
    inference over a 1-D device mesh.
    """
    bundle = bundle or Bundle(config_path)
    prep_ds, loader = bundle.input_reader(training=False)
    mesh = make_mesh(num_devices)
    if state is None:
        state, _ = init_state(bundle)
        restored, step = ckpt_mod.try_restore_latest(model_dir, state)
        if restored is not None:
            state = restored
            print(f"evaluating checkpoint at step {step}")
        else:
            print("WARNING: no checkpoint found; evaluating random weights")
    if mesh is not None:
        state = jax.device_put(jax.device_get(state),
                               NamedSharding(mesh, P()))
    predict_fn = make_predict_fn(bundle, mesh=mesh)

    timers = {"host_feed": 0.0, "device": 0.0, "convert": 0.0}
    detections = []
    nb = 0
    t0 = time.perf_counter()
    for batch in loader:
        example = _to_device(batching.device_example(batch), mesh)
        t1 = time.perf_counter()
        out = predict_fn(state["params"], state["batch_stats"], example)
        out = jax.device_get(out)
        t2 = time.perf_counter()
        for b in range(out["box3d_lidar"].shape[0]):
            valid = out["valid"][b]
            detections.append({
                "box3d_lidar": out["box3d_lidar"][b][valid],
                "scores": out["scores"][b][valid],
                "label_preds": out["label_preds"][b][valid],
                "metadata": batch["metadata"][b],
            })
        t3 = time.perf_counter()
        timers["host_feed"] += t1 - t0
        timers["device"] += t2 - t1
        timers["convert"] += t3 - t2
        nb += 1
        t0 = time.perf_counter()
    if measure_time and nb:
        for k, v in timers.items():
            print(f"[measure_time] {k}: {v / nb * 1000:.1f} ms/batch "
                  f"(first batch includes compile)")
        # reference-style per-stage breakdown (vfe/middle/rpn/predict) on
        # one batch: cumulative-prefix programs, successive differences
        stage_fns = make_stage_timer_fns(bundle)
        cum = {}
        for name, fn in stage_fns.items():
            float(fn(state["params"], state["batch_stats"], example))
            t0 = time.perf_counter()
            for _ in range(3):
                float(fn(state["params"], state["batch_stats"], example))
            cum[name] = (time.perf_counter() - t0) / 3
        prev = 0.0
        for name in ("vfe", "middle", "rpn", "predict"):
            ms = max(cum[name] - prev, 0.0) * 1000
            print(f"[measure_time] stage {name}: {ms:.1f} ms/batch")
            prev = cum[name]
    dataset = prep_ds.dataset
    n = min(len(detections), len(dataset))
    refine_cls = bundle.model_cfg.yaw_point_refine_classes
    if refine_cls:
        # post-NMS point-evidence pose refinement (host-side): snap thin
        # planar detections onto the scene's supporting point plane.
        # Detections are in dataset order (sequential eval loader) —
        # the same assumption dataset.evaluation makes below.
        from ..core import point_refine
        for i in range(n):
            pts = np.asarray(
                dataset.get_sensor_data(i)["lidar"]["points"])
            detections[i] = point_refine.refine_detections(
                detections[i], pts, classes=refine_cls,
                recenter=bundle.model_cfg.yaw_point_refine_recenter,
                trim_length=bundle.model_cfg.yaw_point_refine_trim)
    result = dataset.evaluation(detections[:n], output_dir=output_dir)
    return result


def import_torch_weights(config_path, model_dir, torch_ckpt, *,
                         strict: bool = True):
    """Convert a lineage torch checkpoint (``voxelnet-*.tckpt`` /
    ``.pt`` state_dict) into this trainer's orbax checkpoint at step 0.

    After this, ``evaluate(config_path, model_dir)`` runs inference with
    the reference-trained weights, and ``train(..., resume=True)``
    fine-tunes from them — the switch path for a reference user
    [ref: torchplus/train/checkpoint.py restore — lineage-expected].
    """
    from ..utils import weight_import as wi

    model_dir = pathlib.Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    bundle = Bundle(config_path)
    config_io.save_config(bundle.config, model_dir / "pipeline.config")
    state, _ = init_state(bundle)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    imported = wi.load_torch_checkpoint(torch_ckpt, variables,
                                        strict=strict)
    state = dict(state, params=imported["params"],
                 batch_stats=imported["batch_stats"])
    mgr = ckpt_mod.CheckpointManager(model_dir)
    mgr.save(0, state, force=True)
    mgr.close()
    return state
