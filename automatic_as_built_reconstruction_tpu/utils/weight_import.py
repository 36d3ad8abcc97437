"""Torch-checkpoint interop: import lineage ``second.pytorch`` weights
into a :class:`VoxelNet` variables tree, and export ours back out.

A user switching from the reference brings a torch ``state_dict`` whose
module names follow the lineage net
(``voxel_feature_extractor.* / middle_feature_extractor.middle_conv.* /
rpn.{blocks,deblocks,conv_cls,conv_box,conv_dir_cls}.*``
[ref: second/pytorch/models/voxelnet.py + rpn.py — lineage-expected,
UNVERIFIED: reference mount empty, SURVEY.md §0]).  Because round 3's
``models/middle_plans.py`` reproduces the lineage layer stacks exactly,
the correspondence is positional: the n-th conv/BN of each lineage
Sequential maps to the n-th conv/BN of the matching flax scope.

Layout conversions (verified numerically against torch on CPU —
``tests/test_weight_import.py``):

==============================  =======================================
torch                           flax
==============================  =======================================
Conv2d    ``(O, I, kh, kw)``    ``(kh, kw, I, O)`` — transpose(2,3,1,0)
ConvT2d   ``(I, O, kh, kw)``    ``flip(transpose(2,3,0,1), (0,1))``
                                (flax ``transpose_kernel=False``)
Linear    ``(O, I)``            ``(I, O)``
BatchNorm weight/bias           scale/bias (+ running_* -> batch_stats)
spconv    ``(kz,ky,kx, I, O)``  ``(K, I, O)`` — reshape (spconv 1.x)
          ``(O, kz,ky,kx, I)``  transpose(1,2,3,4,0) then reshape (2.x)
==============================  =======================================

The sparse-conv tap order matches directly: both spconv and
``ops/sparse_conv._offsets`` enumerate kernel taps in z-major raster
order with cross-correlation semantics.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "from_torch_state_dict",
    "to_torch_state_dict",
    "load_torch_checkpoint",
]

_BN_SUFFIXES = ("weight", "bias", "running_mean", "running_var")


def _natkey(name: str):
    return [int(t) if t.isdigit() else t
            for t in re.split(r"(\d+)", name)]


def _seq_index(key: str, prefix: str) -> int:
    """``prefix.{j}.rest`` -> j (torch Sequential position)."""
    rest = key[len(prefix):].lstrip(".")
    return int(rest.split(".")[0])


class _Slot:
    """One correspondence: a torch key-base <-> a flax leaf path."""

    def __init__(self, kind: str, torch_base: str,
                 param_path: Tuple[str, ...],
                 bn_stats_path: Optional[Tuple[str, ...]] = None,
                 kernel_dhw: Optional[Tuple[int, int, int]] = None):
        self.kind = kind                  # conv2d|deconv2d|linear|bn|spconv
        self.torch_base = torch_base
        self.param_path = param_path      # path under variables['params']
        self.bn_stats_path = bn_stats_path
        self.kernel_dhw = kernel_dhw      # spconv export factorization


def _get(tree: Dict[str, Any], path: Sequence[str]):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: Dict[str, Any], path: Sequence[str], leaf):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = leaf


def _children(tree: Dict[str, Any], pattern: str) -> List[str]:
    rx = re.compile(pattern)
    return sorted((k for k in tree if rx.fullmatch(k)), key=_natkey)


def _infer_kernel_dhw(k: int) -> Tuple[int, int, int]:
    """Factor a flattened tap count into (kz, ky, kx) for export.

    Covers every kernel the lineage middles use (SURVEY §2.4): 3x3x3
    subm/strided convs, the (3,1,1) z-collapse, and 1x1x1.  Ambiguous
    counts (e.g. 9) need an explicit ``kernel_dhw`` on the slot.
    """
    return {27: (3, 3, 3), 3: (3, 1, 1), 1: (1, 1, 1)}.get(
        k, (k, 1, 1))


def _build_spec(variables: Dict[str, Any],
                middle_kernels: Optional[Sequence[Tuple[int, int, int]]]
                = None) -> List[_Slot]:
    """Positional correspondence spec from the variables tree alone."""
    params = variables["params"]
    slots: List[_Slot] = []

    def bn(torch_base: str, ppath: Tuple[str, ...]):
        slots.append(_Slot("bn", torch_base, ppath,
                           bn_stats_path=ppath))

    # --- VFE ------------------------------------------------------------
    for scope in _children(params, r"PillarFeatureNet_\d+"):
        for i, layer in enumerate(
                _children(params[scope], r"PFNLayer_\d+")):
            base = f"voxel_feature_extractor.pfn_layers.{i}"
            slots.append(_Slot(
                "linear", f"{base}.linear",
                (scope, layer, "Dense_0", "kernel")))
            bn(f"{base}.norm", (scope, layer, "BatchNorm_0"))
    for scope in _children(params, r"VoxelFeatureExtractor(V2)?_\d+"):
        vfes = _children(params[scope], r"VFELayer_\d+")
        for i, layer in enumerate(vfes):
            base = f"voxel_feature_extractor.vfe{i + 1}"
            slots.append(_Slot(
                "linear", f"{base}.linear",
                (scope, layer, "Dense_0", "kernel")))
            bn(f"{base}.norm", (scope, layer, "BatchNorm_0"))
        if "Dense_0" in params[scope]:   # trailing FC (+BN) — V1 only
            slots.append(_Slot(
                "linear", "voxel_feature_extractor.linear",
                (scope, "Dense_0", "kernel")))
        if "BatchNorm_0" in params[scope]:
            bn("voxel_feature_extractor.norm", (scope, "BatchNorm_0"))

    # --- sparse middle ----------------------------------------------------
    for scope in _children(params, r"SparseMiddle_\d+"):
        conv_names = sorted(
            (k for k in params[scope]
             if re.fullmatch(r"b\d+_(subm\d+|down)_w", k)),
            key=lambda n: (_natkey(n)[1],        # block index
                           "subm" not in n,      # subm layers first
                           _natkey(n)))
        # torch Sequential indices: conv at j, BN at j+1, ReLU at j+2
        for n, w in enumerate(conv_names):
            j = 3 * n
            kd = (tuple(middle_kernels[n]) if middle_kernels is not None
                  else None)
            slots.append(_Slot(
                "spconv", f"middle_feature_extractor.middle_conv.{j}",
                (scope, w), kernel_dhw=kd))
            bn(f"middle_feature_extractor.middle_conv.{j + 1}",
               (scope, w[:-2] + "_bn"))

    # --- RPN ----------------------------------------------------------------
    for scope in _children(params, r"RPN_\d+"):
        for i, blk in enumerate(_children(params[scope], r"ConvBlock_\d+")):
            convs = _children(params[scope][blk], r"Conv_\d+")
            # lineage Sequential: [ZeroPad2d, Conv, BN, ReLU] + n*(Conv,
            # BN, ReLU) -> conv j: 1, 4, 7, ...; BN j+1
            for n, c in enumerate(convs):
                j = 1 + 3 * n
                slots.append(_Slot(
                    "conv2d", f"rpn.blocks.{i}.{j}",
                    (scope, blk, c, "kernel")))
                bn(f"rpn.blocks.{i}.{j + 1}",
                   (scope, blk, f"BatchNorm_{n}"))
        for i, up in enumerate(_children(params[scope], r"Upsample_\d+")):
            kind = ("deconv2d" if "ConvTranspose_0" in params[scope][up]
                    else "conv2d")   # fractional stride -> plain conv
            mod = ("ConvTranspose_0" if kind == "deconv2d" else "Conv_0")
            slots.append(_Slot(
                kind, f"rpn.deblocks.{i}.0",
                (scope, up, mod, "kernel")))
            bn(f"rpn.deblocks.{i}.1", (scope, up, "BatchNorm_0"))
        for head in ("conv_cls", "conv_box", "conv_dir_cls"):
            if head in params[scope]:
                slots.append(_Slot(
                    "conv2d", f"rpn.{head}",
                    (scope, head, "kernel")))
                slots.append(_Slot(
                    "bias", f"rpn.{head}",
                    (scope, head, "bias")))
    return slots


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _import_spconv(w: np.ndarray, out_shape: Tuple[int, ...]) -> np.ndarray:
    K, I, O = out_shape
    if w.ndim != 5:
        raise ValueError(f"spconv weight must be 5D, got {w.shape}")
    if int(np.prod(w.shape[:3])) == K and w.shape[3:] == (I, O):
        return w.reshape(K, I, O)                     # spconv 1.x KKKIO
    if w.shape[0] == O and int(np.prod(w.shape[1:4])) == K \
            and w.shape[4] == I:
        return w.transpose(1, 2, 3, 4, 0).reshape(K, I, O)   # 2.x OKKKI
    raise ValueError(
        f"spconv weight {w.shape} matches neither (k,k,k,{I},{O}) "
        f"nor ({O},k,k,k,{I}) with prod(k)={K}")


def from_torch_state_dict(state_dict: Dict[str, Any],
                          variables: Dict[str, Any],
                          middle_kernels: Optional[
                              Sequence[Tuple[int, int, int]]] = None,
                          strict: bool = True) -> Dict[str, Any]:
    """Map a lineage torch ``state_dict`` onto ``variables``.

    Args:
        state_dict: torch name -> tensor/ndarray.
        variables: ``model.init(...)`` output (shapes define the spec).
        middle_kernels: optional per-conv (kz, ky, kx) for the sparse
            middle (only needed for export or odd kernels).
        strict: raise if any spec slot is missing from ``state_dict``;
            unknown extra torch keys are always reported in the error.

    Returns a NEW variables dict (same structure, imported leaves).
    """
    import jax

    sd = {k: _to_np(v) for k, v in state_dict.items()}
    new = jax.tree_util.tree_map(np.asarray, variables)
    slots = _build_spec(new, middle_kernels)
    used, missing = set(), []

    for s in slots:
        if s.kind == "bn":
            keys = [f"{s.torch_base}.{suf}" for suf in _BN_SUFFIXES]
            if any(k not in sd for k in keys):
                missing.extend(k for k in keys if k not in sd)
                continue
            used.update(keys)
            p = _get(new["params"], s.param_path)
            p["scale"] = sd[keys[0]].astype(p["scale"].dtype)
            p["bias"] = sd[keys[1]].astype(p["bias"].dtype)
            st = _get(new["batch_stats"], s.bn_stats_path)
            st["mean"] = sd[keys[2]].astype(st["mean"].dtype)
            st["var"] = sd[keys[3]].astype(st["var"].dtype)
            continue
        key = (f"{s.torch_base}.bias" if s.kind == "bias"
               else f"{s.torch_base}.weight")
        if key not in sd:
            missing.append(key)
            continue
        used.add(key)
        w = sd[key]
        cur = _get(new["params"], s.param_path)
        if s.kind == "conv2d":
            w = w.transpose(2, 3, 1, 0)
        elif s.kind == "deconv2d":
            w = np.flip(w.transpose(2, 3, 0, 1), (0, 1))
        elif s.kind == "linear":
            w = w.T
        elif s.kind == "spconv":
            w = _import_spconv(w, cur.shape)
        if w.shape != cur.shape:
            raise ValueError(
                f"{key}: converted shape {w.shape} != expected "
                f"{cur.shape} at params/{'/'.join(s.param_path)}")
        _set(new["params"], s.param_path, w.astype(cur.dtype))

    if strict and missing:
        extra = sorted(set(sd) - used)
        raise KeyError(
            f"state_dict missing {len(missing)} expected keys "
            f"(first: {missing[:4]}); unmatched torch keys: {extra[:4]}")
    return new


def to_torch_state_dict(variables: Dict[str, Any],
                        middle_kernels: Optional[
                            Sequence[Tuple[int, int, int]]] = None
                        ) -> Dict[str, np.ndarray]:
    """Export ``variables`` as a lineage-named torch-style state_dict
    (numpy values; spconv weights in 1.x ``(kz,ky,kx,I,O)`` layout)."""
    import jax

    tree = jax.tree_util.tree_map(np.asarray, variables)
    slots = _build_spec(tree, middle_kernels)
    out: Dict[str, np.ndarray] = {}
    for s in slots:
        if s.kind == "bn":
            p = _get(tree["params"], s.param_path)
            st = _get(tree["batch_stats"], s.bn_stats_path)
            out[f"{s.torch_base}.weight"] = p["scale"]
            out[f"{s.torch_base}.bias"] = p["bias"]
            out[f"{s.torch_base}.running_mean"] = st["mean"]
            out[f"{s.torch_base}.running_var"] = st["var"]
            continue
        w = _get(tree["params"], s.param_path)
        if s.kind == "conv2d":
            w = w.transpose(3, 2, 0, 1)
        elif s.kind == "deconv2d":
            w = np.flip(w, (0, 1)).transpose(2, 3, 0, 1)
        elif s.kind == "linear":
            w = w.T
        elif s.kind == "spconv":
            K, I, O = w.shape
            kd = s.kernel_dhw or _infer_kernel_dhw(K)
            if int(np.prod(kd)) != K:
                raise ValueError(f"kernel_dhw {kd} != tap count {K}")
            w = w.reshape(*kd, I, O)
        name = f"{s.torch_base}.bias" if s.kind == "bias" \
            else f"{s.torch_base}.weight"
        out[name] = np.asarray(w)
    return out


def load_torch_checkpoint(path, variables: Dict[str, Any],
                          middle_kernels=None,
                          strict: bool = True) -> Dict[str, Any]:
    """``torch.load`` a lineage ``.tckpt`` / ``.pt`` file and import it."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return from_torch_state_dict(obj, variables, middle_kernels,
                                 strict=strict)
