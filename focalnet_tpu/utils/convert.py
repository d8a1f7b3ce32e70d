"""Reference-checkpoint conversion: torch state-dict -> flax param pytree.

The reference ships no trained checkpoints (BASELINE.md), but this converter
is the practical parity instrument (SURVEY.md §7.2 step 4): load any
reference-trained ``.pkl`` state dict (``{'model': OrderedDict}``,
``ITS/train.py:110-113``) and map it onto the NHWC flax tree so the forward
path can be compared against recorded activations.

Layout rules:
  torch Conv2d  (O, I, kh, kw)  ->  flax Conv kernel (kh, kw, I, O)
  torch depthwise Conv2d (O, 1, kh, kw) -> flax (kh, kw, 1, O)
  torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel
      (kh, kw, I, O) with SPATIALLY FLIPPED taps (flax computes a true
      transposed conv via lhs dilation with an unflipped kernel, torch
      correlates with the flipped one; verified numerically in tests)
  torch Linear  (O, I)          ->  flax Dense kernel (I, O)
  torch LayerNorm/InstanceNorm weight -> flax scale
  raw parameter stacks (x_proj_weight, dt_projs_*, A_logs, Ds): unchanged

Name rules translate the reference module tree (``ITS/models/MIMOUNet.py``,
``vmamba_layers.py``) into our flax module names; see ``_translate``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose
    (kh, kw, I, O), flipping the spatial taps (see module docstring)."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return np.transpose(w)


# ---------------------------------------------------------------- names

def _translate(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Map a flax param path (module names..., leaf) to the reference's
    state-dict key and the required layout transform.

    Returns (torch_key, kind) with kind in
    {conv, conv_t, dense, norm_scale, plain}.
    """
    parts: List[str] = []
    kind = "plain"
    leaf = path[-1]
    mods = path[:-1]

    i = 0
    while i < len(mods):
        m = mods[i]
        if re.fullmatch(r"(Encoder|Decoder|feat_extract|Convs|ConvsOut)_\d+", m):
            base, idx = m.rsplit("_", 1)
            parts += [base, idx]
        elif m in ("SCM1", "SCM2", "FAM1", "FAM2"):
            parts.append(m)
            if m.startswith("FAM"):
                parts.append("merge")
        elif re.fullmatch(r"BasicConv_\d+", m):
            # SCM's k-th BasicConv is main.k; a ResBlock's (baseline preset,
            # path ...layers.<i>) k-th BasicConv is also main.k; elsewhere
            # BasicConv_0 is the module itself (FAM.merge / feat_extract.N /
            # Convs.N ...)
            if parts and parts[-1] in ("SCM1", "SCM2"):
                parts += ["main", m.split("_")[1]]
            elif len(parts) >= 2 and parts[-2] == "layers":
                parts += ["main", m.split("_")[1]]
        elif re.fullmatch(r"GroupNorm_\d+", m):
            parts += ["main", "4"]  # SCM's InstanceNorm slot
            kind = "norm_scale"
        elif re.fullmatch(r"(Conv|ConvTranspose)_\d+", m):
            parts += ["main", "0"]  # BasicConv's conv slot
            kind = "conv_t" if m.startswith("ConvTranspose") else "conv"
        elif re.fullmatch(r"layers_\d+", m):
            parts += ["layers", m.split("_")[1]]
        elif re.fullmatch(r"layers_\d+_(global|local)_\d+", m):
            _, idx, branch, d = m.split("_")
            parts += ["layers", idx, f"seq_{branch}", "blocks", d]
        elif m.startswith("patch_embed_") or m.startswith("patch_unembed_"):
            # patch_embed_global_conv -> patch_embed_global.0
            # patch_embed_global_norm -> patch_embed_global.2
            # patch_unembed_global_conv -> patch_unembed_global.1
            stem, slot = m.rsplit("_", 1)
            if slot == "conv":
                idx = "1" if stem.startswith("patch_unembed") else "0"
                parts += [stem, idx]
                kind = "conv"
            else:
                parts += [stem, "2"]
                kind = "norm_scale"
        elif m in ("norm", "norm2", "out_norm"):
            parts.append(m)
            kind = "norm_scale"
        elif m == "mlp":
            parts.append("mlp")
        elif m in ("fc1", "fc2", "in_proj", "out_proj"):
            parts.append(m)
            kind = "dense"
        elif m == "conv2d":
            parts.append(m)
            kind = "conv"
        elif m == "op":
            parts.append(m)
        else:
            parts.append(m)
        i += 1

    if leaf == "kernel":
        torch_leaf = "weight"
    elif leaf == "scale":
        torch_leaf = "weight"
    elif leaf == "bias":
        torch_leaf = "bias"
        kind = "plain"
    else:
        torch_leaf = leaf  # raw stacks: x_proj_weight, A_logs, Ds, ...
        kind = "plain"
    if kind == "norm_scale" and leaf not in ("scale",):
        kind = "plain"
    return ".".join(parts + [torch_leaf]), kind


_TRANSFORMS = {
    "conv": conv_kernel,
    "conv_t": conv_transpose_kernel,
    "dense": dense_kernel,
    "norm_scale": lambda w: w,
    "plain": lambda w: w,
}


def convert_state_dict(state_dict: Dict[str, np.ndarray], flax_params: Any):
    """Fill ``flax_params`` (template pytree from model.init) with values from
    a reference torch state dict.  Returns (new_params, report) where report
    lists unmatched keys on either side."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    treedef = jax.tree_util.tree_structure(flax_params)
    used = set()
    leaves = []
    missing = []
    for keypath, leaf in flat:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        # drop the top-level "params" collection name
        if path and path[0] == "params":
            path = path[1:]
        torch_key, kind = _translate(path)
        if torch_key in state_dict:
            w = np.asarray(state_dict[torch_key])
            w = _TRANSFORMS[kind](w)
            assert w.shape == leaf.shape, (
                f"{torch_key}: {w.shape} vs {leaf.shape} ({kind})"
            )
            leaves.append(np.asarray(w, dtype=np.asarray(leaf).dtype))
            used.add(torch_key)
        else:
            leaves.append(np.asarray(leaf))
            missing.append((".".join(path), torch_key))
    unused = sorted(set(state_dict) - used)
    new_params = jax.tree_util.tree_unflatten(treedef, leaves)
    return new_params, {"missing": missing, "unused": unused}


_INVERSE_TRANSFORMS = {
    # inverse layout rules of _TRANSFORMS (see module docstring)
    "conv": lambda w: np.transpose(w, (3, 2, 0, 1)),
    "conv_t": lambda w: np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1],
    "dense": np.transpose,
    "norm_scale": lambda w: w,
    "plain": lambda w: w,
}


def to_torch_state_dict(flax_params: Any) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict`: flax param pytree -> reference
    torch state dict (numpy values, reference layouts).

    Together with ``convert_state_dict`` this makes checkpoints portable in
    BOTH directions: weights trained here can be loaded by the reference's
    ``ITS/eval.py:16-17`` (``state_dict['model']``) unchanged.  Uses the same
    ``_translate`` name map as the forward direction, so any key the forward
    converter can consume, this emits.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    sd: Dict[str, np.ndarray] = {}
    for keypath, leaf in flat:
        path = tuple(k.key if hasattr(k, "key") else str(k) for k in keypath)
        if path and path[0] == "params":
            path = path[1:]
        torch_key, kind = _translate(path)
        if torch_key in sd:
            raise ValueError(
                f"two flax leaves map to the same torch key {torch_key!r} "
                f"(second: {'.'.join(path)})"
            )
        w = _INVERSE_TRANSFORMS[kind](np.asarray(leaf, dtype=np.float32))
        # fresh C-contiguous, writable copy (jax array buffers are read-only,
        # which torch.from_numpy warns about)
        sd[torch_key] = np.array(w, order="C")
    return sd


def save_torch_checkpoint(path: str, flax_params: Any, epoch: int = 0):
    """Write ``flax_params`` as a reference-format ``.pkl``:
    ``{'model': state_dict, 'epoch': epoch}`` — the rolling-checkpoint shape
    at ``ITS/train.py:110-113`` (eval loads ``state_dict['model']``,
    ``ITS/eval.py:16-17``, so Best/Final consumers work too).  Requires torch
    (CPU build is enough)."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in to_torch_state_dict(flax_params).items()}
    torch.save({"model": sd, "epoch": epoch}, path)


def load_torch_checkpoint(path: str, flax_params: Any):
    """Load a reference ``.pkl`` checkpoint file and convert it.

    Accepts the reference's two on-disk formats (``ITS/train.py:110-117``):
    ``{'model': state_dict, ...}`` or a bare state dict.  Requires torch
    (CPU build is enough).  Returns (params, report).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_state_dict(sd, flax_params)
