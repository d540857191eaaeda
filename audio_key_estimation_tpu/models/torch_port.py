"""Port PyTorch reference checkpoints into flax variables (and back).

The reference saves raw ``state_dict`` files (models.py:991-993,
eval.py:113-115) with keys like::

    model.0.pool_semi.weight               Conv2d            (O,I,H,W)
    model.0.pc2pc.layer.0.conv2d.weight    equivariant conv  (O,I,12,kd)
    model.0.pc2pc.layer.1.weight           BatchNorm2d       (C,)
    model.1.up_sixth.weight                ConvTranspose2d   (I,O,3,1)
    tonic_classifier.0.conv2d.weight       head conv
    pool.conv.weight / pool.bn.weight      p2pc_conv variant

Our flax module names were chosen to make this translation mechanical
(blocks.py docstring). Kernel layouts are transposed torch OIHW -> flax HWIO;
the (3,1) transposed conv collapses to a (3, Cin, Cout) expansion matrix.

Loading a checkpoint requires no torch at runtime: pass any mapping from key
to numpy array (e.g. produced by ``torch.load(..., map_location='cpu')`` and
converted with ``{k: v.numpy() for k, v in sd.items()}``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
from flax import traverse_util

_HEADS = ("tonic_classifier", "key_classifier", "genre_classifier")
_LEAF_SUFFIX = {"scale": "weight", "bias": "bias", "kernel": "weight",
                "mean": "running_mean", "var": "running_var"}


def _torch_base(path: tuple) -> str:
    """Translate a flax module path (sans leaf) to a torch key prefix."""
    segs = list(path)
    if segs and segs[-1] == "bn":  # unwrap the inner nn.BatchNorm
        segs.pop()
    parts = []
    for s in segs:
        if s.startswith("model_"):
            parts += ["model", s[len("model_"):]]
        elif s.startswith("seq_"):
            idx = s[len("seq_"):]
            # heads hold their Sequential directly (tonic_classifier.0.*),
            # including under a multi-scale model1./model2. prefix
            if parts and parts[-1] in _HEADS:
                parts.append(idx)
            else:
                parts += ["layer", idx]
        else:
            parts.append(s)
    return ".".join(parts)


def _candidates(path: tuple, leaf: str) -> list:
    if leaf not in _LEAF_SUFFIX:
        # bespoke top-level params (multi-scale wk/bk/wt/bt/wg/bg,
        # models.py:1148-1155) keep their own names in the state_dict
        base = _torch_base(path)
        return [f"{base}.{leaf}" if base else leaf]
    base = _torch_base(path)
    suffix = _LEAF_SUFFIX[leaf]
    cands = [f"{base}.{suffix}" if base else suffix]
    if leaf in ("kernel", "bias"):
        # equivariant convs nest the torch Conv2d as `.conv2d`;
        # the p2pc_conv pool nests it as `.conv`
        cands += [f"{base}.conv2d.{suffix}", f"{base}.conv.{suffix}"]
    return cands


def _to_flax(arr: np.ndarray, target_shape: tuple) -> np.ndarray:
    a = np.asarray(arr)
    if a.shape == tuple(target_shape):
        return a
    if a.ndim == 4 and len(target_shape) == 4:          # OIHW -> HWIO
        t = a.transpose(2, 3, 1, 0)
        if t.shape == tuple(target_shape):
            return t
    if a.ndim == 4 and len(target_shape) == 3:          # ConvT (I,O,3,1) -> (3,I,O)
        t = a[:, :, :, 0].transpose(2, 0, 1)
        if t.shape == tuple(target_shape):
            return t
    raise ValueError(f"cannot map torch array {a.shape} -> flax {target_shape}")


def _from_flax(arr: np.ndarray, leaf: str) -> np.ndarray:
    a = np.asarray(arr)
    if leaf == "kernel" and a.ndim == 4:                # HWIO -> OIHW
        return a.transpose(3, 2, 0, 1)
    if leaf == "kernel" and a.ndim == 3:                # (3,I,O) -> (I,O,3,1)
        return a.transpose(1, 2, 0)[:, :, :, None]
    return a


def state_dict_to_variables(state_dict: Mapping[str, np.ndarray],
                            template_variables, *, strict: bool = True,
                            dtype=np.float32):
    """Fill a flax variables pytree (from model.init) with torch weights."""
    out = {}
    used = set()
    for coll, tree in template_variables.items():
        flat = traverse_util.flatten_dict(tree)
        new = {}
        for path, value in flat.items():
            *mods, leaf = path
            found = None
            for cand in _candidates(tuple(mods), leaf):
                if cand in state_dict:
                    found = cand
                    break
            if found is None:
                if strict:
                    raise KeyError(f"no torch key for {coll}/{'/'.join(path)}; "
                                   f"tried {_candidates(tuple(mods), leaf)}")
                new[path] = value
                continue
            used.add(found)
            new[path] = _to_flax(state_dict[found], value.shape).astype(dtype)
        out[coll] = traverse_util.unflatten_dict(new)
    if strict:
        leftovers = {k for k in state_dict
                     if k not in used and not k.endswith("num_batches_tracked")}
        if leftovers:
            raise KeyError(f"unconsumed torch keys: {sorted(leftovers)[:8]} ...")
    return out


def variables_to_state_dict(variables) -> dict:
    """Inverse mapping (flax -> torch naming), for export and round-trips."""
    sd = {}
    for coll, tree in variables.items():
        for path, value in traverse_util.flatten_dict(tree).items():
            *mods, leaf = path
            key = _candidates(tuple(mods), leaf)[0]
            if leaf in ("kernel", "bias"):
                base = _torch_base(tuple(mods))
                # equivariant convs and the octave conv-pool carry their torch
                # submodule name; we emit the plain form and accept any on load
                key = f"{base}.{_LEAF_SUFFIX[leaf]}" if base else leaf
            sd[key] = _from_flax(value, leaf)
    return sd
