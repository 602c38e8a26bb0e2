"""Parameter-tree surgery: head inheritance + torch checkpoint conversion.

Capability parity with:
* ``inherit_head`` — student head initialized from the teacher's task
  heads (reference: bevdet_distill.py init_weights:367-373 load_state_dict
  of pts_bbox_head.task_heads);
* the PyTorch->JAX weight converter required so released reference
  checkpoints reproduce their nuScenes metrics (SURVEY.md §5 checkpoint
  notes; reference checkpoints are torch state_dicts saved by mmcv).

Torch layout -> flax layout rules: Conv2d OIHW -> HWIO; ConvTranspose2d
IOHW -> HWIO (flipped? no — flax ConvTranspose kernel is HWIO with fan-in
first); Linear [out, in] -> [in, out]; BN weight/bias/running_* ->
scale/bias/mean/var.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


def flatten_tree(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def unflatten_tree(flat: Dict[Tuple[str, ...], Any]):
    root: Dict[str, Any] = {}
    for path, v in flat.items():
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = v
    return root


def stack_layer_params(tree, layers_name: str = "layers"):
    """Convert every sibling group ``layer_0 .. layer_{L-1}`` into ONE
    stacked subtree under ``layers_name`` (new leading axis, length L) —
    the parameter layout an ``nn.scan``-over-layers module creates
    (transformer/encoder.py scan_layers).  Recursive; non-layer keys are
    kept.  The inverse of ``unstack_layer_params``."""
    import jax.numpy as jnp
    if not isinstance(tree, dict):
        return tree
    out = {k: stack_layer_params(v, layers_name) for k, v in tree.items()
           if not (str(k).startswith("layer_") and
                   str(k)[len("layer_"):].isdigit())}
    idx = sorted(int(str(k)[len("layer_"):]) for k in tree
                 if str(k).startswith("layer_") and
                 str(k)[len("layer_"):].isdigit())
    if idx:
        assert idx == list(range(len(idx))), f"non-contiguous layers {idx}"
        subs = [stack_layer_params(tree[f"layer_{i}"], layers_name)
                for i in idx]
        flats = [flatten_tree(s) for s in subs]
        out[layers_name] = unflatten_tree({
            p: jnp.stack([jnp.asarray(f[p]) for f in flats])
            for p in flats[0]})
    return out


def unstack_layer_params(tree, layers_name: str = "layers"):
    """Inverse of ``stack_layer_params``: split every ``layers_name``
    subtree (leading axis L on all leaves) into ``layer_0..layer_{L-1}``."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == layers_name and isinstance(v, dict):
            flat = flatten_tree(v)
            n = int(np.shape(next(iter(flat.values())))[0])
            for i in range(n):
                out[f"layer_{i}"] = unflatten_tree(
                    {p: a[i] for p, a in flat.items()})
        else:
            out[k] = unstack_layer_params(v, layers_name)
    return out


def inherit_head_params(student_params: Dict, teacher_params: Dict,
                        head_key: str = "bbox_head",
                        verbose: bool = False) -> Dict:
    """Copy the teacher's task-head params into the student head where
    names+shapes match (reference inherit_head semantics: task heads only,
    strict=False)."""
    import jax.numpy as jnp
    s_flat = flatten_tree(student_params)
    t_flat = flatten_tree(teacher_params)
    t_heads = {p: v for p, v in t_flat.items()
               if head_key in p and any(
                   str(seg).startswith("task_") for seg in p)}
    copied = 0
    out = dict(s_flat)
    for t_path, t_val in t_heads.items():
        # align on the suffix starting at the head key
        try:
            i = t_path.index(head_key)
        except ValueError:
            continue
        suffix = t_path[i:]
        matches = [p for p in s_flat if p[-len(suffix):] == suffix]
        for p in matches:
            if np.shape(s_flat[p]) == np.shape(t_val):
                out[p] = jnp.asarray(t_val)
                copied += 1
    if verbose:
        print(f"inherit_head: copied {copied} tensors")
    return unflatten_tree(out)


def inherit_params_by_selectors(student_params: Dict,
                                teacher_params: Dict,
                                selectors,
                                verbose: bool = False) -> Dict:
    """Copy teacher tensors into the student wherever a path segment
    matches a selector regex and the suffix + shape line up.

    Drives the BEVFormer-path inheritance flags (reference
    bevformer_distill.py inherit:266-285 — ``inherit_head`` copies
    cls/reg branches, ``inherit_decoder`` the DETR decoder subtree,
    ``inherit_query`` the object query embedding; all strict=False).
    """
    import re

    import jax.numpy as jnp
    s_flat = flatten_tree(student_params)
    t_flat = flatten_tree(teacher_params)
    out = dict(s_flat)
    copied = 0
    pats = [re.compile(s) for s in selectors]
    for t_path, t_val in t_flat.items():
        anchor = None
        for i, seg in enumerate(t_path):
            if any(p.fullmatch(str(seg)) for p in pats):
                anchor = i
                break
        if anchor is None:
            continue
        suffix = t_path[anchor:]
        for p in s_flat:
            if p[-len(suffix):] == suffix and \
                    np.shape(s_flat[p]) == np.shape(t_val):
                out[p] = jnp.asarray(t_val)
                copied += 1
    if verbose:
        print(f"inherit[{selectors}]: copied {copied} tensors")
    return unflatten_tree(out)


# -- torch state_dict conversion -------------------------------------------


def convert_tensor(name: str, t: np.ndarray) -> np.ndarray:
    """Layout-convert one torch tensor by name heuristics."""
    a = np.asarray(t)
    if a.ndim == 4:
        # Conv2d OIHW -> HWIO
        return a.transpose(2, 3, 1, 0)
    if a.ndim == 5:
        # Conv3d OIDHW -> DHWIO
        return a.transpose(2, 3, 4, 1, 0)
    if a.ndim == 2:
        # Linear [out, in] -> [in, out]
        return a.transpose(1, 0)
    return a


def torch_state_dict_to_arrays(state_dict) -> Dict[str, np.ndarray]:
    """Materialize a torch state_dict (or raw mapping) to numpy."""
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load an mmcv/torch checkpoint file -> flat numpy dict.

    Reference checkpoints store {'state_dict': ..., 'meta': ...}
    (tools/train.py:220-230)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return torch_state_dict_to_arrays(sd)


def map_params(torch_flat: Dict[str, np.ndarray],
               name_map: Dict[str, Tuple[str, ...]],
               target_params: Dict) -> Tuple[Dict, list, list]:
    """Place converted torch tensors into a flax param tree.

    Args:
        torch_flat: torch name -> numpy array.
        name_map: torch name -> flax path tuple (e.g. ('backbone',
            'stem_conv', 'kernel')).
        target_params: the flax tree to fill (copied, not mutated).

    Returns (new_params, missing, mismatched).
    """
    flat = flatten_tree(target_params)
    out = dict(flat)
    missing, mismatched = [], []
    for tname, path in name_map.items():
        if tname not in torch_flat:
            missing.append(tname)
            continue
        raw = np.asarray(torch_flat[tname])
        row = None
        if path not in out:
            # nn.scan'd layer stacks: a per-layer torch name targets row
            # i of the stacked layers/... leaf (stack_layer_params
            # layout, transformer/encoder.py scan_layers)
            spath, row = _scanned_path(path)
            if spath is None or spath not in out:
                missing.append("/".join(path))
                continue
            path = spath
        dst = np.shape(out[path])
        if row is not None:
            dst = dst[1:]
        arr = _fit_tensor(tname, raw, path, dst)
        if arr is None:
            mismatched.append((tname, raw.shape, dst))
            continue
        if row is not None:
            buf = np.array(out[path])
            buf[row] = arr
            out[path] = buf
        else:
            out[path] = arr
    return unflatten_tree(out), missing, mismatched


def _scanned_path(path: Tuple[str, ...]):
    """('...', 'layer_3', '...') -> (('...', 'layers', '...'), 3)."""
    for j, seg in enumerate(path):
        s = str(seg)
        if s.startswith("layer_") and s[len("layer_"):].isdigit():
            return path[:j] + ("layers",) + path[j + 1:], \
                int(s[len("layer_"):])
    return None, None


def _fit_tensor(tname: str, raw: np.ndarray, path: Tuple[str, ...], dst):
    """Layout-convert ``raw`` to destination shape ``dst`` or None."""
    if raw.ndim == 4 and len(dst) == 4 and \
            any("deconv" in str(p) for p in path[-2:]):
        # torch ConvTranspose2d (in, out, kh, kw) -> flax
        # ConvTranspose (kh, kw, in, out), SPATIALLY FLIPPED:
        # torch's transposed conv is the conv gradient (places
        # w[ky,kx] at output offset (ky,kx)); lax.conv_transpose
        # applies the kernel unflipped (golden-activation test
        # tests/test_golden_activations.py pins this)
        arr = raw.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    else:
        arr = convert_tensor(tname, raw)
    if arr.shape != tuple(dst):
        # layout fallbacks, in safety order:
        # 1. raw exact — embeddings / tensors already in our layout
        #    (torch nn.Embedding [N, E] must NOT be transposed);
        # 2. raw 5-D -> 3-D reshape — spconv weights are stored
        #    (kd, kh, kw, in, out), ours are (K, in, out);
        # 3. cross-rank reshape of the converted tensor — torch MHA
        #    in_proj/out_proj 2-D [out, in] -> flax DenseGeneral
        #    (in, heads, head_dim) / (heads, head_dim, out) after
        #    the standard transpose.  Same-rank mismatches stay
        #    errors (a silent reshape would scramble layouts).
        if raw.shape == tuple(dst):
            arr = raw
        elif raw.ndim == 5 and len(dst) == 3 and \
                raw.size == int(np.prod(dst)):
            arr = raw.reshape(dst)
        elif arr.ndim != len(dst) and arr.size == int(np.prod(dst)):
            arr = arr.reshape(dst)
        else:
            return None
    return arr


def bn_name_map(torch_prefix: str, flax_path: Tuple[str, ...],
                stats_map: Optional[Dict] = None) -> Dict:
    """Standard BN tensor mapping; running stats go into ``stats_map``
    if given (they live in the batch_stats collection)."""
    m = {
        f"{torch_prefix}.weight": flax_path + ("scale",),
        f"{torch_prefix}.bias": flax_path + ("bias",),
    }
    if stats_map is not None:
        stats_map[f"{torch_prefix}.running_mean"] = flax_path + ("mean",)
        stats_map[f"{torch_prefix}.running_var"] = flax_path + ("var",)
    return m
