"""Pytree checkpointing: save/load whole parameter/optimizer-state trees.

The reference only serializes single arrays (md.save/md.load,
minidiff/tensor.py:598-605 → np.save/np.load); training real models needs
whole-tree round-trips.  ``save_pytree`` flattens a tree of Tensors (or raw
arrays) to one ``.npz`` keyed by jax keypaths; ``load_pytree`` restores it —
either into the structure of a ``like`` tree (preserving each leaf's
allow_grad and letting sharded trees be re-placed by the caller) or, without
``like``, as a nested dict/list reconstruction from the stored paths.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np

import minidiff_tpu as md
import minidiff_tpu.backend as backend

if TYPE_CHECKING:
    from typing import Any, Optional


def _is_tensor(x: "Any") -> bool:
    return isinstance(x, md.Tensor)


def _path_str(path) -> str:
    import jax

    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            if "/" in str(p.key):
                raise ValueError(
                    f"checkpoint keys may not contain '/': {p.key!r} "
                    "(it is the keypath separator)"
                )
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):  # pragma: no cover
            parts.append(str(p.name))
        else:  # pragma: no cover
            parts.append(str(p))
    return "/".join(parts) or "."


def save_pytree(file: "Any", tree: "Any") -> None:
    """Write every Tensor/array leaf of ``tree`` into one compressed .npz."""
    import jax

    leaves_with_paths, _ = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=_is_tensor
    )
    arrays = {}
    for path, leaf in leaves_with_paths:
        key = _path_str(path)
        if _is_tensor(leaf):
            arrays[key] = np.asarray(backend.as_numpy(leaf._data))
        else:
            arrays[key] = np.asarray(leaf)
    np.savez_compressed(file, **arrays)


def _restore_like(arrays: dict, like: "Any") -> "Any":
    """Rebuild ``like``'s structure from a {keypath: array} dict."""
    import jax

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        like, is_leaf=_is_tensor
    )
    rebuilt = []
    for path, leaf in leaves_with_paths:
        key = _path_str(path)
        if key not in arrays:
            raise KeyError(f"checkpoint is missing leaf {key!r}")
        value = arrays[key]
        if _is_tensor(leaf):
            rebuilt.append(md.Tensor(value, allow_grad=leaf.allow_grad))
        else:
            rebuilt.append(value)
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


def load_pytree(file: "Any", like: "Optional[Any]" = None) -> "Any":
    """Restore a tree saved by save_pytree.

    With ``like``: returns a tree of ``like``'s structure whose Tensor leaves
    carry the stored values (keeping each leaf's allow_grad flag).  Without:
    returns nested dicts/lists keyed by the stored paths.
    """
    with np.load(file) as data:
        arrays = {k: data[k] for k in data.files}

    if like is not None:
        return _restore_like(arrays, like)

    if list(arrays) == ["."]:  # a single-leaf tree saved at the root path
        return md.Tensor(arrays["."])

    # pathwise reconstruction: dicts for string keys, lists for int keys
    root: dict = {}
    for key, value in arrays.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = md.Tensor(value)

    def _listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node)
        if keys and all(k.isdigit() for k in keys):
            return [_listify(node[k]) for k in sorted(keys, key=int)]
        return {k: _listify(v) for k, v in node.items()}

    return _listify(root)


# ---------------------------------------------------------------------------
# training-state checkpoints: params + optimizer state + counters in one file,
# so interrupted runs resume exactly (the reference has no notion of resume —
# SURVEY.md §5.4)
# ---------------------------------------------------------------------------


def save_train_state(file: "Any", params: "Any", opt_state: "Any" = None,
                     step: int = 0, extra: "Optional[dict]" = None) -> None:
    """One-file checkpoint of everything a training loop needs to resume.

    ``extra`` may carry small JSON-able metadata (epoch, rng seed, lr-
    schedule position …).
    """
    import json

    tree = {"params": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    meta = {"step": int(step), "extra": extra or {}}
    tree["_meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    save_pytree(file, tree)


def load_train_state(file: "Any", like_params: "Any",
                     like_opt_state: "Any" = None):
    """Restore (params, opt_state, step, extra) from save_train_state.

    ``like_*`` trees provide structure and allow_grad flags, exactly as in
    load_pytree(like=...).
    """
    import json

    like = {"params": like_params}
    if like_opt_state is not None:
        like["opt_state"] = like_opt_state
    like["_meta_json"] = np.zeros(0, dtype=np.uint8)

    with np.load(file) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays["_meta_json"]).decode())

    tree = _restore_like(arrays, like)
    params = tree["params"]
    opt_state = tree.get("opt_state") if like_opt_state is not None else None
    return params, opt_state, meta["step"], meta["extra"]
