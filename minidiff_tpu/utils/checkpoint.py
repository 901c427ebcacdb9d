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


def _snapshot_arrays(tree: "Any") -> dict:
    """Pull every leaf to a host numpy array NOW (device sync point)."""
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
    return arrays


def save_pytree(file: "Any", tree: "Any") -> None:
    """Write every Tensor/array leaf of ``tree`` into one compressed .npz."""
    np.savez_compressed(file, **_snapshot_arrays(tree))


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


# ---------------------------------------------------------------------------
# async rotating checkpoints: the training loop never stalls on host IO
# ---------------------------------------------------------------------------


class AsyncCheckpointer:
    """Non-blocking, atomic, rotating train-state checkpoints.

    ``save(step, params, ...)`` pulls every leaf to HOST memory on the
    calling thread (one device->host DMA — after it returns, the training
    loop may freely donate/overwrite the device arrays), then compresses and
    writes on a background thread so device compute overlaps the disk IO.
    Writes are atomic (tmp file + os.replace), ordered (one worker), and
    rotated (``keep`` newest retained).

    >>> ckpt = AsyncCheckpointer("ckpts", keep=3)
    >>> ckpt.save(step, params, opt_state)        # returns immediately
    >>> ...
    >>> ckpt.wait()                               # join + re-raise IO errors
    >>> params, opt_state, step, extra = ckpt.restore_latest(
    ...     like_params, like_opt_state)
    """

    def __init__(self, directory: "Any", keep: int = 3):
        import concurrent.futures
        import os

        assert keep >= 1, keep
        self.directory = str(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._pending: list = []

    def _path(self, step: int) -> str:
        import os

        return os.path.join(self.directory, f"step-{int(step):012d}.npz")

    def _write(self, step: int, arrays: dict) -> None:
        import os

        final = self._path(step)
        tmp = final + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, **arrays)
        os.replace(tmp, final)  # readers never observe a partial file
        for old in self.steps()[:-self.keep]:
            try:
                os.remove(self._path(old))
            except FileNotFoundError:
                pass

    def save(self, step: int, params: "Any", opt_state: "Any" = None,
             extra: "Optional[dict]" = None) -> None:
        import json

        tree = {"params": params}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        meta = {"step": int(step), "extra": extra or {}}
        tree["_meta_json"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        ).copy()
        arrays = _snapshot_arrays(tree)  # device sync happens HERE
        self._pending.append(self._pool.submit(self._write, step, arrays))

    def wait(self) -> None:
        """Block until every queued write finished; re-raise the first
        background failure (a checkpoint that silently never hit disk is
        worse than a crashed run)."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def steps(self) -> "list":
        """Sorted step numbers currently on disk."""
        import os
        import re

        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"step-(\d+)\.npz", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def restore_latest(self, like_params: "Any",
                       like_opt_state: "Any" = None):
        """(params, opt_state, step, extra) from the newest checkpoint."""
        self.wait()
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory!r}")
        return load_train_state(self._path(steps[-1]), like_params,
                                like_opt_state)

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, *exc: "Any") -> None:
        self.close()
