"""Array-backend abstraction and runtime selector.

The reference framework selects an array library once at import time by abusing
``argparse`` and monkey-patching a class dict into module globals
(reference: minidiff/backend/__init__.py:13-85).  We keep the *concept* — a flat
namespace of ~80 array functions + dtype symbols that every other layer calls —
but make selection explicit and dynamic:

* ``MINIDIFF_TPU_BACKEND`` env var (``xla`` | ``numpy`` | ``torch``),
  default ``xla``.
* ``set_backend(name)`` / ``use_backend(name)`` (context manager) at runtime.
* Attribute access on this module dispatches to the *active* backend through
  ``__getattr__``, so ops bound at import time still resolve dynamically.

Backends must implement the interface documented in
:mod:`minidiff_tpu.backend.interface` (the analog of the reference's abstract
``Backend`` with ~80 NotImplementedError stubs, minidiff/backend/__init__.py:99-759).
"""

from __future__ import annotations

import contextlib
import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from typing import Any, Iterator

_BACKENDS: dict[str, Any] = {}
_active: list[Any] = [None]
_active_name: list[str] = [""]

_ENV_VAR = "MINIDIFF_TPU_BACKEND"
_DEFAULT_ORDER = ["xla", "numpy"]


def register_backend(name: str, backend: Any) -> None:
    _BACKENDS[name] = backend


def available_backends() -> list[str]:
    _ensure_registered()
    return sorted(_BACKENDS)


def _ensure_registered() -> None:
    if _BACKENDS:
        return
    import importlib

    # Lazy imports so that `numpy` works even when jax is unavailable.  Uses
    # importlib (not from-import) because this module's __getattr__ would
    # otherwise recurse through _handle_fromlist while partially initialized.
    importlib.import_module("minidiff_tpu.backend.numpy_backend")
    try:
        importlib.import_module("minidiff_tpu.backend.xla_backend")
    except Exception as e:  # pragma: no cover - jax should always be present
        _import_errors["xla"] = repr(e)
    try:
        importlib.import_module("minidiff_tpu.backend.torch_backend")
    except Exception as e:  # torch is optional; numpy/xla never depend on it
        _import_errors["torch"] = repr(e)


_import_errors: dict = {}


def set_backend(name: str) -> None:
    """Select the active array backend by name (``xla`` or ``numpy``)."""
    _ensure_registered()
    if name not in _BACKENDS:
        hint = (
            f" (import failed: {_import_errors[name]})"
            if name in _import_errors
            else ""
        )
        raise ValueError(
            f"unknown backend {name!r}; available: {sorted(_BACKENDS)}{hint}"
        )
    _active[0] = _BACKENDS[name]
    _active_name[0] = name
    _epoch[0] += 1


# Bumped on every backend switch; per-op resolution caches key on it so the
# dynamic backend lookup costs one int compare per call instead of a module
# __getattr__ (which cProfile showed at ~12% of eager op dispatch).
_epoch = [0]


def epoch() -> int:
    return _epoch[0]


def get_backend() -> Any:
    if _active[0] is None:
        _ensure_registered()
        requested = os.environ.get(_ENV_VAR)
        order = [requested] if requested else _DEFAULT_ORDER
        for name in order:
            if name in _BACKENDS:
                set_backend(name)
                break
        else:
            raise RuntimeError(
                f"could not select a backend from {order}; "
                f"available: {sorted(_BACKENDS)}"
            )
    return _active[0]


def backend_name() -> str:
    get_backend()
    return _active_name[0]


@contextlib.contextmanager
def use_backend(name: str) -> Iterator[None]:
    """Temporarily switch the active backend (mainly for tests)."""
    get_backend()
    prev = _active_name[0]
    set_backend(name)
    try:
        yield
    finally:
        set_backend(prev)


def __getattr__(name: str) -> Any:
    if name.startswith("__") or name in (
        "numpy_backend",
        "xla_backend",
        "torch_backend",
        "interface",
    ):
        raise AttributeError(name)
    return getattr(get_backend(), name)
