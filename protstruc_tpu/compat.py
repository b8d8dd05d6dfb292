"""NumPy-echo compatibility layer.

The reference's ``@with_tensor`` decorator (decorator.py:5-53) converts
NumPy inputs to torch tensors and converts results *back to NumPy iff no
input was a tensor* — its tests pin that type-echo behavior
(tests/test_decorator.py:12-39).  The core JAX API always returns
``jnp.ndarray``; this module provides the same adapter for callers porting
code that relies on NumPy-in/NumPy-out, plus pre-wrapped geometry functions.

    from protstruc_tpu.compat import geometry as geom
    geom.dihedral(np_a, np_b, np_c, np_d)   # -> np.ndarray
"""

from __future__ import annotations

import functools
import types
from typing import Callable

import jax.numpy as jnp
import numpy as np

from protstruc_tpu import geometry as _geometry

__all__ = ["with_array", "geometry"]


def _any_jax(tree) -> bool:
    found = False

    def visit(x):
        nonlocal found
        if isinstance(x, jnp.ndarray) and not isinstance(x, np.ndarray):
            found = True

    for v in tree:
        visit(v)
    return found


def _to_numpy(out):
    if isinstance(out, tuple):
        return tuple(_to_numpy(v) for v in out)
    if isinstance(out, list):
        return [_to_numpy(v) for v in out]
    if isinstance(out, dict):
        return {k: _to_numpy(v) for k, v in out.items()}
    if isinstance(out, jnp.ndarray):
        return np.asarray(out)
    return out


def with_array(fn: Callable) -> Callable:
    """Echo NumPy: if no argument is a JAX array, return NumPy arrays.

    Behavioral analogue of the reference's ``with_tensor`` (decorator.py:5-53)
    for the JAX backend; handles tuple/list/dict outputs like the original.
    Keyword arguments count toward the type-echo decision exactly like the
    reference (decorator.py:27-30 checks kwargs.values() too).
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        out = fn(*args, **kwargs)
        if _any_jax(args) or _any_jax(kwargs.values()):
            return out
        return _to_numpy(out)

    return wrapper


def _wrap_module(mod, names):
    out = types.ModuleType(f"{mod.__name__}.compat")
    for n in names:
        setattr(out, n, with_array(getattr(mod, n)))
    return out


#: geometry with reference-style NumPy echo semantics
geometry = _wrap_module(_geometry, _geometry.__all__)
