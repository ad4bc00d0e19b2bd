"""TensorGroup: a dict of first-axis-aligned arrays, registered as a JAX pytree.

Reimplements the camera-params container of the reference (ref:
src/dnnlib/util.py:66-200) the JAX way: because it is a registered pytree
node, a TensorGroup flows transparently through jit / grad / vmap /
shard_map, can be donated, sharded, and checkpointed — no `.to(device)`
plumbing needed.

Semantics preserved from the reference:
  - attribute access (`cp.angles`), first-axis alignment, `len()`
  - integer/slice indexing slices every member along axis 0
  - `split(n)`, elementwise arithmetic (+,-,*,**) with scalars or groups
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Tuple, Union

import jax
import jax.numpy as jnp


class EasyDict(dict):
    """dict with attribute-style access (ref: src/dnnlib/util.py:42-62)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]

    @staticmethod
    def init_recursively(value: Any) -> Any:
        if isinstance(value, dict):
            return EasyDict(**{k: EasyDict.init_recursively(v) for k, v in value.items()})
        return value


@jax.tree_util.register_pytree_node_class
class TensorGroup:
    """An ordered mapping name -> array, all aligned along the first axis."""

    __slots__ = ("_data",)

    def __init__(self, **kwargs: Any):
        data: Dict[str, Any] = dict(kwargs)
        object.__setattr__(self, "_data", data)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self) -> Tuple[Tuple[Any, ...], Tuple[str, ...]]:
        keys = tuple(sorted(self._data.keys()))
        return tuple(self._data[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys: Tuple[str, ...], children: Tuple[Any, ...]) -> "TensorGroup":
        out = object.__new__(cls)
        object.__setattr__(out, "_data", dict(zip(keys, children)))
        return out

    # -- mapping protocol --------------------------------------------------
    def keys(self) -> List[str]:
        return list(self._data.keys())

    def values(self) -> List[Any]:
        return list(self._data.values())

    def items(self) -> List[Tuple[str, Any]]:
        return list(self._data.items())

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __len__(self) -> int:
        v = next(iter(self._data.values()))
        return int(v.shape[0])

    def __getattr__(self, name: str) -> Any:
        try:
            return self._data[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self._data[name] = value

    def __getitem__(self, item: Any) -> Any:
        if isinstance(item, str):
            return self._data[item]
        return TensorGroup(**{k: v[item] for k, v in self._data.items()})

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __repr__(self) -> str:
        shapes = {k: tuple(getattr(v, "shape", ())) for k, v in self._data.items()}
        return f"TensorGroup({shapes})"

    # -- reference-parity helpers -------------------------------------------
    def split(self, group_size: int) -> List["TensorGroup"]:
        n = len(self)
        return [self[i * group_size:(i + 1) * group_size]
                for i in range((n + group_size - 1) // group_size)]

    def map(self, fn: Callable[[Any], Any]) -> "TensorGroup":
        return TensorGroup(**{k: fn(v) for k, v in self._data.items()})

    def astype(self, dtype: Any) -> "TensorGroup":
        return self.map(lambda v: v.astype(dtype))

    def repeat_interleave(self, repeats: int, axis: int = 0) -> "TensorGroup":
        return self.map(lambda v: jnp.repeat(v, repeats, axis=axis))

    def copy(self) -> "TensorGroup":
        return TensorGroup(**dict(self._data))

    def max(self):
        return jnp.max(jnp.stack([jnp.max(v) for v in self._data.values()]))

    def sum(self):
        return jnp.sum(jnp.stack([jnp.sum(v) for v in self._data.values()]))

    def numel(self) -> int:
        return sum(int(v.size) for v in self._data.values())

    @property
    def shapes(self) -> Dict[str, Tuple[int, ...]]:
        return {k: tuple(v.shape) for k, v in self._data.items()}

    # -- arithmetic ----------------------------------------------------------
    def _binop(self, other: Any, op: Callable[[Any, Any], Any]) -> "TensorGroup":
        if isinstance(other, TensorGroup):
            return TensorGroup(**{k: op(v, other[k]) for k, v in self._data.items()})
        return TensorGroup(**{k: op(v, other) for k, v in self._data.items()})

    def __add__(self, other: Any) -> "TensorGroup":
        return self._binop(other, lambda a, b: a + b)

    __radd__ = __add__

    def __sub__(self, other: Any) -> "TensorGroup":
        return self._binop(other, lambda a, b: a - b)

    def __mul__(self, other: Any) -> "TensorGroup":
        return self._binop(other, lambda a, b: a * b)

    __rmul__ = __mul__

    def __pow__(self, other: Any) -> "TensorGroup":
        return self._binop(other, lambda a, b: a ** b)


CameraParams = TensorGroup  # keys: angles [N,3], fov [N], radius [N], look_at [N,3]
