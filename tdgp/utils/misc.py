"""Small runtime utilities (ref: src/torch_utils/misc.py, src/training/training_utils.py)."""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert tensor shape; None entries are wildcards (ref: src/torch_utils/misc.py:83-99).

    Shapes are static under jit, so this is a trace-time check with zero
    runtime cost.
    """
    if x.ndim != len(ref_shape):
        raise AssertionError(f"Wrong number of dims: got {x.ndim}, expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(x.shape, ref_shape)):
        if ref_size is not None and int(size) != int(ref_size):
            raise AssertionError(f"Wrong size for dim {idx}: got {size}, expected {ref_size}")


def linear_schedule(step: float, val_start: float, val_end: float, period: float,
                    start_step: float = 0.0) -> float:
    """Host-side linear annealing (ref: src/training/training_utils.py:8-18)."""
    if period <= 0 or step >= start_step + period:
        return val_end
    if step <= start_step:
        return val_start
    return val_start + (val_end - val_start) * (step - start_step) / period


def nan_to_num(x, nan: float = 0.0, posinf: float = 1e5, neginf: float = -1e5):
    """Gradient scrubbing used before the optimizer step (ref: training_loop.py:341)."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def setup_snake_case(name: str) -> str:
    out = []
    for ch in name:
        if ch.isupper() and out:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def num_params(params) -> int:
    import jax
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
