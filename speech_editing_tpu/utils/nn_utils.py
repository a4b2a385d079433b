"""Model/tensor introspection helpers.

Parity surface: ``utils/nn/model_utils.py`` (print_arch/num_params) and
``utils/commons/tensor_utils.py`` (tensors_to_scalars/np; the all-reduce
helper is subsumed by mesh sharding — metrics come out of the jitted step
already reduced).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def num_params(params: Any, print_out: bool = True,
               model_name: str = "model") -> float:
    n = sum(x.size for x in jax.tree.leaves(params)) / 1e6
    if print_out:
        print(f"| {model_name} Trainable Parameters: {n:.3f}M")
    return n


def print_arch(params: Any, model_name: str = "model", max_depth: int = 2):
    """Print the parameter tree with per-subtree sizes."""
    def walk(node, path, depth):
        if depth > max_depth or not isinstance(node, dict):
            n = sum(x.size for x in jax.tree.leaves(node))
            print(f"| {'  ' * depth}{'/'.join(path)}: {n / 1e6:.3f}M")
            return
        for k, v in node.items():
            walk(v, path + [k], depth + 1)

    print(f"| {model_name} architecture:")
    walk(params, [], 0)
    num_params(params, model_name=model_name)


def tensors_to_scalars(metrics: Any) -> Any:
    """Recursively convert 0-d arrays to python floats."""
    if isinstance(metrics, dict):
        return {k: tensors_to_scalars(v) for k, v in metrics.items()}
    if hasattr(metrics, "item") and np.ndim(metrics) == 0:
        return float(metrics)
    return metrics


def tensors_to_np(batch: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), batch)
