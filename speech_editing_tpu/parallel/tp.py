"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

Beyond-parity scaling: the reference is data-parallel only (SURVEY §2.9 —
no TP/PP/SP/EP anywhere), which caps scale at "model fits on one chip".
Here we add optional tensor parallelism the TPU-native way: annotate the
parameter pytree with ``PartitionSpec``s and let XLA GSPMD partition every
matmul/conv and insert the all-reduces on ICI — no manual collectives, no
model-code changes.

The spec chooser is a size heuristic rather than per-module rules: any
kernel axis that is divisible by the ``model`` axis size and large enough
to be worth splitting gets sharded, preferring the output axis (column
parallel — keeps the backward all-reduce off the forward path for the
common Dense->Dense / Conv->Conv chains; GSPMD propagates the rest).
Embeddings shard over the embedding dim; biases/norms stay replicated.

Enable with ``tp_size: 2`` (any divisor of the device count) in the config;
the trainer builds the mesh as ``{"data": n//tp, "model": tp}``.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# params matching these path fragments are never sharded (small / 1-D /
# shape-sensitive)
_REPLICATE_RE = re.compile(
    r"(bias|scale|gamma|beta|_g$|logdet|actnorm)", re.IGNORECASE)


def _spec_for(path: str, shape: tuple, tp: int,
              min_size: int = 2048) -> P:
    """PartitionSpec for one param: shard ONE axis over the model axis.

    Prefers the trailing (output-feature) axis of >=2-D kernels; falls back
    to the first shardable axis. Small tensors stay replicated — the
    all-gather would cost more than the memory/compute split saves.
    """
    if tp <= 1 or len(shape) < 2 or int(np.prod(shape)) < min_size \
            or _REPLICATE_RE.search(path):
        return P()
    # axis preference: last (out features), then second-to-last (in), then rest
    order = [len(shape) - 1, len(shape) - 2] + list(range(len(shape) - 2))
    for ax in order:
        if shape[ax] % tp == 0 and shape[ax] >= 2 * tp:
            spec = [None] * len(shape)
            spec[ax] = MODEL_AXIS
            return P(*spec)
    return P()


def param_partition_specs(params: Any, tp: int, min_size: int = 2048) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        specs[key] = _spec_for(key, tuple(getattr(leaf, "shape", ())), tp,
                               min_size)

    def lookup(path, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        return specs[key]

    return jax.tree_util.tree_map_with_path(lookup, params)


def make_tp_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """2-D (data, model) mesh; tp must divide the device count.

    The model axis is innermost so TP collectives ride the fastest ICI
    links (adjacent devices), and data-parallel grad reduction crosses the
    slower dimension once per step.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % tp == 0, f"tp={tp} must divide device count {n}"
    from speech_editing_tpu.parallel.mesh import DATA_AXIS

    return Mesh(np.asarray(devs).reshape(n // tp, tp),
                (DATA_AXIS, MODEL_AXIS))


def shard_params(params: Any, mesh: Mesh, specs: Any) -> Any:
    """device_put params according to their specs (host -> sharded HBM)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def constrain_params(params: Any, mesh: Mesh, specs: Any) -> Any:
    """In-program sharding constraint (use inside jit)."""
    return jax.tree.map(
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, s)), params, specs)
