"""Device mesh + sharding rules (the reference has NO distributed support —
one tf.Session, train.py:80; SURVEY.md §2c.  This module is where the TPU
build takes its position on each parallelism axis).

Axes:
  * ``data``  — batch (DP).  Gradients reduce via the psums GSPMD inserts;
    they ride ICI inside a slice.
  * ``model`` — tensor parallelism hooks: the WaveNet skip/dilation channels
    and the 768-wide encoder channels are sharded over this axis.  At the
    shipped model scale TP is optional (fits one chip); the hooks exist so
    wider configs scale.

Everything runs under ONE jit with GSPMD sharding constraints — batch stats
(sync-BN), VQ statistics and loss means are written as global math and
partitioned automatically, so multi-chip training is bit-equivalent to
single-chip (up to reduction order).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    assert num_data * num_model == n, (
        f"mesh {num_data}x{num_model} != {n} devices")
    dev_array = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] batches: shard batch dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, leaf) -> P:
    """Tensor-parallel sharding rules for the parameter tree.

    Shards the widest channel dims over 'model':
      * WaveNet skip 1x1s ([.., D, S] — S=512 output) on the output channel;
      * postprocess1 ([1, S, S]) on the input channel (consumes the sharded
        skip sum);
      * encoder 768-wide conv kernels on the output channel.
    Biases and everything else replicate (they're tiny).
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) == 0 or min(shape) == 0:
        return P()
    if "layers/skip_kernel" in path and len(shape) == 3:
        return P(None, None, "model")
    if "postprocess1/kernel" in path and len(shape) == 3:
        return P(None, "model", None)
    if "encoder" in path and len(shape) == 3 and shape[-1] >= 512:
        return P(None, None, "model")
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedShardings for a params pytree under the TP rules (falls back to
    fully replicated when the 'model' axis has size 1)."""
    if mesh.shape["model"] == 1:
        return jax.tree_util.tree_map(lambda _: replicated(mesh), params)

    def assign(path_tuple, leaf):
        path = "/".join(str(getattr(k, "key", k)) for k in path_tuple)
        spec = _param_spec(path, leaf)
        # only shard dims that divide evenly
        for axis, name in enumerate(spec):
            if name == "model" and leaf.shape[axis] % mesh.shape["model"]:
                return replicated(mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
