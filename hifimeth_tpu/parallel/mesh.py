"""Device mesh and sharding layouts.

The model is tiny (~270k params) so the dominant parallelism is pure data
parallelism over sites (batch axis) - the TPU-native replacement for the
reference's pthread read pool (mod_main.cpp:330-350).  A `model` axis is
still supported: the FC layers shard their hidden dimension so the design
scales to wider models, and it exercises real tensor-parallel collectives
(psum over the contraction) in the multi-chip dry run.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def train_param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for the trainable model: convs replicated
    (tiny), FC1 column-sharded / FC2 row-sharded over `model` so the hidden
    activations shard and the FC2 contraction psums over the mesh."""
    rep = replicated(mesh)
    out = {
        "bn0": {k: rep for k in params["bn0"]},
        "convs": [{k: rep for k in c} for c in params["convs"]],
        "fc1": {"w": NamedSharding(mesh, P(None, "model")),
                "b": NamedSharding(mesh, P("model"))},
        "fc2": {"w": NamedSharding(mesh, P("model", None)),
                "b": rep},
    }
    return out


def infer_param_shardings(mesh: Mesh, params) -> dict:
    """Same layout for the folded inference params (model/cnn.py pytree)."""
    rep = replicated(mesh)
    return {
        "bn0": {k: rep for k in params["bn0"]},
        "convs": [{k: rep for k in c} for c in params["convs"]],
        "fc1": {"w": NamedSharding(mesh, P(None, "model")),
                "b": NamedSharding(mesh, P("model"))},
        "fc2": {"w": NamedSharding(mesh, P("model", None)),
                "b": rep},
    }


def shard_tree(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
