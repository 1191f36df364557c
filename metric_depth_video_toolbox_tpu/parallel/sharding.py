"""PartitionSpec rules: DP over frames, TP over heads/hidden dims.

Rules keyed by parameter path substrings — qkv/fc1 kernels shard their
output (hidden) dim over 'model'; proj/fc2 shard their input dim; conv,
norm, bias, and embedding params replicate. Batches shard their leading
(frame) axis over 'data'. With mesh axes of size 1 everything degrades to
replication, so the same program runs single-chip.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def param_spec(path, leaf):
    """PartitionSpec for one parameter, by its flax path."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(str(n) for n in names)
    last = names[-1] if names else ""
    if last != "kernel" or leaf.ndim < 2:
        return P()  # biases, norms, embeddings, layerscale: replicate
    # column-parallel (output-dim sharded)
    if any(t in joined for t in ("qkv/", "fc1/", "query/", "key/",
                                 "value/")):
        return P(*([None] * (leaf.ndim - 1) + ["model"]))
    # row-parallel (input-dim sharded)
    if any(t in joined for t in ("proj/", "fc2/", "out/")):
        return P(*(["model"] + [None] * (leaf.ndim - 1)))
    return P()


def params_shardings(mesh, params):
    """Tree of NamedShardings matching ``param_spec`` over a param tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)),
        params)


def batch_sharding(mesh, ndim=4):
    """Leading-axis (frame/time) data sharding."""
    return NamedSharding(mesh, P(*(["data"] + [None] * (ndim - 1))))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_params(mesh, params):
    return jax.device_put(params, params_shardings(mesh, params))


def shard_batch(mesh, batch):
    return jax.device_put(
        batch, jax.tree.map(
            lambda x: batch_sharding(mesh, x.ndim), batch))
