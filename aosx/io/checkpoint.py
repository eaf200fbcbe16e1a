"""Episode checkpoint / resume (SURVEY.md section 5: the reference has no
internal persistence - map saving is delegated to LIO-SAM's /lio_sam/save_map
and /gvd/save_cluster_info has NO server. Here episode state is a pytree, so
checkpointing is plain serialization; this also provides the
"save_cluster_info" capability the reference panel expects)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def save_state(path: str, state) -> None:
    """Save any pytree of arrays to <path>.npz + <path>.tree (structure)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path + ".npz", **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )
    with open(path + ".tree", "w") as f:
        f.write(str(treedef))


def load_state(path: str, like) -> object:
    """Restore a pytree saved by save_state; `like` supplies the structure
    (and target dtypes)."""
    data = np.load(path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for i, ref in enumerate(leaves_like):
        arr = data[f"leaf_{i}"]
        leaves.append(np.asarray(arr, dtype=np.asarray(ref).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_cluster_info(path: str, graph, rows_sorted) -> None:
    """The /gvd/save_cluster_info service the reference declares clients for
    (aos_path_gen_node.cpp:106, panel) but never implements: persist the
    cluster/label tables + graph as JSON + npz."""
    n = int(graph.num_nodes)
    e = int(graph.num_edges)
    meta = dict(num_nodes=n, num_edges=e)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    np.savez_compressed(
        path + ".npz",
        nodes=np.asarray(graph.nodes)[:n],
        node_labels=np.asarray(graph.node_labels)[:n],
        label_node=np.asarray(graph.label_node),
        edges=np.asarray(graph.edges)[:e],
        edge_lengths=np.asarray(graph.edge_lengths)[:e],
        row_centers=np.asarray(rows_sorted.center),
        row_ep1=np.asarray(rows_sorted.ep1),
        row_ep2=np.asarray(rows_sorted.ep2),
        row_valid=np.asarray(rows_sorted.valid),
    )
