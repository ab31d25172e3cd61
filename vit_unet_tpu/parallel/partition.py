"""Parameter partitioning rules: map param-tree paths -> PartitionSpecs.

The reference has no tensor parallelism (SURVEY.md §2.2); this is the
framework's TPU-native extension.  Rules shard the widest matmuls — the
FeedForward hidden dimension and attention output projection — over the
'model' mesh axis (Megatron-style column/row split so the pair needs a single
collective), and everything else is replicated.  XLA inserts the
all-reduce/all-gather collectives implied by the shardings.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex on 'a/b/c' param path, spec) — first match wins.
DEFAULT_RULES: list[tuple[str, P]] = [
    # FeedForward: column-parallel fc1, row-parallel fc2
    (r".*FeedForward/fc1/kernel$", P(None, "model")),
    (r".*FeedForward/fc1/bias$", P("model")),
    (r".*FeedForward/fc2/kernel$", P("model", None)),
    # attention output projection: column-parallel
    (r".*/proj/kernel$", P(None, "model")),
    (r".*/proj/bias$", P("model")),
    # keras-MHA projections (TF flavour): shard the heads axis
    (r".*(query|key|value)/kernel$", P(None, "model", None)),
    (r".*(query|key|value)/bias$", P("model", None)),
    (r".*out/kernel$", P("model", None, None)),
    # position embeddings can be large at fine levels: shard tokens
    (r".*position_embedding/embedding$", P("model", None)),
]

FALLBACK = P()  # replicate


def spec_for_path(path: str, rules=None) -> P:
    for pattern, spec in (rules or DEFAULT_RULES):
        if re.match(pattern, path):
            return spec
    return FALLBACK


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def partition_specs(tree: Any, rules=None) -> Any:
    """PartitionSpec pytree matching ``tree`` (param paths -> rules)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: spec_for_path(_path_str(p), rules), tree)


def shard_tree(tree: Any, mesh: Mesh, rules=None) -> Any:
    """Device-put a pytree according to the partition rules."""
    specs = partition_specs(tree, rules)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def sharding_tree(tree: Any, mesh: Mesh, rules=None) -> Any:
    specs = partition_specs(tree, rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
