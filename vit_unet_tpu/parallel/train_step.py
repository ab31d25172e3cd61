"""Sharded train/eval steps — the TPU-native replacement for Keras
``model.fit`` under ``TPUStrategy`` (SURVEY.md §3.3).

One jitted SPMD program per step: batch sharded over the 'data' mesh axis,
params laid out by ``partition.py`` rules (replicated for pure DP, sharded
over 'model' for TP).  Gradient all-reduce is implicit — XLA inserts psum
over ICI from the shardings, exactly where ``TPUStrategy`` hid it in the
reference.  Dropout RNG is folded per-step and per-data-shard; BatchNorm
batch_stats are carried as mutable state (and can be synced across replicas
by constructing the model with ``bn_axis_name`` under shard_map — by default
stats are computed on the global batch because attention maps are batch-major
sharded and XLA reduces globally).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_unet_tpu.parallel.partition import partition_specs


class TrainState(struct.PyTreeNode):
    """Carried training state (params + opt + BN stats + step + base rng)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array

    @classmethod
    def create(cls, *, params, tx, batch_stats=None, rng=None):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   batch_stats=batch_stats if batch_stats is not None else {},
                   rng=rng if rng is not None else jax.random.key(0))


@dataclasses.dataclass
class StepFunctions:
    train_step: Callable
    eval_step: Callable
    state_sharding: Any


def build_step_functions(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    mesh: Optional[Mesh] = None,
    metrics: Optional[dict[str, Callable]] = None,
    donate: bool = True,
    zero_sharding: bool = False,
    bn_frozen: bool = False,
) -> StepFunctions:
    """Build jitted train/eval steps for a flax model over a mesh.

    The model's ``apply`` must accept ``deterministic`` and (if it carries
    BatchNorm) ``use_running_average``; both ViTUNet and HViTUNetTF do.

    ``zero_sharding`` (ZeRO-1): shard param-shaped optimizer-state leaves
    (Adam moments, accumulated grads, …) over the 'data' mesh axis instead
    of replicating them — in pure DP this cuts per-chip optimizer memory by
    the replica count (2/3 of AdamW training state).  Params stay
    replicated; expressed purely as sharding annotations, so XLA partitions
    the optimizer update across the data axis and inserts the param
    all-gather itself (and is free to fuse the gradient psum into a
    reduce-scatter feeding the sharded update).  Exactness is untouched —
    the update math is elementwise per parameter.

    ``bn_frozen``: the TRAIN step runs BatchNorm at its running statistics
    (``use_running_average=True``, no stat updates) while dropout stays
    active — the frozen-BN training semantics, applied uniformly on every
    compute path (XLA, flash kernels, sequence-parallel).  Used by
    ``Fitter(bn_freeze_epochs=K)`` for the frozen→batch-stats warmup that
    makes the torch architecture's exact-BN semantics trainable
    (docs/PERF.md "End-to-end training behavior").  Eval is unaffected.
    """
    metrics = metrics or {}

    def _variables(state: TrainState):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def _weighted_loss(pred, y, w):
        """Per-sample loss weighting — the reference's third dataset slot
        (torch/dataset.py:85-90 yields (x, y, w); benatools multiplies the
        per-sample loss by w).  Weighted mean normalised by sum(w) so w=1
        reproduces the unweighted loss exactly."""
        per = jax.vmap(lambda p, t: loss_fn(p, t))(
            pred.astype(jnp.float32), y.astype(jnp.float32))
        w = w.astype(jnp.float32).reshape(-1)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-8)

    def _loss(pred, y, w):
        if w is not None:
            return _weighted_loss(pred, y, w)
        return loss_fn(pred.astype(jnp.float32), y.astype(jnp.float32))

    def train_step(state: TrainState, batch: dict):
        x, y, w = batch["x"], batch["y"], batch.get("w")
        step_rng = jax.random.fold_in(state.rng, state.step)

        def compute_loss(params):
            variables = _variables(state.replace(params=params))
            if state.batch_stats:
                pred, updates = model.apply(
                    variables, x, deterministic=False,
                    use_running_average=bn_frozen,
                    rngs={"dropout": step_rng}, mutable=["batch_stats"])
            else:
                pred = model.apply(variables, x, deterministic=False,
                                   rngs={"dropout": step_rng})
                updates = None
            loss = _loss(pred, y, w)
            return loss, (pred, updates)

        (loss, (pred, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        new_params_updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, new_params_updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state,
            batch_stats=(updates["batch_stats"] if updates else state.batch_stats))
        out_metrics = {"loss": loss}
        for name, fn in metrics.items():
            out_metrics[name] = fn(pred.astype(jnp.float32),
                                   y.astype(jnp.float32))
        return new_state, out_metrics

    def eval_step(state: TrainState, batch: dict):
        x, y, w = batch["x"], batch["y"], batch.get("w")
        pred = model.apply(_variables(state), x, deterministic=True,
                           use_running_average=True)
        out = {"loss": _loss(pred, y, w)}
        for name, fn in metrics.items():
            out[name] = fn(pred.astype(jnp.float32), y.astype(jnp.float32))
        return out

    if mesh is None:
        return StepFunctions(jax.jit(train_step, donate_argnums=(0,) if donate else ()),
                             jax.jit(eval_step), None)

    # Mesh path: batch over 'data', params per partition rules.  Shardings
    # are structural (don't depend on array values), so they're derived once
    # from an abstract state inside a cached closure keyed by jit itself:
    # in_shardings of the jitted function do the layout, and XLA inserts the
    # gradient psum over ICI exactly where TPUStrategy hid it.
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    metric_shardings = {"loss": repl, **{m: repl for m in metrics}}

    def _zero_shard(leaf, ns: NamedSharding) -> NamedSharding:
        """ZeRO-1 spec for one param-shaped optimizer leaf: additionally
        shard one axis over 'data' (when divisible).  An axis the TP rules
        already shard keeps its mesh axes and gains 'data' on top
        (``P(('model', 'data'))``) — e.g. a TP-sharded bias still splits its
        moments across the data replicas, which is the whole point of ZeRO."""
        if not zero_sharding or data_size <= 1 or not hasattr(leaf, "shape"):
            return ns
        spec = list(ns.spec) + [None] * (len(leaf.shape) - len(ns.spec))
        best, best_shard = None, 0
        for i, (s, d) in enumerate(zip(spec, leaf.shape)):
            axes = () if s is None else (s if isinstance(s, tuple) else (s,))
            prod = data_size
            for a in axes:
                prod *= mesh.shape[a]
            if d % prod == 0 and d >= prod and d // prod * data_size > best_shard:
                best, best_shard = i, d // prod * data_size
        if best is None:
            return ns
        s = spec[best]
        axes = () if s is None else (s if isinstance(s, tuple) else (s,))
        spec[best] = axes + ("data",) if axes else "data"
        return NamedSharding(mesh, P(*spec))

    def state_sharding_for(state: TrainState) -> TrainState:
        def to_sharding(spec_tree):
            return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                                is_leaf=lambda x: isinstance(x, P))
        param_shardings = to_sharding(partition_specs(state.params))
        # Optimizer moments (adam m/v, …) are param-shaped: shard them like
        # their params so TP keeps optimizer memory distributed too (plus
        # the 'data' axis under zero_sharding); non-param leaves (counts,
        # injected hyperparams) are replicated.
        try:
            opt_shardings = optax.tree_map_params(
                tx, _zero_shard, state.opt_state, param_shardings,
                transform_non_params=lambda _: repl)
        except Exception:
            opt_shardings = jax.tree.map(lambda _: repl, state.opt_state)
        return TrainState(
            step=repl,
            params=param_shardings,
            opt_state=opt_shardings,
            batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
            rng=repl)

    _cache: dict = {}
    data_size = mesh.shape["data"]

    def make(fn, key, is_train):
        def wrapped(state, batch):
            # a short remainder batch (drop_remainder=False eval loaders)
            # can't shard over 'data'; run it replicated — every device
            # computes the full small batch (one extra compile, correct
            # metrics) instead of crashing on indivisibility.
            leading = jax.tree.leaves(batch)[0].shape[0]
            divisible = leading % data_size == 0
            # batch structure (e.g. an optional 'w' sample-weight slot) is
            # part of the compiled signature — key the shardings on it too
            ckey = (key, divisible, tuple(sorted(batch)))
            if ckey not in _cache:
                ss = state_sharding_for(state)
                batch_sh = jax.tree.map(
                    lambda _: data if divisible else repl, batch)
                _cache[ckey] = jax.jit(
                    fn, in_shardings=(ss, batch_sh),
                    out_shardings=((ss, metric_shardings) if is_train
                                   else metric_shardings),
                    donate_argnums=(0,) if (is_train and donate) else ())
            return _cache[ckey](state, batch)
        return wrapped

    return StepFunctions(make(train_step, "train", True),
                         make(eval_step, "eval", False), state_sharding_for)
