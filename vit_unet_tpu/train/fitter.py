"""Fitter — the framework's first-party trainer.

Owns what the reference delegated to external ``benatools``
(``TorchFitterBase``: epoch loop, best-checkpoint save/reload, history,
callbacks — SURVEY.md §1) and to Keras ``model.fit`` under TPUStrategy
(``ViT_UNet_TF_TPU.ipynb`` cell 23), rebuilt around jitted sharded steps:

* one compiled SPMD train step per (mesh, model) — no per-batch Python in the
  hot path beyond host->device feeding;
* best-checkpoint tracking with orbax (params + optimizer state + BN stats +
  step — full resume, unlike the reference's weights-only ``.h5``);
* callbacks: EarlyStopping / ReduceLROnPlateau / JSONL / wandb-from-env;
* the reference's LR x replicas convention available via ``scale_lr_by_replicas``.
"""
from __future__ import annotations

import math
import os
import time
from typing import Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_unet_tpu.parallel.mesh import replica_count
from vit_unet_tpu.parallel.train_step import TrainState, build_step_functions
from vit_unet_tpu.train import losses as losses_lib
from vit_unet_tpu.train import metrics as metrics_lib
from vit_unet_tpu.train.callbacks import Callback


def _as_loss(loss) -> Callable:
    return losses_lib.get_loss(loss) if isinstance(loss, str) else loss


def _as_metrics(metrics) -> dict:
    out = {}
    for m in metrics or ():
        if isinstance(m, str):
            out[m] = metrics_lib.get_metric(m)
        else:
            out[m.__name__] = m
    return out


class Fitter:
    def __init__(
        self,
        model,
        learning_rate: float = 1e-4,
        optimizer: str | optax.GradientTransformation = "adamw",
        loss: str | Callable = "mse",
        metrics: Sequence[str | Callable] = ("psnr",),
        mesh=None,
        scale_lr_by_replicas: bool = False,
        weight_decay: float = 0.0,
        checkpoint_dir: str = "models",
        monitor: str = "val_loss",
        mode: str = "min",
        seed: int = 42,
        gradient_clip_norm: Optional[float] = None,
        grad_accum_steps: int = 1,
        dispatch_depth: int = 8,
        zero_sharding: bool = False,
        bn_freeze_epochs: int = 0,
        bn_warmup: str = "freeze",
        bn_calib_batches: int = 4,
    ):
        """``gradient_clip_norm``: global-norm clipping before the optimizer
        update.  ``grad_accum_steps > 1``: accumulate that many micro-batch
        gradients before each parameter update (optax.MultiSteps) — the
        standard way to train at an effective batch the chip can't hold.

        ``dispatch_depth``: max train steps in flight before the host reads
        back the oldest step's metrics (a scalar D2H barrier).  JAX dispatch
        is async; an *unbounded* epoch (the naive loop) queues every step's
        donated buffers until the epoch-end sync, which degrades
        pathologically on remote/tunnelled backends and can pile up live
        donated state.  A small bound keeps the device saturated (dispatch
        overlaps device work) while the queue stays shallow.

        ``zero_sharding``: ZeRO-1 — shard optimizer moments over the mesh's
        'data' axis instead of replicating them (see
        ``parallel.train_step.build_step_functions``).  Per-chip optimizer
        memory drops by the replica count; params stay replicated.

        ``bn_freeze_epochs``: frozen→batch BN warmup.  The torch
        architecture's exact batch-stats BN (the head-mix BatchNorm inside
        re-attention, reference torch/model.py:136,159) cannot train from
        scratch — batch-stat normalisation feedback pins the optimiser at
        the init plateau (CONVERGENCE.json segmentation_demo, docs/PERF.md).
        With ``bn_freeze_epochs=K`` the first K epochs train with BN frozen
        at its running statistics (``use_running_average=True`` inside the
        train step — every compute path honors it: XLA, flash kernels, SP)
        so features form, then training flips to exact batch-stats
        semantics for the remaining epochs.  Same model, same parameter
        tree; eval semantics are identical in both phases (running
        averages).

        ``bn_warmup`` selects what happens at the flip:

        * ``'refold'`` (recommended) — stat-matched refold: at the flip,
          measure each head-mix BN's batch moments under the current
          parameters and fold them into the BN affine + running statistics
          (``train.bn_refold``) so the exact-semantics forward computes
          exactly the function the frozen phase trained — no normalisation
          shock.  The optimizer state is re-initialised at the flip (the
          refolded BN scales change by orders of magnitude, so stale Adam
          moments would mis-size their first updates); injected hyperparams
          (the live learning rate, incl. ReduceLROnPlateau adjustments)
          survive the reset, but a user-supplied ``optimizer`` transform
          with an internal optax schedule restarts that schedule from step
          0 at the flip.  Calibration reads the first ``bn_calib_batches``
          batches of the flip epoch (they are still trained on).
        * ``'freeze'`` — hard flip (kept as the explicit/legacy mode): the
          running stats never moved during the frozen phase, so the flip is
          a documented normalisation shock (CONVERGENCE.json
          segmentation_demo ``bn-hard-flip``).
        * ``'track'`` — tracking warmup: warmup epochs normalise with the
          running stats while updating them toward each batch's moments
          (``ViTUNetConfig.bn_track``), so the flip is continuous; the
          drift toward near-degenerate attention-map moments during warmup
          makes this train like exact-BN (poorly) — shipped for
          completeness and negative-control experiments."""
        self.model = model
        self.bn_freeze_epochs = int(bn_freeze_epochs)
        self.bn_calib_batches = int(bn_calib_batches)
        if bn_warmup not in ("freeze", "track", "refold"):
            raise ValueError(f"bn_warmup must be 'freeze', 'track' or "
                             f"'refold', got {bn_warmup!r}")
        self.bn_warmup = bn_warmup
        if (self.bn_freeze_epochs > 0
                and getattr(getattr(model, "config", None),
                            "flash_frozen_bn", False)):
            raise ValueError(
                "bn_freeze_epochs is a frozen→batch-stats warmup; the model "
                "is already permanently frozen (flash_frozen_bn=True) so "
                "there is nothing to flip to")
        if self.bn_warmup == "track" and self.bn_freeze_epochs > 0:
            cfg = getattr(model, "config", None)
            if cfg is None or not hasattr(cfg, "bn_track"):
                raise ValueError(
                    "bn_warmup='track' needs a model whose config carries "
                    "bn_track (ViTUNetConfig); use bn_warmup='freeze' for "
                    "other models")
        self.zero_sharding = zero_sharding
        self.mesh = mesh
        if scale_lr_by_replicas and mesh is not None:
            # the reference's convention: Adam(lr * REPLICAS) (nb cell 19)
            learning_rate = learning_rate * replica_count(mesh)
        self._lr = learning_rate
        if isinstance(optimizer, str):
            opt_fn = {"adam": optax.adam, "adamw": optax.adamw,
                      "sgd": optax.sgd}[optimizer]
            kwargs = {"weight_decay": weight_decay} if optimizer == "adamw" else {}
            # hyperparam_dtype MUST be pinned: by default inject_hyperparams
            # canonicalises hyperparams toward the params' dtype, and under
            # bf16 params b2=0.999 rounds to bf16(1.0) — the Adam bias
            # correction divides by (1 - b2^t) = 0 and every update is NaN
            # after the first step (found driving bf16 lite on the TPU)
            self.tx = optax.inject_hyperparams(
                opt_fn, hyperparam_dtype=jnp.float32)(
                learning_rate=learning_rate, **kwargs)
            self._injectable = True
        else:
            self.tx = optimizer
            self._injectable = False
        if gradient_clip_norm is not None:
            self.tx = optax.chain(
                optax.clip_by_global_norm(gradient_clip_norm), self.tx)
        if grad_accum_steps > 1:
            self.tx = optax.MultiSteps(self.tx, grad_accum_steps)
        self.dispatch_depth = max(1, int(dispatch_depth))
        self.loss_fn = _as_loss(loss)
        self.metric_fns = _as_metrics(metrics)
        self.checkpoint_dir = checkpoint_dir
        self.monitor, self.mode = monitor, mode
        self.seed = seed
        self.state: Optional[TrainState] = None
        self.steps = None
        self.history: dict[str, list] = {}
        self.stop_training = False
        self.best = math.inf if mode == "min" else -math.inf

    # -- state management ---------------------------------------------------

    def init_state(self, sample_batch: dict) -> TrainState:
        x = jnp.asarray(sample_batch["x"][:1])
        variables = jax.jit(self.model.init)(jax.random.key(self.seed), x)
        self.state = TrainState.create(
            params=variables["params"], tx=self.tx,
            batch_stats=variables.get("batch_stats", {}),
            rng=jax.random.key(self.seed + 1))
        self.steps = build_step_functions(
            self.model, self.tx, self.loss_fn, mesh=self.mesh,
            metrics=self.metric_fns, zero_sharding=self.zero_sharding)
        if self.bn_freeze_epochs > 0:
            if self.bn_warmup == "track":
                # TRACKING warmup: same parameter tree, the forward
                # normalises with running stats (frozen numerics) while the
                # running averages update toward each batch's moments
                # (nn/reattention.py bn_track) — so the epoch-K flip to
                # exact batch-stats semantics is a continuous change of the
                # forward function.  The hard frozen→exact flip is NOT
                # (stats stay at init during a frozen phase): it destroys
                # the warmed solution (CONVERGENCE.json segmentation_demo).
                import dataclasses
                track_model = self.model.clone(
                    config=dataclasses.replace(self.model.config,
                                               bn_track=True))
                self._frozen_steps = build_step_functions(
                    track_model, self.tx, self.loss_fn, mesh=self.mesh,
                    metrics=self.metric_fns,
                    zero_sharding=self.zero_sharding)
            else:
                # same model and parameter tree, frozen-BN train semantics
                # (use_running_average=True inside the train step); used for
                # the first bn_freeze_epochs epochs — eval always runs
                # running-average semantics via self.steps
                self._frozen_steps = build_step_functions(
                    self.model, self.tx, self.loss_fn, mesh=self.mesh,
                    metrics=self.metric_fns,
                    zero_sharding=self.zero_sharding, bn_frozen=True)
        else:
            self._frozen_steps = None
        return self.state

    @staticmethod
    def _find_hyperparams(opt_state):
        """The inject_hyperparams dict, looked up through optax wrappers
        (chain tuples, MultiSteps' inner_opt_state)."""
        if hasattr(opt_state, "hyperparams"):
            return opt_state.hyperparams
        if hasattr(opt_state, "inner_opt_state"):      # optax.MultiSteps
            return Fitter._find_hyperparams(opt_state.inner_opt_state)
        if isinstance(opt_state, (tuple, list)):       # optax.chain
            for s in opt_state:
                found = Fitter._find_hyperparams(s)
                if found is not None:
                    return found
        return None

    @property
    def learning_rate(self) -> float:
        if self._injectable and self.state is not None:
            hp = self._find_hyperparams(self.state.opt_state)
            if hp is not None:
                try:
                    return float(hp["learning_rate"])
                except (KeyError, TypeError):
                    pass
        return self._lr

    @learning_rate.setter
    def learning_rate(self, value: float) -> None:
        self._lr = value
        if self._injectable and self.state is not None:
            hp = self._find_hyperparams(self.state.opt_state)
            if hp is not None:
                hp["learning_rate"] = jnp.asarray(value, jnp.float32)

    # -- checkpointing ------------------------------------------------------

    def _ckpt_path(self, name: str) -> str:
        return os.path.abspath(os.path.join(self.checkpoint_dir, name))

    @property
    def _checkpointer(self):
        """One long-lived async orbax checkpointer.  A fresh instance per
        save would be GC'd while its background write thread still runs;
        a shared one also lets saves overlap training (see ``save``)."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def finalize_checkpoints(self) -> None:
        """Block until any in-flight async checkpoint write has committed."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()

    def save(self, name: str = "best-checkpoint",
             extra: Optional[dict] = None, block: bool = True) -> str:
        """Write a full-state checkpoint.  ``block=False`` returns once the
        arrays are copied off-device and lets the disk write proceed in a
        background thread (orbax async save) — the fit loop uses this so a
        save overlaps the next epoch's compute.  Donation safety: the D2H
        copy happens synchronously inside ``save``, so the training step is
        free to donate/overwrite the live state immediately after."""
        path = self._ckpt_path(name)
        ckptr = self._checkpointer
        ckptr.wait_until_finished()          # one in-flight save at a time
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "batch_stats": self.state.batch_stats,
                   "step": self.state.step,
                   "rng": jax.random.key_data(self.state.rng)}
        if extra:
            payload["extra"] = extra
        ckptr.save(path, payload, force=True)
        if block:
            ckptr.wait_until_finished()
        return path

    def _state_template(self) -> dict:
        """Restore template.  With a mesh, leaves are abstract arrays
        carrying the step functions' shardings, so orbax restores STRAIGHT
        INTO the sharded layout — elastic restart onto a different topology
        than the one that saved (and, multi-host, each process reads only
        its shards).  A concrete single-device template would come back
        committed to one device and be rejected by the train step's
        ``in_shardings``."""
        template = {"params": self.state.params,
                    "opt_state": self.state.opt_state,
                    "batch_stats": self.state.batch_stats,
                    "step": self.state.step,
                    "rng": jax.random.key_data(self.state.rng)}
        if self.mesh is None or self.steps is None:
            return template
        from jax.sharding import NamedSharding, PartitionSpec

        ss = self.steps.state_sharding(self.state)
        repl = NamedSharding(self.mesh, PartitionSpec())
        shardings = {"params": ss.params, "opt_state": ss.opt_state,
                     "batch_stats": ss.batch_stats, "step": repl,
                     "rng": repl}

        def abstract(x, s):
            x = jnp.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

        return {k: jax.tree.map(abstract, v, shardings[k])
                for k, v in template.items()}

    def _ckpt_has_extra(self, path: str) -> Optional[bool]:
        """Whether the checkpoint at ``path`` carries an 'extra' entry,
        decided from orbax metadata (no trial restore).  None = metadata
        unavailable (older orbax / partial write) — caller falls back to a
        narrowly-scoped trial."""
        try:
            meta = self._checkpointer.metadata(path)
            tree = getattr(getattr(meta, "item_metadata", None), "tree", None)
            if isinstance(tree, dict):
                return "extra" in tree
        except Exception:
            pass
        return None

    def load(self, name: str = "best-checkpoint",
             with_extra: bool = False):
        path = self._ckpt_path(name)
        self.finalize_checkpoints()          # don't read a half-written dir
        ckptr = self._checkpointer
        template = self._state_template()
        has_extra = self._ckpt_has_extra(path) if with_extra else False
        if with_extra and has_extra is not False:
            template = dict(template, extra={"epoch": 0, "best": 0.0})
        try:
            restored = ckptr.restore(path, template)
        except ValueError:
            # only the metadata-inconclusive case may retry without 'extra'
            # (checkpoint predates it); real restore failures — sharding /
            # shape / topology mismatches — propagate with their own error
            if has_extra is not None or "extra" not in template:
                raise
            template.pop("extra")            # checkpoint predates 'extra'
            restored = ckptr.restore(path, template)
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            batch_stats=restored["batch_stats"], step=restored["step"],
            rng=jax.random.wrap_key_data(restored["rng"]))
        if with_extra:
            return self.state, restored.get("extra")
        return self.state

    # -- preemption-safe resume (SURVEY.md §5: the reference has none) ------

    def resume(self, name: str = "last-checkpoint") -> int:
        """Restore full training state from a periodic checkpoint and return
        the epoch to continue from (0 if no checkpoint exists).  Requires
        ``init_state(sample_batch)`` first (the restore needs the state
        template).  Idiom::

            fitter.init_state(first_batch)
            start = fitter.resume()
            fitter.fit(data, n_epochs=N, save_last=True, initial_epoch=start)

        This is preemption-safe training — the elastic-recovery capability
        the reference lacks entirely (its best-only ``.h5``/``.bin``
        checkpoints carry no optimizer state or epoch counter)."""
        if not os.path.isdir(self._ckpt_path(name)):
            return 0
        if self.state is None:
            raise ValueError(
                "resume() needs the state template: call "
                "init_state(sample_batch) before resume()")
        _, extra = self.load(name, with_extra=True)
        if extra:
            self.best = float(extra.get("best", self.best))
            return int(extra.get("epoch", 0)) + 1
        return 0

    # -- training loop ------------------------------------------------------

    @staticmethod
    def _device_batch(batch: dict) -> dict:
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _run_eval(self, data: Iterable, max_steps: Optional[int]) -> dict:
        # per-batch means are aggregated weighted by batch size, so a short
        # final batch (drop_remainder=False loaders) contributes exactly its
        # share of samples instead of a full batch's worth
        agg: dict[str, list] = {}
        sizes: list[int] = []
        for i, batch in enumerate(data):
            if max_steps is not None and i >= max_steps:
                break
            db = self._device_batch(batch)
            sizes.append(int(jax.tree.leaves(db)[0].shape[0]))
            out = self.steps.eval_step(self.state, db)
            for k, v in out.items():
                agg.setdefault(k, []).append(float(v))
        if not agg:
            raise ValueError(
                "validation data yielded no batches — check batch_size vs "
                "dataset size (drop_remainder loaders silently drop short "
                "final batches)")
        w = np.asarray(sizes, np.float64)
        return {f"val_{k}": float(np.sum(np.asarray(v) * w) / np.sum(w))
                for k, v in agg.items()}

    def fit(
        self,
        train_data,
        val_data=None,
        n_epochs: int = 10,
        steps_per_epoch: Optional[int] = None,
        validation_steps: Optional[int] = None,
        callbacks: Sequence[Callback] = (),
        save_best: bool = True,
        save_last: bool = False,
        initial_epoch: int = 0,
        verbose: bool = True,
    ) -> dict:
        """train_data: an iterable (or callable returning an iterable) of
        {'x': ..., 'y': ...} batches.  Returns the history dict.

        ``save_last=True`` writes a full-state 'last-checkpoint' every epoch;
        pair with ``initial_epoch=fitter.resume()`` for preemption-safe
        restarts."""
        leftover = None   # (epoch_index, chained_iterator) for one-shot input
        if self.state is None:
            probe = train_data() if callable(train_data) else train_data
            probe_it = iter(probe)
            try:
                first = next(probe_it)
            except StopIteration:
                raise ValueError(
                    "train_data yielded no batches — check batch_size vs "
                    "dataset size (drop_remainder loaders produce nothing "
                    "when the dataset is smaller than one global batch)"
                ) from None
            self.init_state(first)
            if not callable(train_data) and probe_it is probe:
                # one-shot iterator: don't lose the probe batch — replay it
                # plus the rest for the first epoch
                import itertools
                leftover = (initial_epoch,
                            itertools.chain([first], probe_it))
        self.stop_training = False
        for cb in callbacks:
            cb.on_train_begin(self)

        for epoch in range(initial_epoch, n_epochs):
            t0 = time.time()
            for cb in callbacks:
                cb.on_epoch_begin(self, epoch)
            lr_this_epoch = self.learning_rate
            agg: dict[str, list] = {}
            if leftover is not None and leftover[0] == epoch:
                data = leftover[1]
            else:
                data = train_data() if callable(train_data) else train_data
            n_steps = 0
            # bounded dispatch queue: metrics from step i are read back
            # (scalar D2H barrier) once step i+depth has been dispatched,
            # overlapping host dispatch with device work without letting
            # donated buffers pile up unboundedly (see __init__ docstring)
            from collections import deque
            pending: deque = deque()
            if (self._frozen_steps is not None
                    and self.bn_warmup == "refold"
                    and epoch == self.bn_freeze_epochs):
                data = self._bn_refold_flip(data)
            train_step = (self._frozen_steps.train_step
                          if self._frozen_steps is not None
                          and epoch < self.bn_freeze_epochs
                          else self.steps.train_step)
            for i, batch in enumerate(data):
                if steps_per_epoch is not None and i >= steps_per_epoch:
                    break
                self.state, out = train_step(
                    self.state, self._device_batch(batch))
                n_steps += 1
                pending.append(out)
                if len(pending) > self.dispatch_depth:
                    old = pending.popleft()
                    for k, v in old.items():
                        agg.setdefault(k, []).append(float(v))
            while pending:
                old = pending.popleft()
                for k, v in old.items():
                    agg.setdefault(k, []).append(float(v))
            if n_steps == 0:
                raise ValueError(
                    f"train_data yielded no batches for epoch {epoch} — a "
                    "one-shot iterator is exhausted after its first epoch; "
                    "pass a callable returning a fresh iterable (or a "
                    "re-iterable like DataLoader) for multi-epoch training")
            logs = {k: float(np.mean([float(x) for x in v]))
                    for k, v in agg.items()}
            if val_data is not None:
                vd = val_data() if callable(val_data) else val_data
                logs.update(self._run_eval(vd, validation_steps))
            logs["epoch_time_s"] = round(time.time() - t0, 2)
            # the LR this epoch actually trained with (end-of-epoch callbacks
            # may already have mutated the live value for the NEXT epoch)
            logs["lr"] = lr_this_epoch

            monitored = logs.get(self.monitor, logs.get("loss"))
            if save_best and monitored is not None and (
                    monitored < self.best if self.mode == "min"
                    else monitored > self.best):
                self.best = monitored
                self.save(block=False)       # write overlaps the next epoch
                logs["checkpoint_saved"] = True
            if save_last:
                self.save("last-checkpoint", block=False,
                          extra={"epoch": epoch, "best": float(self.best)})

            for k, v in logs.items():
                self.history.setdefault(k, []).append(v)
            for cb in callbacks:
                cb.on_epoch_end(self, epoch, logs)
            if verbose:
                msg = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                               for k, v in logs.items())
                print(f"epoch {epoch + 1}/{n_epochs}: {msg}", flush=True)
            if self.stop_training:
                break

        self.finalize_checkpoints()          # commit any in-flight save
        for cb in callbacks:
            cb.on_train_end(self)
        return self.history

    def _bn_refold_flip(self, data):
        """Stat-matched refold at the frozen→exact flip (bn_warmup='refold'):
        measure each head-mix BN's batch moments on the first
        ``bn_calib_batches`` train batches, fold them into the BN affine +
        running statistics (``train.bn_refold`` — the exact-semantics
        forward then computes the same function the frozen phase trained),
        and re-initialise the optimizer state (the refolded BN scales shrink
        by orders of magnitude; stale Adam second moments would mis-size
        their first updates).  The calibration batches are chained back so
        the flip epoch still trains on them."""
        import itertools

        from vit_unet_tpu.train.bn_refold import (bn_refold,
                                                  estimate_bn_moments)
        it = iter(data)
        calib = list(itertools.islice(it, max(1, self.bn_calib_batches)))
        if not calib:
            raise ValueError("bn_warmup='refold' flip: train data yielded "
                             "no batches to calibrate on")
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        moments = estimate_bn_moments(
            self.model, variables, [self._device_batch(b) for b in calib])
        eps = float(getattr(getattr(self.model, "config", None),
                            "attn_bn_eps", 1e-5))
        params, stats = bn_refold(self.state.params, self.state.batch_stats,
                                  moments, eps=eps)
        fresh_opt = self.tx.init(params)
        # The reset wipes Adam moments on purpose, but it must NOT undo LR
        # adjustments made during the frozen phase (ReduceLROnPlateau writes
        # into the inject_hyperparams dict, which tx.init re-creates at the
        # constructor LR).  Carry the live hyperparams over.  A user-supplied
        # tx with an *internal* optax schedule is different: its step count
        # lives next to the Adam moments, and restoring it onto zeroed
        # moments would corrupt the bias correction — so the flip restarts
        # such schedules from step 0 (documented in the fit() docstring).
        old_hp = self._find_hyperparams(self.state.opt_state)
        new_hp = self._find_hyperparams(fresh_opt)
        if old_hp is not None and new_hp is not None:
            for key, value in old_hp.items():
                new_hp[key] = value
        self.state = self.state.replace(params=params, batch_stats=stats,
                                        opt_state=fresh_opt)
        return itertools.chain(calib, it)

    def evaluate(self, data, max_steps: Optional[int] = None) -> dict:
        return self._run_eval(data() if callable(data) else data, max_steps)

    def predict(self, x) -> jnp.ndarray:
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        return self.model.apply(variables, jnp.asarray(x),
                                deterministic=True, use_running_average=True)
