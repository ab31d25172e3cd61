"""Learning-rate schedules (per-epoch), reproducing the reference's recipes.

The reference uses two LR control mechanisms: ReduceLROnPlateau (TF notebook
cell 23 — see ``train/callbacks.py``) and an explicit ramp-up / sustain /
exponential-decay function driven by ``LearningRateScheduler``
(``TPUs_in_Colab.ipynb`` cell 33).  Both operate per *epoch*; the replica-
scaled peak (``max_lr = base * num_replicas``) mirrors cell 33.
"""
from __future__ import annotations

from typing import Callable

from vit_unet_tpu.train.callbacks import Callback


def rampup_exp_decay(
    start_lr: float = 1e-5,
    max_lr: float = 5e-5,
    min_lr: float = 1e-5,
    rampup_epochs: int = 5,
    sustain_epochs: int = 0,
    exp_decay: float = 0.8,
    replicas: int = 1,
) -> Callable[[int], float]:
    """epoch -> lr; linear ramp to ``max_lr * replicas``, optional sustain,
    then exponential decay toward ``min_lr`` (TPUs_in_Colab.ipynb cell 33)."""
    peak = max_lr * replicas

    def lrfn(epoch: int) -> float:
        if epoch < rampup_epochs:
            return (peak - start_lr) / rampup_epochs * epoch + start_lr
        if epoch < rampup_epochs + sustain_epochs:
            return peak
        return ((peak - min_lr)
                * exp_decay ** (epoch - rampup_epochs - sustain_epochs)
                + min_lr)

    return lrfn


class LearningRateScheduler(Callback):
    """Applies ``schedule(epoch)`` at the start of each epoch by setting the
    fitter's injected learning rate (keras ``LearningRateScheduler``
    equivalent).  Driven by ``on_epoch_begin`` so resumed runs
    (``fit(initial_epoch=fitter.resume())``) get the correct epoch's LR."""

    def __init__(self, schedule: Callable[[int], float], verbose: bool = False):
        self.schedule = schedule
        self.verbose = verbose

    def on_epoch_begin(self, fitter, epoch: int) -> None:
        lr = float(self.schedule(epoch))
        fitter.learning_rate = lr
        if self.verbose:
            print(f"LearningRateScheduler: epoch {epoch} lr={lr:.3g}",
                  flush=True)
