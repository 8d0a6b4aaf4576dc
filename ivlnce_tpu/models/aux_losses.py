"""Auxiliary-loss registry (reference: ivlnce_baselines/common/aux_losses.py
— a global singleton the models write into during forward and the trainer
reduces after).

JAX redesign: pure functions cannot mutate a global, so the canonical path
is functional — nets RETURN their aux terms and make_train_step combines
them (trainers/base_trainer.py). This registry exists for API parity and
for host-side composition of already-computed (scalar) loss values: the
same register/reduce surface, operating on concrete arrays outside jit.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


class _AuxLosses:
    def __init__(self):
        self._losses: Dict[str, jnp.ndarray] = {}
        self._loss_alphas: Dict[str, float] = {}
        self._is_active = False

    def clear(self) -> None:
        self._losses.clear()
        self._loss_alphas.clear()

    def register_loss(self, name: str, loss, alpha: float = 1.0) -> None:
        assert self.is_active()
        assert name not in self._losses
        self._losses[name] = loss
        self._loss_alphas[name] = alpha

    def get_loss(self, name: str):
        return self._losses[name]

    def reduce(self, mask) -> jnp.ndarray:
        assert self.is_active()
        total = jnp.zeros((), jnp.float32)
        mask = mask.reshape(-1)
        denom = jnp.clip(mask.sum(), 1e-6, None)
        for k in self._losses.keys():
            total = total + self._loss_alphas[k] * (
                (self._losses[k].reshape(-1) * mask).sum() / denom
            )
        return total

    def is_active(self) -> bool:
        return self._is_active

    def activate(self) -> None:
        self._is_active = True

    def deactivate(self) -> None:
        self._is_active = False


AuxLosses = _AuxLosses()
