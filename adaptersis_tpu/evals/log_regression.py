"""Logistic-regression C-sweep on frozen features (reference:
dinov2/eval/log_regression.py:38-440 — cuML/sklearn L-BFGS logreg over a grid of
inverse-regularization strengths C, best selected on val).

TPU-native: full-batch multinomial logistic regression fit with optax L-BFGS
inside jit, one fit per C (features usually fit in HBM whole)."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _fit_one(features: jax.Array, labels: jax.Array, num_classes: int, C: float,
             max_iter: int = 100) -> Tuple[jax.Array, jax.Array]:
    N, D = features.shape

    def loss_fn(params):
        logits = features @ params["w"] + params["b"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).sum()
        reg = 0.5 * jnp.sum(params["w"] ** 2)
        return ce + reg / C

    params = {"w": jnp.zeros((D, num_classes)), "b": jnp.zeros((num_classes,))}
    solver = optax.lbfgs()
    opt_state = solver.init(params)
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def body(carry, _):
        params, opt_state = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    (params, _), _ = jax.lax.scan(body, (params, opt_state), None, length=max_iter)
    return params["w"], params["b"]


def logreg_sweep(
    train_features: np.ndarray, train_labels: np.ndarray,
    val_features: np.ndarray, val_labels: np.ndarray,
    num_classes: int,
    Cs: Sequence[float] = tuple(float(c) for c in np.logspace(-4, 4, 9)),
    max_iter: int = 100,
) -> Tuple[float, Dict[float, float]]:
    """Returns (best C, {C: val accuracy})."""
    fit = jax.jit(lambda f, y, C: _fit_one(f, y, num_classes, C, max_iter),
                  static_argnums=())
    accs: Dict[float, float] = {}
    f = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels, jnp.int32)
    vf = jnp.asarray(val_features, jnp.float32)
    vy = jnp.asarray(val_labels, jnp.int32)
    for C in Cs:
        w, b = _fit_one(f, y, num_classes, float(C), max_iter)
        acc = float((jnp.argmax(vf @ w + b, -1) == vy).mean())
        accs[float(C)] = acc
    best = max(accs, key=accs.get)
    return best, accs
