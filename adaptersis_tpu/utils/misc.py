"""Misc training utilities (reference: root utils.py).

  * lars — the LARS optimizer used for DINO linear eval (utils.py:553-591)
  * clip_gradients — per-parameter norm clip (utils.py:132-141)
  * MultiCropWrapper — group same-resolution crops, single backbone fwd per group
    (utils.py:594-629)
  * PCA — retrieval whitening (utils.py:654-705)
  * compute_ap / compute_map — revisited-Oxford/Paris average precision
    (utils.py:708-812)
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lars(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0,
         eta: float = 0.001) -> optax.GradientTransformation:
    """LARS (utils.py:553-591): layerwise trust-ratio scaled SGD; 1-D params
    (biases/norms) skip weight decay and adaptation, like the reference."""

    def adapt(updates, params):
        def one(g, p):
            if p.ndim <= 1:
                return g
            g = g + weight_decay * p
            pn = jnp.linalg.norm(p)
            gn = jnp.linalg.norm(g)
            trust = jnp.where((pn > 0) & (gn > 0), eta * pn / gn, 1.0)
            return g * trust

        return jax.tree_util.tree_map(one, updates, params)

    def init_fn(params):
        return optax.trace(decay=momentum).init(params)

    def update_fn(updates, state, params):
        updates = adapt(updates, params)
        updates, state = optax.trace(decay=momentum).update(updates, state, params)
        lr = learning_rate if not callable(learning_rate) else learning_rate(getattr(state, "count", 0))
        return jax.tree_util.tree_map(lambda u: -lr * u, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def clip_gradients(grads, clip: float):
    """Per-parameter-tensor norm clipping (utils.py:132-141). Returns (clipped
    grads, per-leaf norms)."""

    def one(g):
        n = jnp.linalg.norm(g)
        factor = jnp.minimum(clip / (n + 1e-6), 1.0)
        return g * factor

    return jax.tree_util.tree_map(one, grads)


class MultiCropWrapper:
    """Run the backbone once per distinct crop resolution, concat outputs, then
    apply the head (utils.py:594-629)."""

    def __init__(self, backbone_fn: Callable, head_fn: Callable):
        self.backbone_fn = backbone_fn
        self.head_fn = head_fn

    def __call__(self, crops: Sequence[jax.Array]) -> jax.Array:
        sizes = [c.shape[1] for c in crops]
        outputs = []
        i = 0
        while i < len(crops):
            j = i
            while j < len(crops) and crops[j].shape[1] == sizes[i]:
                j += 1
            batch = jnp.concatenate(crops[i:j], axis=0)
            outputs.append(self.backbone_fn(batch))
            i = j
        return self.head_fn(jnp.concatenate(outputs, axis=0))


class PCA:
    """PCA whitening for retrieval (utils.py:654-705)."""

    def __init__(self, dim: int = 256, whit: float = 0.5):
        self.dim = dim
        self.whit = whit
        self.mean: Optional[np.ndarray] = None
        self.dvt: Optional[np.ndarray] = None

    def train_pca(self, cov: np.ndarray) -> None:
        d, v = np.linalg.eigh(cov)
        eps = d.max() * 1e-5
        n_0 = (d < eps).sum()
        if n_0 > 0:
            d[d < eps] = eps
        totenergy = d.sum()
        idx = np.argsort(d)[::-1][: self.dim]
        d = d[idx]
        v = v[:, idx]
        print(f"keeping {d.sum() / totenergy * 100.0:.2f} % of the energy")
        d = np.diag(1.0 / d ** self.whit)
        self.dvt = np.dot(d, v.T)

    def apply(self, x: np.ndarray) -> np.ndarray:
        if self.mean is not None:
            x = x - self.mean
        return np.dot(self.dvt, x.T).T


def compute_ap(ranks: np.ndarray, nres: int) -> float:
    """Average precision from positive ranks (utils.py:708-735)."""
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 0.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks: np.ndarray, gnd, kappas: Sequence[int] = ()) -> Tuple:
    """mAP + precision@k with junk handling (utils.py:738-812)."""
    mapv = 0.0
    nq = len(gnd)
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0
    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        try:
            qgndj = np.array(gnd[i]["junk"])
        except KeyError:
            qgndj = np.empty(0)
        pos = np.arange(ranks.shape[0])[np.in1d(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.in1d(ranks[:, i], qgndj)]
        k = 0
        ij = 0
        if len(junk):
            ip = 0
            while ip < len(pos):
                while ij < len(junk) and pos[ip] > junk[ij]:
                    k += 1
                    ij += 1
                pos[ip] = pos[ip] - k
                ip += 1
        ap = compute_ap(pos, len(qgnd))
        mapv += ap
        aps[i] = ap
        for j, kappa in enumerate(kappas):
            kq = min(max(pos), kappa)
            prs[i, j] = (pos < kq).sum() / kq
        pr = pr + prs[i, :]
    mapv = mapv / (nq - nempty)
    pr = pr / (nq - nempty)
    return mapv, aps, pr, prs
