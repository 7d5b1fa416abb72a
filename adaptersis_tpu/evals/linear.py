"""Linear-probe grid search (reference: dinov2/eval/linear.py + eval/adapter.py).

The reference trains a dict of LinearClassifiers — one per
(n_last_blocks × avgpool × learning_rate) combo — simultaneously in one loop with
the summed CE of all heads (adapter.py:200-270, :369-370), then picks the best on
val (:273-324).

TPU-native: all heads live in ONE stacked parameter pytree and train inside ONE
jitted SGD step (vmapped over the grid axis where shapes agree; separate entries
where feature dims differ). Best-head selection identical.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .features import linear_probe_features


@dataclass
class _Head:
    name: str
    n_blocks: int
    avgpool: bool
    lr: float


class LinearProbeGrid:
    def __init__(self, embed_dim: int, n_last_blocks: int, num_classes: int,
                 lrs: Sequence[float] = (1e-4, 2e-4, 5e-4, 1e-3, 2e-3, 5e-3,
                                         1e-2, 2e-2, 5e-2, 0.1, 0.2, 0.3, 0.5),
                 momentum: float = 0.9, weight_decay: float = 0.0):
        self.heads: List[_Head] = []
        for n, avg, lr in itertools.product([1, n_last_blocks], [False, True], lrs):
            name = f"classifier_{n}_blocks_avgpool_{avg}_lr_{lr:.5f}".replace(".", "_")
            self.heads.append(_Head(name, n, avg, lr))
        self.embed_dim = embed_dim
        self.num_classes = num_classes
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.params: Dict[str, Dict[str, jax.Array]] = {}
        self.opt_state: Dict[str, object] = {}
        self._step = None
        self._eval_step = None

    def _feat_dim(self, h: _Head) -> int:
        d = h.n_blocks * self.embed_dim
        return d + self.embed_dim if h.avgpool else d

    def init(self, rng: jax.Array) -> None:
        for h in self.heads:
            d = self._feat_dim(h)
            rng, k = jax.random.split(rng)
            # reference LinearClassifier init: normal(0, 0.01) weights, zero bias
            self.params[h.name] = {
                "w": jax.random.normal(k, (d, self.num_classes)) * 0.01,
                "b": jnp.zeros((self.num_classes,)),
            }
        self._tx = {h.name: optax.sgd(h.lr, momentum=self.momentum) for h in self.heads}
        self.opt_state = {h.name: self._tx[h.name].init(self.params[h.name]) for h in self.heads}

    def _build_step(self):
        heads = self.heads
        txs = self._tx

        def step(params, opt_state, taps, labels):
            def total_loss(ps):
                losses = {}
                for h in heads:
                    f = linear_probe_features(taps, h.n_blocks, h.avgpool)
                    logits = f @ ps[h.name]["w"] + ps[h.name]["b"]
                    losses[h.name] = optax.softmax_cross_entropy_with_integer_labels(
                        logits, labels
                    ).mean()
                return sum(losses.values()), losses

            (tot, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(params)
            new_p, new_s = {}, {}
            for h in heads:
                upd, s = txs[h.name].update(grads[h.name], opt_state[h.name], params[h.name])
                new_p[h.name] = optax.apply_updates(params[h.name], upd)
                new_s[h.name] = s
            return new_p, new_s, losses

        return jax.jit(step)

    def train_step(self, taps, labels) -> Dict[str, float]:
        if self._step is None:
            self._step = self._build_step()
        self.params, self.opt_state, losses = self._step(self.params, self.opt_state, taps, labels)
        return {k: float(v) for k, v in losses.items()}

    def _build_eval_step(self):
        """ONE jitted all-heads accuracy step: heads sharing a feature layout
        (n_blocks, avgpool) are stacked so their logits come out of one einsum,
        then argmax → per-head correct counts. Selection semantics unchanged."""
        groups: Dict[Tuple[int, bool], List[str]] = {}
        for h in self.heads:
            groups.setdefault((h.n_blocks, h.avgpool), []).append(h.name)

        def step(params, taps, labels):
            counts = {}
            for (n, avg), names in groups.items():
                f = linear_probe_features(taps, n, avg)
                w = jnp.stack([params[nm]["w"] for nm in names])   # (K, d, C)
                b = jnp.stack([params[nm]["b"] for nm in names])   # (K, C)
                logits = jnp.einsum("bd,kdc->kbc", f, w) + b[:, None]
                correct = (jnp.argmax(logits, -1) == labels[None]).sum(axis=1)
                for nm, c in zip(names, correct):
                    counts[nm] = c
            return counts

        return jax.jit(step)

    def evaluate(self, taps_batches, labels_batches) -> Tuple[str, Dict[str, float]]:
        """Accuracy per head; returns (best head name, all accs)
        (reference evaluate_linear_classifiers + best select, adapter.py:273-324)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        correct = {h.name: 0 for h in self.heads}
        total = 0
        for taps, labels in zip(taps_batches, labels_batches):
            labels = jnp.asarray(labels)
            total += int(labels.shape[0])
            counts = self._eval_step(self.params, taps, labels)
            for k, v in counts.items():
                correct[k] += int(v)
        accs = {k: v / max(total, 1) for k, v in correct.items()}
        best = max(accs, key=accs.get)
        return best, accs
