"""The single trainer — replaces the reference's nine ~80%-identical entry scripts
(train.py / train_mla.py / train_multi_class.py / eval/*.py, SURVEY §1) with one
loop parameterized by (arch, decoder, dataset, loss).

TPU-first structure:
  * ONE jitted train step: on-device augmentation → fused segmentor forward
    (backbone streams + adapters + decoder in one XLA program) → loss → grads of
    the trainable subtree only → SGD update. Donated state buffers.
  * GSPMD data parallelism: batch sharded over the mesh "data" axis, trainables
    replicated; gradient all-reduce and SyncBN statistics are XLA-inserted
    collectives over ICI (reference: DDP + SyncBatchNorm + NCCL).
  * frozen ViT params can be FSDP-sharded over the "fsdp" axis.

Reference recipe preserved: SGD(momentum=0.99, wd=3e-5) on adapters+encoder+
decoder, CosineAnnealingLR stepped per epoch (train.py:178-192), Softmax→DC dice
train loss (train.py:424-428), weighted-CE[0.1,10]+dice+acc1 validation
(train.py:616-647).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.augment import apply_input_norm, train_augment, val_preprocess
from ..losses import LOSSES, ch_iou, dc_loss, isi_iou, pixel_accuracy, weighted_ce_pair
from ..models.segmentor import AdapterSegmentor
from ..parallel.mesh import fsdp_shard_params, get_mesh, replicate_tree, shard_batch
from .schedules import cosine_annealing


def _xla_opts() -> Optional[Dict[str, str]]:
    """Optional XLA compiler-option overrides for the fused train step.

    ASN_XLA_OPTS="flag=val;flag=val" — forwarded as PJRT compiler_options
    (local XLA_FLAGS parsing rejects TPU flags on this image; options passed
    at compile time travel with the remote-compile request instead)."""
    import os

    raw = os.environ.get("ASN_XLA_OPTS", "")
    if not raw:
        return None
    return dict(kv.split("=", 1) for kv in raw.split(";") if "=" in kv)


@dataclass
class TrainerConfig:
    lr: float = 0.01
    epochs: int = 100
    momentum: float = 0.99
    weight_decay: float = 3e-5
    loss: str = "dc"
    trainer_softmax: bool = True   # reference applies Softmax before DC (train.py:424)
    use_clahe: bool = True
    fsdp: int = 1
    seed: int = 0
    train_backbone: bool = False   # True for the setr_ete end-to-end variant
    msda_impl: str = "gather"      # deformable-attention impl (model must match)
    # "none" | "imagenet_div255" (masktrans variant parity — data/augment.py)
    input_norm: str = "none"
    # store the frozen backbone in the model's compute dtype (bf16 on TPU):
    # numerically identical (flax casts params to `dtype` at every use anyway),
    # halves the frozen tree's HBM and kills a per-step fp32→bf16 convert pass.
    # pos_embed stays fp32 — vit.py:95 reads it back in fp32 for interpolation.
    precast_frozen: bool = True


class Trainer:
    def __init__(self, model: AdapterSegmentor, config: TrainerConfig,
                 mesh=None, pretrained_backbone: Optional[Dict[str, Any]] = None):
        self.model = model
        self.cfg = config
        self.mesh = mesh if mesh is not None else get_mesh(fsdp=config.fsdp)
        self.lr_fn = cosine_annealing(config.lr, config.epochs)
        self.loss_fn = LOSSES[config.loss]
        self._pretrained_backbone = pretrained_backbone
        self._train_step = None
        self._eval_step = None

    # ---- state ----

    def init_state(self, sample_batch: Tuple[np.ndarray, np.ndarray]) -> Dict[str, Any]:
        imgs, _ = sample_batch
        x = jnp.zeros(imgs.shape[:3] + (3,), jnp.float32)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            jax.random.PRNGKey(self.cfg.seed), x, train=False
        )
        params = dict(variables["params"])
        if self._pretrained_backbone is not None:
            params["backbone"] = jax.tree_util.tree_map(jnp.asarray, self._pretrained_backbone)
        if self.cfg.train_backbone:
            frozen = {}
        else:
            frozen = {"backbone": params.pop("backbone")}
            cdt = getattr(self.model, "dtype", jnp.float32)
            if self.cfg.precast_frozen and cdt != jnp.float32:
                def cast(path, p):
                    if p.dtype != jnp.float32 or any(
                        getattr(k, "key", None) == "pos_embed" for k in path
                    ):
                        return p
                    return p.astype(cdt)
                frozen = jax.tree_util.tree_map_with_path(cast, frozen)
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = {
            "params": params,
            "frozen": frozen,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "epoch": jnp.zeros((), jnp.int32),
            "best_acc": jnp.zeros((), jnp.float32),
        }
        return self.shard_state(state)

    def shard_state(self, state: Dict[str, Any]) -> Dict[str, Any]:
        state = dict(state)
        for k in ("params", "batch_stats", "opt_state", "epoch", "best_acc"):
            state[k] = replicate_tree(state[k], self.mesh)
        state["frozen"] = fsdp_shard_params(state["frozen"], self.mesh)
        return state

    @functools.cached_property
    def tx(self) -> optax.GradientTransformation:
        # torch SGD semantics: g += wd*p, buf = mom*buf + g, p -= lr*buf
        return optax.chain(
            optax.add_decayed_weights(self.cfg.weight_decay),
            optax.trace(decay=self.cfg.momentum),
            optax.scale(-1.0),
        )

    # ---- steps ----

    def _build_train_step(self):
        cfg = self.cfg
        model = self.model
        loss_fn = self.loss_fn
        tx = self.tx

        def step(state, images_u8, masks, rng, lr):
            aug_imgs, aug_masks = train_augment(
                images_u8, masks, rng, use_clahe=cfg.use_clahe
            )
            aug_imgs = apply_input_norm(aug_imgs, cfg.input_norm)

            def loss_of(params):
                variables = {
                    "params": {**params, **state["frozen"]},
                    "batch_stats": state["batch_stats"],
                }
                logits, mut = model.apply(
                    variables, aug_imgs, train=True, mutable=["batch_stats"]
                )
                out = jax.nn.softmax(logits, axis=-1) if cfg.trainer_softmax else logits
                return loss_fn(out, aug_masks), mut["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(loss_of, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + lr * u, state["params"], updates
            )
            new_state = {**state, "params": new_params, "opt_state": new_opt,
                         "batch_stats": new_stats}
            return new_state, loss

        data_sh = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        return jax.jit(
            step,
            in_shardings=(None, data_sh, data_sh, rep, rep),
            donate_argnums=(0,),
            compiler_options=_xla_opts(),
        )

    def _build_eval_step(self):
        model = self.model

        def step(state, images_u8, masks, valid):
            x = apply_input_norm(val_preprocess(images_u8), self.cfg.input_norm)
            variables = {
                "params": {**state["params"], **state["frozen"]},
                "batch_stats": state["batch_stats"],
            }
            logits = model.apply(variables, x, train=False)
            C = logits.shape[-1]
            v = valid.astype(jnp.float32)
            nv = jnp.maximum(v.sum(), 1.0)

            def wmean(per_sample):
                # padded duplicate rows (valid=0) are excluded from the average
                return jnp.sum(per_sample * v) / nv

            # per-sample metrics, masked-averaged. dc_loss takes RAW logits — it
            # softmaxes internally, matching the reference validation which feeds
            # logits straight to DC (train.py:617-618, single softmax).
            if C == 2:
                loss_ps = jax.vmap(lambda l, m: weighted_ce_pair(l[None], m[None]))
            else:
                loss_ps = jax.vmap(lambda l, m: jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(l, m)))
            dice_ps = jax.vmap(lambda l, m: 1.0 - dc_loss(l[None], m[None]))
            acc_ps = jax.vmap(lambda l, m: pixel_accuracy(l[None], m[None]))
            preds = jnp.argmax(logits, axis=-1)
            metrics = {
                "loss": wmean(loss_ps(logits, masks)),
                "dice": wmean(dice_ps(logits, masks)),
                "acc1": wmean(acc_ps(logits, masks)),
            }
            if C > 2:
                # EndoVis challenge metrics, per image then averaged
                # (train_multi_class.py:587-597, segloss/iou_multi.py:51-88)
                metrics["ch_iou"] = wmean(jax.vmap(
                    lambda t, p: ch_iou(t, p, num_classes=C))(masks, preds))
                metrics["isi_iou"] = wmean(jax.vmap(isi_iou)(masks, preds))
            return metrics, preds

        data_sh = NamedSharding(self.mesh, P("data"))
        return jax.jit(step, in_shardings=(None, data_sh, data_sh, data_sh))

    # ---- public API ----

    def train_step(self, state, images_u8: np.ndarray, masks: np.ndarray,
                   rng, epoch: int):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        images_u8, masks = shard_batch((images_u8, masks), self.mesh)
        lr = jnp.asarray(self.lr_fn(epoch), jnp.float32)
        return self._train_step(state, images_u8, masks, rng, lr)

    def eval_step(self, state, images_u8: np.ndarray, masks: np.ndarray,
                  valid: Optional[np.ndarray] = None):
        """valid (B,) bool marks real rows; padded duplicates (added to reach a
        device-count multiple) carry valid=False and are excluded from metrics."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        if valid is None:
            valid = np.ones((np.shape(images_u8)[0],), bool)
        images_u8, masks, valid = shard_batch((images_u8, masks, np.asarray(valid)),
                                              self.mesh)
        return self._eval_step(state, images_u8, masks, valid)
