"""SSL meta-architecture — DINOv2 student/teacher pretraining
(reference: dinov2/train/ssl_meta_arch.py + dinov2/train/train.py).

Reference structure: student & teacher ModuleDicts {backbone, dino_head
[, ibot_head]} (:31-121); forward_backward computes the DINO cls loss over
(2 global × local) crop pairs, the iBOT masked-patch loss on global crops with
mask-token substitution, and the KoLeo regularizer (:157-345); the teacher is an
EMA of the student (:357+); FSDP wraps each submodule (:391+).

TPU redesign: ONE jitted train step carries {student, teacher, centers, opt_state}
as a functional state; the teacher EMA and the center EMAs are plain tree_maps
inside the same XLA program (the reference's async all_reduce center update and
torch._foreach EMA become fused collectives/elementwise ops). FSDP → param
sharding over the mesh's fsdp axis via the same fsdp_shard_params rule.

Simplifications vs the reference, documented:
  * DINO global pairs exclude same-view (student crop i vs teacher crop i),
    locals pair with both teacher globals — the standard DINO scheme.
  * iBOT uses the same-crop teacher patch targets (as dinov2 does).
  * koleo is computed on the global-batch student cls (the reference computes it
    per rank; per-shard application under shard_map would match exactly).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.vit import DinoVisionTransformer
from ..parallel.mesh import fsdp_shard_params, get_mesh, replicate_tree
from .heads import DINOHead
from .losses import (dino_loss, ibot_patch_loss, ibot_patch_loss_masked,
                     koleo_loss, softmax_center_teacher, update_center,
                     update_center_masked)
from .masking import MaskInfo


@dataclass
class SSLConfig:
    dino_out_dim: int = 65536
    ibot_out_dim: int = 65536
    ibot_separate_head: bool = False
    head_hidden_dim: int = 2048
    head_bottleneck_dim: int = 256
    student_temp: float = 0.1
    center_momentum: float = 0.9
    dino_loss_weight: float = 1.0
    ibot_loss_weight: float = 1.0
    koleo_loss_weight: float = 0.1
    n_local_crops: int = 8
    # ONE attention call over [2 global | k·local] crops via flash segment ids
    # — the reference's NestedTensorBlock/BlockDiagonalMask packing
    # (dinov2/layers/block.py:161-260); numerically identical to separate
    # forwards (test_ssl_packed_crops_match_separate)
    packed_crops: bool = True
    lr: float = 4e-3
    weight_decay: float = 0.04
    adamw_beta1: float = 0.9
    adamw_beta2: float = 0.999
    layerwise_decay: float = 0.9
    patch_embed_lr_mult: float = 0.2


class SSLMetaArch:
    def __init__(self, backbone: DinoVisionTransformer, cfg: SSLConfig = SSLConfig(),
                 mesh=None):
        self.backbone = backbone
        self.cfg = cfg
        # GSPMD data parallelism over the mesh "data" axis — the reference's
        # multi-GPU FSDP flagship path (dinov2/train/ssl_meta_arch.py:391+);
        # batch stats (loss means, center EMAs) become XLA-inserted collectives
        self.mesh = mesh if mesh is not None else get_mesh()
        self.dino_head = DINOHead(cfg.dino_out_dim, cfg.head_hidden_dim, cfg.head_bottleneck_dim)
        self.ibot_head = (
            DINOHead(cfg.ibot_out_dim, cfg.head_hidden_dim, cfg.head_bottleneck_dim)
            if cfg.ibot_separate_head else None
        )
        self._step_fns = {}

    # ---- parameter plumbing ----

    def init_state(self, rng: jax.Array, global_hw: int, local_hw: int) -> Dict[str, Any]:
        kb, kd, ki = jax.random.split(rng, 3)
        xg = jnp.zeros((1, global_hw, global_hw, 3))
        bb = self.backbone.init(kb, xg)["params"]
        dh = self.dino_head.init(kd, jnp.zeros((1, self.backbone.embed_dim)))["params"]
        student = {"backbone": bb, "dino_head": dh}
        if self.ibot_head is not None:
            student["ibot_head"] = self.ibot_head.init(
                ki, jnp.zeros((1, self.backbone.embed_dim)))["params"]
        teacher = jax.tree_util.tree_map(jnp.array, student)
        opt_state = self.tx.init(student)
        # FSDP (reference dinov2/fsdp/__init__.py:22-54 FULL_SHARD per
        # submodule): student, teacher AND the Adam moments shard over the
        # mesh's fsdp axis; XLA inserts the all-gathers before each layer use
        # and reduce-scatters for the grads. Centers/step stay replicated.
        # With fsdp=1 (the mesh default) fsdp_shard_params replicates — the
        # pure-DP path is unchanged.
        state = {
            "student": fsdp_shard_params(student, self.mesh),
            "teacher": fsdp_shard_params(teacher, self.mesh),
            "opt_state": fsdp_shard_params(opt_state, self.mesh),
            **replicate_tree({
                "dino_center": jnp.zeros((1, self.cfg.dino_out_dim)),
                "ibot_center": jnp.zeros((1, 1, self.cfg.ibot_out_dim)),
                "step": jnp.zeros((), jnp.int32),
            }, self.mesh),
        }
        return state

    def shard_state(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Re-apply init_state's shardings to a restored (host) state tree —
        the resume half of the FSDPCheckpointer contract
        (dinov2/fsdp/__init__.py:118-141 resume_or_load)."""
        return {
            "student": fsdp_shard_params(state["student"], self.mesh),
            "teacher": fsdp_shard_params(state["teacher"], self.mesh),
            "opt_state": fsdp_shard_params(state["opt_state"], self.mesh),
            **replicate_tree(
                {k: state[k] for k in ("dino_center", "ibot_center", "step")},
                self.mesh),
        }

    @property
    def tx(self) -> optax.GradientTransformation:
        cfg = self.cfg
        # Adam moments only: weight decay is applied PER STEP with the scheduled
        # value inside the train step (dinov2/train/train.py:141-148 sets wd on
        # every param group each iteration; a fixed add_decayed_weights here
        # would freeze it at the epoch-0 value)
        return optax.scale_by_adam(b1=cfg.adamw_beta1, b2=cfg.adamw_beta2)

    def wd_mask(self, params) -> Any:
        """No weight decay for bias / norm / gamma / tokens (param_groups.py:41-79)."""
        def leaf_mask(path, x):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            nd = x.ndim > 1
            banned = any(t in name for t in ("bias", "norm", "gamma", "cls_token",
                                             "pos_embed", "mask_token", "last_layer_g"))
            return nd and not banned

        return jax.tree_util.tree_map_with_path(leaf_mask, params)

    def lr_multipliers(self, params) -> Any:
        """Layerwise lr decay by block index + patch_embed multiplier
        (dinov2/utils/param_groups.py:13-38)."""
        depth = self.backbone.depth
        decay = self.cfg.layerwise_decay

        def mult(path, x):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if not name.startswith("backbone"):
                return 1.0
            if "patch_embed" in name or "cls_token" in name or "pos_embed" in name or "mask_token" in name:
                m = decay ** (depth + 1)
                return m * (self.cfg.patch_embed_lr_mult if "patch_embed" in name else 1.0)
            for i in range(depth):
                if f"blocks_{i}/" in name + "/":
                    return decay ** (depth - i)
            return 1.0  # final norm

        return jax.tree_util.tree_map_with_path(mult, params)

    # ---- forward pieces ----

    def _backbone_fwd(self, params, x, masks=None):
        out = self.backbone.apply({"params": params}, x, masks=masks,
                                  method=self.backbone.forward_with_masks)
        return out  # dict with x_norm_clstoken, x_norm_patchtokens

    def _dino_head_fwd(self, params, x):
        return self.dino_head.apply({"params": params}, x)

    def _ibot_head_fwd(self, student_or_teacher, x):
        if self.ibot_head is None:
            return self._dino_head_fwd(student_or_teacher["dino_head"], x)
        return self.ibot_head.apply({"params": student_or_teacher["ibot_head"]}, x)

    # ---- the fused train step ----

    def build_train_step(self, gathered: bool = False):
        cfg = self.cfg

        def step(state, global_crops, local_crops, masks, lr, wd, momentum,
                 teacher_temp, last_layer_lr):
            """global_crops: (2B, S, S, 3); local_crops: (nB, s, s, 3);
            masks: (2B, N_tokens) bool, or a MaskInfo carrying the gathered
            masked-token plumbing (the reference collate's mask_indices_list /
            masks_weight, collate.py:37-48)."""
            B2 = global_crops.shape[0]
            sg = jax.lax.stop_gradient
            masks_bool = masks.masks if gathered else masks

            def gather_masked(patch_tokens):
                # the reference's upperbound-buffer index_select
                # (ssl_meta_arch.py:169-181, 252-260): the 65536-wide iBOT head
                # runs on the ~15% masked rows, not all 2B·N tokens — on TPU
                # this also keeps the (U, K) f32 logits/softmax tensors ~6×
                # smaller with a STATIC row count
                flat = patch_tokens.reshape(-1, patch_tokens.shape[-1])
                return jnp.take(flat, masks.indices, axis=0)

            # ---- teacher targets (no grad) ----
            t_out = self._backbone_fwd(state["teacher"]["backbone"], global_crops)
            t_cls = t_out["x_norm_clstoken"]                       # (2B, E)
            t_patch = t_out["x_norm_patchtokens"]                  # (2B, N, E)
            t_dino = self._dino_head_fwd(state["teacher"]["dino_head"], t_cls)
            t_dino_sm = sg(softmax_center_teacher(t_dino, state["dino_center"], teacher_temp))
            if gathered:
                t_ibot = self._ibot_head_fwd(state["teacher"], gather_masked(t_patch))
                t_ibot_sm = sg(softmax_center_teacher(
                    t_ibot, state["ibot_center"][0], teacher_temp))
            else:
                t_ibot = self._ibot_head_fwd(state["teacher"], t_patch)
                t_ibot_sm = sg(softmax_center_teacher(t_ibot, state["ibot_center"], teacher_temp))

            def loss_fn(student):
                if (cfg.packed_crops and local_crops.shape[0]
                        and local_crops.shape[0] % global_crops.shape[0] == 0):
                    # globals+locals in one packed attention program
                    s_out, l_out = self.backbone.apply(
                        {"params": student["backbone"]}, global_crops,
                        local_crops, masks=masks_bool,
                        method=self.backbone.forward_packed_crops)
                else:
                    # student globals WITH mask-token substitution (iBOT)
                    s_out = self._backbone_fwd(student["backbone"], global_crops, masks=masks_bool)
                    l_out = self._backbone_fwd(student["backbone"], local_crops)
                s_cls = s_out["x_norm_clstoken"]
                s_patch = s_out["x_norm_patchtokens"]
                s_dino_g = self._dino_head_fwd(student["dino_head"], s_cls)
                s_dino_l = self._dino_head_fwd(student["dino_head"], l_out["x_norm_clstoken"])

                g1, g2 = jnp.split(s_dino_g, 2, axis=0)
                t1, t2 = jnp.split(t_dino_sm, 2, axis=0)
                n_local = max(cfg.n_local_crops, 1)
                # globals: cross-view only
                loss_dino = dino_loss([g1], [t2], cfg.student_temp) + \
                    dino_loss([g2], [t1], cfg.student_temp)
                loss_dino = loss_dino / 2.0
                # locals vs both teacher globals
                locals_list = jnp.split(s_dino_l, n_local, axis=0) if local_crops.shape[0] else []
                if locals_list:
                    loss_dino = loss_dino + dino_loss(locals_list, [t1, t2], cfg.student_temp) / (
                        2 * n_local)

                if gathered:
                    s_ibot = self._ibot_head_fwd(student, gather_masked(s_patch))
                    loss_ibot = ibot_patch_loss_masked(
                        s_ibot, t_ibot_sm, masks.weights, B2, cfg.student_temp)
                else:
                    s_ibot = self._ibot_head_fwd(student, s_patch)
                    loss_ibot = ibot_patch_loss(s_ibot, t_ibot_sm, masks_bool, cfg.student_temp)

                loss_koleo = sum(
                    koleo_loss(c) for c in jnp.split(s_cls, 2, axis=0)
                )

                total = (cfg.dino_loss_weight * loss_dino
                         + cfg.ibot_loss_weight * loss_ibot
                         + cfg.koleo_loss_weight * loss_koleo)
                return total, {"dino": loss_dino, "ibot": loss_ibot, "koleo": loss_koleo}

            (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["student"])
            updates, new_opt = self.tx.update(grads, state["opt_state"], state["student"])
            mults = self.lr_multipliers(state["student"])
            wd_mask = self.wd_mask(state["student"])

            def apply_upd(path, p, u, m, decay):
                # torch AdamW semantics with per-group lr multiplier and the
                # SCHEDULED weight decay: p ← p − lr_g·adam_u − lr_g·wd·p
                name = "/".join(str(k.key) for k in path if hasattr(k, "key"))
                eff_lr = (last_layer_lr if "last_layer" in name else lr) * m
                return p - eff_lr * u - jnp.where(decay, eff_lr * wd, 0.0) * p

            new_student = jax.tree_util.tree_map_with_path(
                apply_upd, state["student"], updates, mults, wd_mask,
            )
            new_teacher = jax.tree_util.tree_map(
                lambda t, s: t * momentum + s * (1 - momentum),
                state["teacher"], new_student,
            )
            # iBOT center EMA over MASKED teacher head outputs only
            # (ibot_patch_loss.py:129-151; rounds 1-4 averaged over ALL patch
            # tokens — ~85% of them unmasked — pulling the center toward the
            # unmasked-token distribution the loss never sees; fixed round 5)
            if gathered:
                ibot_center = update_center_masked(
                    state["ibot_center"][0], t_ibot, masks.weights,
                    masks.n_masked, cfg.center_momentum)[None]
            else:
                m = masks_bool.astype(jnp.float32)[..., None]
                bc = (t_ibot.astype(jnp.float32) * m).sum(axis=(0, 1),
                                                          keepdims=False)
                bc = bc[None] / jnp.maximum(m.sum(), 1.0)
                ibot_center = (state["ibot_center"][0] * cfg.center_momentum
                               + bc * (1 - cfg.center_momentum))[None]
            new_state = {
                **state,
                "student": new_student,
                "teacher": new_teacher,
                "opt_state": new_opt,
                "dino_center": update_center(state["dino_center"], t_dino, cfg.center_momentum),
                "ibot_center": ibot_center,
                "step": state["step"] + 1,
            }
            return new_state, {"total_loss": total, **parts}

        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sh = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        # MaskInfo: the bool masks ride the data axis with the crops; the
        # gathered-token indices/weights index the GLOBAL flat token space, so
        # they stay replicated (worst case XLA all-gathers the (2B·N, E)
        # pre-head patch tokens — ~12 MB bf16 at the reference config, noise
        # next to the head compute it saves)
        masks_sh = (MaskInfo(masks=data_sh, indices=rep, weights=rep,
                             n_masked=rep) if gathered else data_sh)
        return jax.jit(
            step,
            in_shardings=(None, data_sh, data_sh, masks_sh) + (rep,) * 5,
            donate_argnums=(0,),
        )

    def train_step(self, state, global_crops, local_crops, masks, schedules, it: int):
        gathered = isinstance(masks, MaskInfo)
        if self._step_fns.get(gathered) is None:
            self._step_fns[gathered] = self.build_train_step(gathered)
        return self._step_fns[gathered](
            state, global_crops, local_crops, masks,
            jnp.float32(schedules["lr"][it]), jnp.float32(schedules["wd"][it]),
            jnp.float32(schedules["momentum"][it]),
            jnp.float32(schedules["teacher_temp"][it]),
            jnp.float32(schedules["last_layer_lr"][it]),
        )
