"""Loss zoo golden tests vs torch/numpy re-derivations of the reference formulas
(segloss/*, SURVEY.md §2.5)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from adaptersis_tpu import losses as L

RNG = np.random.default_rng(7)
B, H, W, C = 2, 12, 10, 3
LOGITS = RNG.standard_normal((B, H, W, C), dtype=np.float32)
LABELS = RNG.integers(0, C, size=(B, H, W)).astype(np.int32)
JL, JY = jnp.asarray(LOGITS), jnp.asarray(LABELS)
TL = torch.from_numpy(LOGITS).permute(0, 3, 1, 2)  # NCHW for torch oracles
TY = torch.from_numpy(LABELS.astype(np.int64))


def torch_dc(output, target, nb_classes):
    """segloss/dice.py DC math (softmax inside, eps 10e-20)."""
    p = torch.softmax(output, 1)
    y = torch.zeros_like(p).scatter_(1, target.unsqueeze(1), 1)
    intersect = (p * y).sum((2, 3))
    dice = 2 * intersect / (p.sum((2, 3)) + y.sum((2, 3)) + 10e-20)
    return (1 - dice.mean()).item()


def test_dc_loss():
    got = float(L.dc_loss(JL, JY))
    want = torch_dc(TL, TY, C)
    assert abs(got - want) < 1e-5


def test_soft_dice_matches_nnunet_math():
    p = torch.softmax(TL, 1)
    y = torch.zeros_like(p).scatter_(1, TY.unsqueeze(1), 1)
    tp = (p * y).sum((2, 3))
    fp = (p * (1 - y)).sum((2, 3))
    fn = ((1 - p) * y).sum((2, 3))
    want = -((2 * tp + 1) / (2 * tp + fp + fn + 1)).mean().item()
    got = float(L.soft_dice_loss(JL, JY, apply_nonlin=L.softmax_cl))
    assert abs(got - want) < 1e-5


def test_tversky_and_asym_and_iou():
    p = torch.softmax(TL, 1)
    y = torch.zeros_like(p).scatter_(1, TY.unsqueeze(1), 1)
    tp = (p * y).sum((2, 3)); fp = (p * (1 - y)).sum((2, 3)); fn = ((1 - p) * y).sum((2, 3))
    want_tv = -((tp + 1) / (tp + 0.3 * fp + 0.7 * fn + 1)).mean().item()
    want_iou = -((tp + 1) / (tp + fp + fn + 1)).mean().item()
    wgt = (1.5 ** 2) / (1 + 1.5 ** 2)
    want_asym = -((tp + 1) / (tp + wgt * fn + (1 - wgt) * fp + 1)).mean().item()
    assert abs(float(L.tversky_loss(JL, JY, apply_nonlin=L.softmax_cl)) - want_tv) < 1e-5
    assert abs(float(L.iou_nnunet_loss(JL, JY, apply_nonlin=L.softmax_cl)) - want_iou) < 1e-5
    assert abs(float(L.asym_loss(JL, JY, apply_nonlin=L.softmax_cl)) - want_asym) < 1e-5


def test_crossentropy_nd_matches_torch():
    want = F.cross_entropy(TL, TY).item()
    got = float(L.crossentropy_nd(JL, JY))
    assert abs(got - want) < 1e-5


def test_weighted_ce_pair_matches_torch():
    logits2 = RNG.standard_normal((B, H, W, 2), dtype=np.float32)
    labels2 = RNG.integers(0, 2, size=(B, H, W)).astype(np.int32)
    tl = torch.from_numpy(logits2).permute(0, 3, 1, 2)
    ty = torch.from_numpy(labels2.astype(np.int64))
    want = F.cross_entropy(tl, ty, weight=torch.tensor([0.1, 10.0])).item()
    got = float(L.weighted_ce_pair(jnp.asarray(logits2), jnp.asarray(labels2)))
    assert abs(got - want) < 1e-4


def test_topk_loss_matches_torch():
    want_all = F.cross_entropy(TL, TY, reduction="none").view(-1)
    k = int(want_all.numel() * 10 / 100)
    want = torch.topk(want_all, k, sorted=False)[0].mean().item()
    got = float(L.topk_loss(JL, JY, k=10))
    assert abs(got - want) < 1e-5


def test_focal_loss_matches_reference_math():
    p = torch.softmax(TL, 1).permute(0, 2, 3, 1).reshape(-1, C)
    lab = TY.view(-1)
    one_hot = torch.zeros_like(p).scatter_(1, lab[:, None], 1)
    sm = 1e-5
    one_hot = torch.clamp(one_hot, sm / (C - 1), 1 - sm)
    pt = (one_hot * p).sum(1) + sm
    want = (-torch.pow(1 - pt, 2.0) * pt.log()).mean().item()
    got = float(L.focal_loss(L.softmax_cl(JL), JY))
    assert abs(got - want) < 1e-5


def test_lovasz_matches_reference_math():
    p = torch.softmax(TL, 1).permute(0, 2, 3, 1).reshape(-1, C)
    lab = TY.view(-1)
    losses = []
    for c in range(C):
        tc = (lab == c).float()
        err = (tc - p[:, c]).abs()
        es, idx = torch.sort(err, 0, descending=True)
        ts = tc[idx]
        gts = ts.sum()
        inter = gts - ts.cumsum(0)
        union = gts + (1 - ts).cumsum(0)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append(torch.dot(es, jac))
    want = torch.stack(losses).mean().item()
    got = float(L.lovasz_softmax(L.softmax_cl(JL), JY))
    assert abs(got - want) < 1e-4


def test_gdice_matches_reference_math():
    p = torch.softmax(TL, 1)
    y = torch.zeros_like(p).scatter_(1, TY.unsqueeze(1), 1)
    w = 1 / (y.sum((2, 3)) + 1e-10) ** 2
    inter = w * (p * y).sum((2, 3))
    union = w * (p.sum((2, 3)) + y.sum((2, 3)))
    want = (-2 * (inter.sum(1) + 1e-5) / (union.sum(1) + 1e-5)).mean().item()
    got = float(L.gdice_loss(JL, JY, apply_nonlin=L.softmax_cl))
    assert abs(got - want) < 1e-5


def test_iou_multi_metrics():
    yt = np.zeros((6, 6), np.int32)
    yt[:3, :3] = 1
    yt[4:, 4:] = 3
    yp = np.zeros((6, 6), np.int32)
    yp[:3, :2] = 1
    yp[4:, 4:] = 2

    def np_iou(a, b):
        inter = (a & b).sum()
        union = a.sum() + b.sum() - inter
        return (inter + 1e-6) / (union + 1e-6)

    # ch_iou: classes present in yt = {1, 3}
    want_ch = np.mean([np_iou(yt == 1, yp == 1), np_iou(yt == 3, yp == 3)])
    got_ch = float(L.ch_iou(jnp.asarray(yt), jnp.asarray(yp)))
    assert abs(got_ch - want_ch) < 1e-5
    # isi_iou: classes present in either = {1, 2, 3}
    want_isi = np.mean([np_iou(yt == c, yp == c) for c in (1, 2, 3)])
    got_isi = float(L.isi_iou(jnp.asarray(yt), jnp.asarray(yp)))
    assert abs(got_isi - want_isi) < 1e-5
    # empty-gt edge cases
    assert float(L.ch_iou(jnp.zeros((4, 4), jnp.int32), jnp.zeros((4, 4), jnp.int32))) == 1.0
    assert float(L.ch_iou(jnp.zeros((4, 4), jnp.int32), jnp.ones((4, 4), jnp.int32))) == 0.0


def test_hausdorff_dt_loss_matches_reference_math():
    from scipy.ndimage import distance_transform_edt as sedt

    pred = (RNG.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)
    target = (RNG.uniform(size=(2, 16, 16)) > 0.5).astype(np.float32)

    def field(img):
        out = np.zeros_like(img)
        for i in range(len(img)):
            fg = img[i] > 0.5
            if fg.any():
                out[i] = sedt(fg) + sedt(~fg)
        return out

    pe = (pred - target) ** 2
    dist = field(pred) ** 2 + field(target) ** 2
    want = (pe * dist).mean()
    got = float(L.hausdorff_dt_loss(jnp.asarray(pred), jnp.asarray(target)))
    assert abs(got - want) < 1e-4


def test_all_registry_losses_finite():
    for name, fn in L.LOSSES.items():
        labels = JY if name not in ("iou_multi",) else jnp.asarray(LABELS % C)
        v = float(fn(JL, labels))
        assert np.isfinite(v), name
