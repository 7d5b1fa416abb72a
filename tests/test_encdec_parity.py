"""Golden parity: FeatureEncoder / FeatureDecoder vs the actual reference modules
with transplanted weights (eval mode — SyncBatchNorm behaves as BatchNorm when not
in a process group)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from adaptersis_tpu.models.decoders import FeatureDecoder
from adaptersis_tpu.models.encoders import FeatureEncoder


def _load(name, path, package: bool = False):
    spec = importlib.util.spec_from_file_location(
        name, path, submodule_search_locations=["/root/reference/backbones"] if package else None)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_ref_decoders():
    import types

    pkg = types.ModuleType("refbb")
    pkg.__path__ = ["/root/reference/backbones"]
    sys.modules.setdefault("refbb", pkg)
    if "refbb.unet_parts" not in sys.modules:
        _load("refbb.unet_parts", "/root/reference/backbones/unet_parts.py")
    return _load("refbb.decoders", "/root/reference/backbones/decoders.py")


def _conv(ref):
    d = {"kernel": ref.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if ref.bias is not None:
        d["bias"] = ref.bias.detach().numpy()
    return d


def _bn(ref):
    return (
        {"scale": ref.weight.detach().numpy(), "bias": ref.bias.detach().numpy()},
        {"mean": ref.running_mean.detach().numpy(), "var": ref.running_var.detach().numpy()},
    )


def test_feature_encoder_matches_reference():
    refmod = _load("ref_encoders", "/root/reference/backbones/encoders.py")
    torch.manual_seed(0)
    ref = refmod.FeatureEncoder(inplanes=8, embed_dim=16)
    ref.eval()
    # randomize BN stats so the test is not trivially mean-0/var-1
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    H = W = 112
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        c1w, c2w, c3w, c4w = ref(torch.from_numpy(x))

    ours = FeatureEncoder(inplanes=8, embed_dim=16)
    params, stats = {}, {}
    stem = list(ref.stem)
    for i, (ci, bi) in enumerate([(0, 1), (3, 4), (6, 7)], start=1):
        p, s = _bn(stem[bi])
        params[f"stem{i}"] = {"conv": _conv(stem[ci]), "bn": p}
        stats[f"stem{i}"] = {"bn": s}
    for name, seq in [("conv2", ref.conv2), ("conv3", ref.conv3), ("conv4", ref.conv4)]:
        p, s = _bn(seq[1])
        params[name] = {"conv": _conv(seq[0]), "bn": p}
        stats[name] = {"bn": s}
    for name, mod in [("fc1", ref.fc1), ("fc2", ref.fc2), ("fc3", ref.fc3), ("fc4", ref.fc4)]:
        params[name] = _conv(mod)

    c1, c2, c3, c4, shapes = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    # reference c1 stays NCHW spatial; c2..c4 are flattened tokens
    np.testing.assert_allclose(np.asarray(c1).transpose(0, 3, 1, 2), c1w.numpy(),
                               rtol=2e-4, atol=2e-4)
    for got, want in [(c2, c2w), (c3, c3w), (c4, c4w)]:
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4)


def test_feature_decoder_matches_reference():
    refmod = _load_ref_decoders()
    torch.manual_seed(1)
    ref = refmod.FeatureDecoder(num_classes=2, features=[16, 12, 10, 8, 6])
    ref.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 48, 9, 9)).astype(np.float32)  # 3×16 channels
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = FeatureDecoder(num_classes=2, features=(16, 12, 10, 8, 6))
    params, stats = {}, {}
    for i in range(1, 5):
        seq = getattr(ref, f"decoder_{i}")
        p, s = _bn(seq[1])
        params[f"decoder_{i}"] = {"conv": _conv(seq[0]), "bn": p}
        stats[f"decoder_{i}"] = {"bn": s}
    params["final_out"] = _conv(ref.final_out)

    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
