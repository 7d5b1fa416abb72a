"""Golden parity: PreViT vs the reference `pre_vit` (backbones/engines.py:1-67,
imported read-only from /root/reference) with transplanted weights. The module
is unused by any reference trainer — this covers the API surface only."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from flax.core import freeze

from adaptersis_tpu.models.encoders import PreViT


def _load_ref_engines():
    spec = importlib.util.spec_from_file_location(
        "ref_engines", "/root/reference/backbones/engines.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_engines"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("flatten", [True, False])
def test_previt_matches_reference(flatten):
    refmod = _load_ref_engines()
    torch.manual_seed(0)
    ref = refmod.pre_vit(img_size=28, patch_size=7, in_chans=8, embed_dim=16,
                         norm_layer=torch.nn.LayerNorm,
                         flatten_embedding=flatten)
    ref.eval()

    x = np.random.default_rng(0).standard_normal((2, 8, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    if not flatten:
        # reference unflattens to (B, H', W', D) already (engines.py:57)
        assert want.shape == (2, 4, 4, 16)

    params = {
        "proj": {
            "kernel": ref.proj.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": ref.proj.bias.detach().numpy(),
        },
        "norm": {
            "scale": ref.norm.weight.detach().numpy(),
            "bias": ref.norm.bias.detach().numpy(),
        },
    }
    m = PreViT(patch_size=7, in_chans=8, embed_dim=16, use_norm=True,
               flatten_embedding=flatten)
    got = np.asarray(m.apply({"params": freeze(params)},
                             jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_previt_rejects_unaligned():
    import jax

    m = PreViT(patch_size=7, in_chans=3, embed_dim=8)
    with pytest.raises(AssertionError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 28, 3)))
