"""LogitConv (lane-padded logit conv) must be indistinguishable from the
nn.Conv it replaces (reference decoders.py:163 `final_out` et al.): same param
pytree, same init draw, forward and gradients equal on CPU f32 up to
host-dependent FMA reduction order, and the bf16 path must match nn.Conv's
bf16 output exactly (the zero-padded output channels are sliced off before
any arithmetic touches them)."""

import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from adaptersis_tpu.models.decoders import LogitConv


@pytest.fixture(scope="module")
def setup():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 13, 64), jnp.float32)
    ref = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32,
                  param_dtype=jnp.float32)
    new = LogitConv(2, dtype=jnp.float32)
    params = ref.init(rng, x)
    return rng, x, ref, new, params


def test_param_pytree_and_init_match(setup):
    rng, x, ref, new, params = setup
    pn = new.init(rng, x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(pn)
    assert params["params"]["kernel"].shape == pn["params"]["kernel"].shape
    assert jnp.array_equal(params["params"]["kernel"], pn["params"]["kernel"])
    assert jnp.array_equal(params["params"]["bias"], pn["params"]["bias"])


def test_forward_and_grads_bit_identical(setup):
    # f32 tolerance is reduction-order noise, not bit-equality: the 2-channel
    # nn.Conv and the 128-padded conv take different XLA:CPU vectorization
    # paths, whose 576-term FMA contraction ORDER differs per-host (bit-equal
    # on the round-4 builder's AVX set, ~2e-7 apart on the round-5 host's).
    # The math is identical — zero output channels are sliced before any
    # arithmetic — and the bf16 test below stays strictly bit-exact.
    import numpy as np

    def close(a, b):
        # grads sum ~286 spatial terms → O(1e-5) order-noise on O(10) values;
        # a real padding bug (pad channels leaking into arithmetic) is O(1)
        return np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                          rtol=1e-4, atol=1e-5)

    _, x, ref, new, params = setup
    yr = ref.apply(params, x)
    yn = new.apply(params, x)
    assert yn.shape == yr.shape
    close(yr, yn)

    def loss_r(p):
        return jnp.sum(jnp.sin(ref.apply(p, x)))

    def loss_n(p):
        return jnp.sum(jnp.sin(new.apply(p, x)))

    gr = jax.grad(loss_r)(params)
    gn = jax.grad(loss_n)(params)
    jax.tree_util.tree_map(lambda a, b: close(a, b), gr, gn)


def test_bf16_path_matches(setup):
    _, x, _, _, params = setup
    refb = nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16,
                   param_dtype=jnp.float32)
    newb = LogitConv(2, dtype=jnp.bfloat16)
    yr = refb.apply(params, x)
    yn = newb.apply(params, x)
    assert yn.dtype == yr.dtype == jnp.bfloat16
    assert jnp.array_equal(yr.astype(jnp.float32), yn.astype(jnp.float32))


def test_odd_class_count_pads_and_slices():
    # num_classes > pad_to must degrade gracefully (pad = 0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 5, 8), jnp.float32)
    m = LogitConv(20, pad_to=16, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(3), x)
    assert m.apply(p, x).shape == (1, 5, 5, 20)
