"""Bit-equality of the (falsified-but-kept) fast non-overlapping max
pool against the ``nn.max_pool`` reference, forward AND backward —
including first-tie gradient routing on tie-heavy inputs.

``ops/pooling.py`` measured 9 % slower e2e on v5e and is NOT wired into
the model path (see its docstring); these tests keep the recorded
experiment honest: if anyone revives it, the torch-matching gradient
semantics (cotangent to the first row-major argmax only — what XLA's
``ge``-select select-and-scatter and ``torch.nn.MaxPool2d`` both do)
must still hold.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medsegpretrainimagenet_tpu.ops.pooling import (
    fast_max_pool, fast_max_pool_applicable)


def _cases():
    rng = np.random.default_rng(0)
    return [
        ("random", rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)),
        ("tie-heavy", np.maximum(
            rng.normal(-0.5, 1, (2, 8, 8, 3)), 0).astype(np.float32)),
        ("all-zero", np.zeros((2, 8, 8, 3), np.float32)),
        ("bf16", rng.normal(0, 1, (2, 16, 16, 4)).astype(np.float32)),
    ]


@pytest.mark.parametrize("name,x", _cases(), ids=[c[0] for c in _cases()])
@pytest.mark.parametrize("window", [(2, 2), (4, 2)])
def test_forward_and_backward_bit_equal(name, x, window):
    x = jnp.asarray(x, jnp.bfloat16 if name == "bf16" else jnp.float32)

    def ref(x):
        return nn.max_pool(x, window, window, "VALID")

    def fast(x):
        return fast_max_pool(x, window)

    np.testing.assert_array_equal(np.asarray(ref(x), np.float32),
                                  np.asarray(fast(x), np.float32))
    g = jnp.asarray(
        np.random.default_rng(1).normal(0, 1, ref(x).shape), x.dtype)
    gr = jax.vjp(ref, x)[1](g)[0]
    gf = jax.vjp(fast, x)[1](g)[0]
    np.testing.assert_array_equal(np.asarray(gr, np.float32),
                                  np.asarray(gf, np.float32))


def test_applicability_gate():
    assert fast_max_pool_applicable((4, 64, 64, 8), (2, 2), (2, 2), "VALID")
    # overlapping, padded, or indivisible cases must fall back
    assert not fast_max_pool_applicable((4, 64, 64, 8), (3, 3), (2, 2),
                                        "VALID")
    assert not fast_max_pool_applicable((4, 63, 64, 8), (2, 2), (2, 2),
                                        "VALID")
    assert not fast_max_pool_applicable((4, 64, 64, 8), (2, 2), (2, 2),
                                        "SAME")
    assert not fast_max_pool_applicable((64, 64, 8), (2, 2), (2, 2),
                                        "VALID")


def test_jit_under_jit():
    x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 8, 8, 3)),
                    jnp.float32)
    out = jax.jit(lambda x: fast_max_pool(x, (2, 2)))(x)
    assert out.shape == (2, 4, 4, 3)
