"""conv2d_banded_cin1 (dense banded-matmul form of the first conv) must
match the direct lax convolution exactly."""

import numpy as np
import pytest
import jax.numpy as jnp

from danspeech_tpu.ops.conv import conv2d, conv2d_banded_cin1


def test_banded_matches_direct_conv1():
    rng = np.random.default_rng(0)
    b, f, t = 3, 161, 97
    x = jnp.asarray(rng.normal(size=(b, 1, f, t)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 1, 41, 11)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=32).astype(np.float32))

    ref = conv2d(x, w, bias, (2, 2), (20, 5))
    got = conv2d_banded_cin1(x, w, bias, (2, 2), (20, 5))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_banded_other_shapes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 1, 80, 50)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 1, 11, 7)).astype(np.float32) * 0.1)
    ref = conv2d(x, w, None, (2, 1), (5, 3))
    got = conv2d_banded_cin1(x, w, None, (2, 1), (5, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,f,t",
    [(32, 32, 81, 401), (32, 96, 41, 401), (32, 32, 80, 100), (3, 8, 33, 57)],
)
def test_s2d_freq_conv_matches_direct(cin, cout, f, t):
    """Freq-only space-to-depth stride-(2,1) conv == direct conv — the
    conv2/conv3 candidate (ops/conv.py:conv2d_s2d_freq), odd and even
    freq sizes, including both flagship layer shapes."""
    from danspeech_tpu.ops.conv import conv2d, conv2d_s2d_freq

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, cin, f, t)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(cout, cin, 21, 11)).astype(np.float32) * 0.05
    )
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    direct = np.asarray(conv2d(x, w, b, (2, 1), (10, 5)))
    s2d = np.asarray(conv2d_s2d_freq(x, w, b, (2, 1), (10, 5)))
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(s2d, direct, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("f,t", [(161, 801), (161, 800), (160, 333), (81, 100)])
def test_s2d_conv_matches_direct(f, t):
    """Space-to-depth C_in=1 stride-(2,2) conv == direct conv for odd and
    even input sizes (the production conv_block dispatch for conv1)."""
    import jax.numpy as jnp

    from danspeech_tpu.ops.conv import conv2d, conv2d_s2d_cin1

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 1, f, t)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 1, 41, 11)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    direct = np.asarray(conv2d(x, w, b, (2, 2), (20, 5)))
    s2d = np.asarray(conv2d_s2d_cin1(x, w, b, (2, 2), (20, 5)))
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(s2d, direct, rtol=0, atol=2e-4)
