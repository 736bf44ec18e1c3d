"""conv2d_banded_cin1 (dense banded-matmul form of the first conv) must
match the direct lax convolution exactly."""

import numpy as np
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
