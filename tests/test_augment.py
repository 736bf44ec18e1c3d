"""SpecAugment (train/augment.py): mask shapes, length respect, jit/PRNG
semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from danspeech_tpu.train.augment import spec_augment


@pytest.fixture()
def batch():
    rng = np.random.default_rng(0)
    spect = jnp.asarray(rng.normal(size=(3, 20, 50)).astype(np.float32) + 5.0)
    lengths = jnp.asarray([50, 32, 10], jnp.int32)
    return spect, lengths


def test_masks_only_zero_regions(batch):
    spect, lengths = batch
    out = np.asarray(
        spec_augment(jax.random.PRNGKey(0), spect, lengths, mask_value=0.0)
    )
    src = np.asarray(spect)
    changed = out != src
    # every changed cell was set to the mask value
    assert np.all(out[changed] == 0.0)
    # something was masked somewhere (p(all widths 0) is negligible)
    assert changed.any()


def test_time_masks_respect_lengths(batch):
    spect, lengths = batch
    out = np.asarray(
        spec_augment(
            jax.random.PRNGKey(1), spect, lengths,
            n_freq_masks=0, n_time_masks=4, time_mask_ratio=0.5,
        )
    )
    src = np.asarray(spect)
    for b, ln in enumerate(np.asarray(lengths)):
        # no change past the valid region
        np.testing.assert_array_equal(out[b, :, ln:], src[b, :, ln:])


def test_deterministic_per_key_and_jittable(batch):
    spect, lengths = batch
    f = jax.jit(spec_augment, static_argnames=())
    a = np.asarray(f(jax.random.PRNGKey(7), spect, lengths))
    b = np.asarray(f(jax.random.PRNGKey(7), spect, lengths))
    c = np.asarray(f(jax.random.PRNGKey(8), spect, lengths))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_freq_mask_band_is_contiguous(batch):
    spect, lengths = batch
    out = np.asarray(
        spec_augment(
            jax.random.PRNGKey(3), spect, lengths,
            n_freq_masks=1, n_time_masks=0, mask_value=-123.0,
        )
    )
    for b in range(out.shape[0]):
        masked_rows = np.where((out[b] == -123.0).all(axis=1))[0]
        if masked_rows.size:
            assert np.array_equal(
                masked_rows,
                np.arange(masked_rows[0], masked_rows[-1] + 1),
            )
