"""SpecAugment for training (Park et al. 2019) — jit-able, batched.

The reference keeps training in an external repo (docs_source/train.rst)
and ships no augmentation; this is part of the beyond-reference training
stack (SURVEY §5 "Training"). Masks are drawn per batch row from a JAX
PRNG key, so the op composes with pjit/data sharding (each row's masks
depend only on its fold of the key) and runs inside the jitted train
step — no host-side numpy mutation of the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    key: jax.Array,
    spect: jnp.ndarray,  # (B, F, T) log-spectrograms
    frame_lengths: jnp.ndarray,  # (B,) valid frames per row
    n_freq_masks: int = 2,
    freq_mask_width: int = 27,
    n_time_masks: int = 2,
    time_mask_ratio: float = 0.05,
    mask_value: float = 0.0,
) -> jnp.ndarray:
    """Apply SpecAugment frequency and time masks.

    Frequency masks: ``n_freq_masks`` bands of width U{0..freq_mask_width}.
    Time masks: ``n_time_masks`` spans of width U{0..ratio * row_length},
    placed inside each row's valid frames (padding is never "masked" into
    looking like data, and masks never exceed the valid region).
    """
    b, f, t = spect.shape
    lengths = frame_lengths.astype(jnp.int32)

    def mask_row(key, row, length):
        fkey, tkey = jax.random.split(key)
        # frequency masks
        fw_keys = jax.random.split(fkey, n_freq_masks)
        for k in range(n_freq_masks):
            wk, pk = jax.random.split(fw_keys[k])
            width = jax.random.randint(wk, (), 0, freq_mask_width + 1)
            # exclusive high bound must include the last valid placement
            # start == f - width (uniform over [0, f - width], per paper)
            start = jax.random.randint(
                pk, (), 0, jnp.maximum(f - width, 0) + 1
            )
            idx = jnp.arange(f)
            band = (idx >= start) & (idx < start + width)
            row = jnp.where(band[:, None], mask_value, row)
        # time masks (inside the valid region)
        max_w = jnp.maximum(
            (length.astype(jnp.float32) * time_mask_ratio).astype(jnp.int32),
            0,
        )
        tw_keys = jax.random.split(tkey, n_time_masks)
        for k in range(n_time_masks):
            wk, pk = jax.random.split(tw_keys[k])
            width = jax.random.randint(wk, (), 0, jnp.maximum(max_w, 0) + 1)
            start = jax.random.randint(
                pk, (), 0, jnp.maximum(length - width, 0) + 1
            )
            idx = jnp.arange(t)
            span = (idx >= start) & (idx < start + width) & (idx < length)
            row = jnp.where(span[None, :], mask_value, row)
        return row

    keys = jax.random.split(key, b)
    return jax.vmap(mask_row)(keys, spect, lengths)
