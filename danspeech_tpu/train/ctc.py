"""CTC loss (forward-backward in log space) for training.

The reference delegates training to an external repo; here CTC is
first-class so the framework can fine-tune and train (freeze_layers support,
model.py:553-597, implies it). Implementation is a jit/grad-friendly
alpha-recursion over an interleaved blank/label lattice, numerically in log
space — same algorithm class as torch.nn.CTCLoss, against which it is
tested.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def ctc_loss(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-example negative log-likelihood of the label sequences.

    logits: (B, T, C) unnormalized; logit_lengths: (B,); labels: (B, N)
    int32 (padded with anything); label_lengths: (B,).
    """
    batch, t_max, _ = logits.shape
    n_max = labels.shape[1]
    s_max = 2 * n_max + 1

    log_probs = jax.nn.log_softmax(logits, axis=-1)

    # Interleaved lattice: blank, l1, blank, l2, ..., blank
    lattice = jnp.full((batch, s_max), blank_id, dtype=labels.dtype)
    lattice = lattice.at[:, 1::2].set(labels)

    # allow-skip mask: alpha[s] may come from alpha[s-2] when lattice[s] is a
    # label differing from lattice[s-2]
    lat_prev2 = jnp.pad(lattice, ((0, 0), (2, 0)), constant_values=blank_id)[:, :s_max]
    can_skip = (lattice != blank_id) & (lattice != lat_prev2)
    s_idx = jnp.arange(s_max)[None, :]
    valid_s = s_idx < (2 * label_lengths[:, None] + 1)

    def emit(tstep):
        # (B, S) log prob of emitting lattice symbol s at time t
        return jnp.take_along_axis(log_probs[:, tstep], lattice, axis=1)

    alpha0 = jnp.full((batch, s_max), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(log_probs[:, 0, blank_id])
    first_label = jnp.where(
        n_max > 0,
        jnp.take_along_axis(
            log_probs[:, 0], lattice[:, 1:2], axis=1
        ).squeeze(1),
        _NEG_INF,
    )
    alpha0 = alpha0.at[:, 1].set(jnp.where(label_lengths > 0, first_label, _NEG_INF))
    alpha0 = jnp.where(valid_s, alpha0, _NEG_INF)

    def step(alpha, tstep):
        stay = alpha
        from1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :s_max]
        from2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :s_max]
        from2 = jnp.where(can_skip, from2, _NEG_INF)
        merged = jnp.logaddexp(jnp.logaddexp(stay, from1), from2) + emit(tstep)
        merged = jnp.where(valid_s, merged, _NEG_INF)
        # freeze past each row's logit length so final alpha reads out at T_b
        active = (tstep < logit_lengths)[:, None]
        new_alpha = jnp.where(active, merged, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, t_max))

    end = 2 * label_lengths  # final blank position
    last_blank = jnp.take_along_axis(alpha, end[:, None], axis=1).squeeze(1)
    last_label = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1
    ).squeeze(1)
    last_label = jnp.where(label_lengths > 0, last_label, _NEG_INF)
    return -jnp.logaddexp(last_blank, last_label)


def mean_ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id: int = 0):
    """Batch-mean CTC loss normalized per label length (torch 'mean' parity)."""
    nll = ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id)
    per = nll / jnp.maximum(label_lengths, 1)
    return jnp.mean(per)
