"""Beam-sharded (cross-chip) search vs the single-device decoder.

Runs on the CPU-simulated 8-device mesh (conftest); the global merged
front each step is identical to the single-device decoder's, so the
decoded strings and scores must match.
"""

import numpy as np
import jax.numpy as jnp

from danspeech_tpu.decode.device_beam import ctc_beam_search_device
from danspeech_tpu.decode.dist_beam import ctc_beam_search_beam_sharded
from danspeech_tpu.parallel.mesh import make_mesh

LABELS = "_abcdefghijklmnopqrstuvwxyzæøåéü "


def test_beam_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    c = len(LABELS)
    b, t, w = 2, 18, 16
    probs = jnp.asarray(
        rng.dirichlet(np.ones(c) * 0.2, size=(b, t)).astype(np.float32)
    )
    lengths = jnp.asarray(np.array([t, 13], np.int32))

    mesh = make_mesh()  # 8x1 CPU mesh
    lab_s, tim_s, len_s, sc_s = ctc_beam_search_beam_sharded(
        probs, lengths, mesh, beam_width=w
    )
    lab_d, tim_d, len_d, sc_d = ctc_beam_search_device(
        probs, lengths, beam_width=w
    )

    # top half of the beam (clearly separated scores) must agree exactly
    k = w // 2
    np.testing.assert_allclose(
        np.asarray(sc_s)[:, :k], np.asarray(sc_d)[:, :k], rtol=1e-5, atol=1e-5
    )
    for row in range(b):
        for beam in range(k):
            n = int(np.asarray(len_d)[row, beam])
            assert int(np.asarray(len_s)[row, beam]) == n
            np.testing.assert_array_equal(
                np.asarray(lab_s)[row, beam, :n],
                np.asarray(lab_d)[row, beam, :n],
            )


def test_beam_sharded_lm_matches_single_device():
    """LM-fused cross-chip pruning == LM-fused single-device decode."""
    from danspeech_tpu.decode.device_lm import pack_device_lm
    from danspeech_tpu.decode.lm import NgramLM

    rng = np.random.default_rng(3)
    c = len(LABELS)
    space = LABELS.index(" ")
    b, t, w = 2, 20, 16

    lm = NgramLM(2)
    words = ["hej", "med", "dig", "tak", "nu"]
    for word in words:
        lm.add_ngram((word,), float(rng.uniform(-3, -0.5)), float(rng.uniform(-1, 0)))
    for _ in range(10):
        pair = tuple(words[i] for i in rng.integers(0, len(words), 2))
        lm.add_ngram(pair, float(rng.uniform(-2, -0.2)))
    dlm = pack_device_lm(lm, LABELS)

    # bias towards word chars + spaces so LM terms actually fire
    probs = rng.dirichlet(np.ones(c) * 0.3, size=(b, t))
    text = "hej med dig "
    for row in range(b):
        for ti in range(t):
            probs[row, ti, LABELS.index(text[(ti + row) % len(text)])] += 1.5
    probs /= probs.sum(-1, keepdims=True)
    probs = jnp.asarray(probs.astype(np.float32))
    lengths = jnp.asarray(np.array([t, 15], np.int32))

    mesh = make_mesh()
    kw = dict(beam_width=w, lm=dlm, alpha=1.1, beta=0.3, space=space)
    lab_s, _, len_s, sc_s = ctc_beam_search_beam_sharded(
        probs, lengths, mesh, **kw
    )
    lab_d, _, len_d, sc_d = ctc_beam_search_device(probs, lengths, **kw)

    k = w // 2
    np.testing.assert_allclose(
        np.asarray(sc_s)[:, :k], np.asarray(sc_d)[:, :k], rtol=1e-5, atol=1e-5
    )
    for row in range(b):
        for beam in range(k):
            n = int(np.asarray(len_d)[row, beam])
            assert int(np.asarray(len_s)[row, beam]) == n
            np.testing.assert_array_equal(
                np.asarray(lab_s)[row, beam, :n],
                np.asarray(lab_d)[row, beam, :n],
            )
