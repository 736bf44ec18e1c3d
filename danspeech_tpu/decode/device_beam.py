"""On-device (jit) vectorized CTC prefix beam search.

TPU-native counterpart of the host beam decoders (decode/beam.py Python
oracle and native/ctcbeam C++): the whole batch decodes in one XLA program
— no per-utterance host loop, no device->host probability transfer — so it
composes with pjit data parallelism (batch rows sharded over the mesh) and
keeps the TPU busy between acoustic batches.

Algorithm (frame-synchronous prefix beam search, reference ctcdecode
semantics, decoder.py:96-144):

- beam state per (batch, beam): log_pb / log_pnb, last char, and a pair of
  32-bit rolling prefix hashes (TPU has no native 64-bit ints; two
  independent multiplicative hashes make collisions vanishingly rare);
- each step expands W beams x C classes into structured candidates
  (blank / repeat-merge -> same prefix; extension -> child prefix),
  sorts candidates by hash pair (lexicographic two-key sort), merges
  duplicates with a segmented log-sum-exp (associative scan with
  boundary resets), and keeps the top W by total probability;
- per-step parent/char bookkeeping is stored (T, B, W) and the winning
  label sequences + emission times are reconstructed by backtracking.

LM fusion runs on device too (SURVEY §2.2 N2/N3): pass a
decode.device_lm.DeviceLM and word-boundary scores are probed from
HBM-resident n-gram hash tables inside the scan step — see
decode/device_lm.py. This decoder is also the building block the
distributed (beam-sharded) pruning rides on (decode/dist_beam.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-1e30)

# multiplicative rolling-hash constants (odd, well-mixed 32-bit)
_H1_MUL = np.uint32(0x9E3779B1)
_H2_MUL = np.uint32(0x85EBCA77)


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = jnp.where(mx > NEG_INF / 2, mx + jnp.log1p(jnp.exp(mn - mx)), NEG_INF)
    return safe


def _segmented_logsumexp2(values1, values2, starts):
    """Log-sum-exp of TWO value streams over runs of a sorted axis in one
    fused segmented scan; results land on each run's first element, later
    elements get NEG_INF.

    values*: (..., N) f32; starts: (..., N) bool marking run starts.

    Implemented as a right-to-left segmented scan: in reversed order the
    reset flags are the runs' *ends* (= the element before the next run
    start), so the original run-start element — scanned last within its
    run — accumulates the full run. Fusing pb and pnb halves the scan
    passes (they share the run structure).
    """
    ends = jnp.concatenate(
        [starts[..., 1:], jnp.ones_like(starts[..., :1])], axis=-1
    )

    def combine(a, b):
        av1, av2, af = a
        bv1, bv2, bf = b
        v1 = jnp.where(bf, bv1, _logaddexp(av1, bv1))
        v2 = jnp.where(bf, bv2, _logaddexp(av2, bv2))
        return v1, v2, af | bf

    rev = lambda x: jnp.flip(x, axis=-1)
    v1, v2, _ = jax.lax.associative_scan(
        combine, (rev(values1), rev(values2), rev(ends)), axis=-1
    )
    acc1, acc2 = rev(v1), rev(v2)
    neg = jnp.full_like(acc1, NEG_INF)
    return jnp.where(starts, acc1, neg), jnp.where(starts, acc2, neg)


def expand_candidates(pb, pnb, last, h1, h2, lp_t, blank, parent_offset=0,
                      ext_bonus=None):
    """Expand W beams x C classes into flat candidate arrays.

    Returns (h1, h2, pb, pnb, parent, char), each (B, W*(C+1)) — the
    merged front's ``last`` char is reconstructed by the caller from
    (parent, char), so it does not ride the candidate sort.
    ``parent_offset`` shifts the recorded parent indices — the beam-sharded
    decoder passes each shard's global offset so backtrack pointers stay
    global after the cross-chip merge. ``ext_bonus`` (B, W, C), if given,
    is added to every extension candidate's log-probability — the LM
    word-boundary bonus lands on the space column (decode/device_lm.py).
    """
    batch, w = pb.shape
    num_classes = lp_t.shape[-1]
    total = _logaddexp(pb, pnb)  # (B, W)

    # 1) stay on the same prefix: blank from anywhere + repeat of the last
    #    char without an intervening blank.
    lp_blank = lp_t[:, blank][:, None]  # (B, 1)
    lp_last = jnp.take_along_axis(
        lp_t, jnp.clip(last, 0, num_classes - 1), axis=-1
    )  # (B, W)
    stay_pb = total + lp_blank
    stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

    # 2) extend with char c: from total, except c == last extends only
    #    from pb (the repeat-after-blank path).
    base = total[:, :, None] + lp_t[:, None, :]  # (B, W, C)
    rep = pb[:, :, None] + lp_t[:, None, :]
    is_last = jnp.arange(num_classes)[None, None, :] == last[:, :, None]
    ext_pnb = jnp.where(is_last, rep, base)  # (B, W, C)
    if ext_bonus is not None:
        ext_pnb = ext_pnb + ext_bonus
    ext_pnb = ext_pnb.at[:, :, blank].set(NEG_INF)

    # candidate keys
    cls = jnp.arange(num_classes, dtype=jnp.uint32)
    eh1 = h1[:, :, None] * _H1_MUL + (cls[None, None, :] + 1)
    eh2 = h2[:, :, None] * _H2_MUL + (cls[None, None, :] + 1)
    ext_last = jnp.broadcast_to(
        jnp.arange(num_classes, dtype=jnp.int32)[None, None, :],
        (batch, w, num_classes),
    )
    local_ids = parent_offset + jnp.arange(w, dtype=jnp.int32)
    parent = jnp.broadcast_to(
        local_ids[None, :, None], (batch, w, num_classes)
    )

    # flatten: [stay candidates (W)] + [extend candidates (W*C)]
    cand_h1 = jnp.concatenate([h1, eh1.reshape(batch, -1)], axis=1)
    cand_h2 = jnp.concatenate([h2, eh2.reshape(batch, -1)], axis=1)
    cand_pb = jnp.concatenate(
        [stay_pb, jnp.full((batch, w * num_classes), NEG_INF)], axis=1
    )
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(batch, -1)], axis=1)
    cand_parent = jnp.concatenate(
        [jnp.broadcast_to(local_ids[None, :], (batch, w)),
         parent.reshape(batch, -1)],
        axis=1,
    )
    cand_char = jnp.concatenate(
        [jnp.full((batch, w), -1, jnp.int32), ext_last.reshape(batch, -1)],
        axis=1,
    )

    # dead candidates must not collide with real hash runs: give them the
    # max h1 and unique h2 values so they sort to the tail unmerged.
    n_cand = cand_h1.shape[1]
    dead = _logaddexp(cand_pb, cand_pnb) <= NEG_INF / 2
    po = jnp.asarray(parent_offset).astype(jnp.uint32)
    cand_h1 = jnp.where(dead, jnp.uint32(0xFFFFFFFF), cand_h1)
    cand_h2 = jnp.where(
        dead,
        po * (1 + jnp.arange(n_cand, dtype=jnp.uint32))[None, :]
        + jnp.arange(n_cand, dtype=jnp.uint32)[None, :],
        cand_h2,
    )
    return cand_h1, cand_h2, cand_pb, cand_pnb, cand_parent, cand_char


def expand_candidates_topk(pb, pnb, last, h1, h2, lp_t, topk_vals, topk_cls,
                           blank, parent_offset=0, space=-1, bscore=None):
    """Top-K-classes variant of :func:`expand_candidates` — the reference's
    ``cutoff_top_n`` pruning (ctcdecode decoder.py:96-100; the Python
    oracle applies the same per-frame class cut) moved on device: extension
    candidates expand only the frame's K most probable classes, shrinking
    the per-step candidate sort from W*(C+1) to W*(K+1) entries.

    topk_vals/topk_cls are (B, K) from lax.top_k over the frame's
    log-probs; the stay path still uses the full ``lp_t`` row (blank and
    last-char repeat need their exact probabilities regardless of the
    cut). ``bscore`` (B, W), when given, is the LM word-boundary bonus
    applied where the expanded class is ``space``.
    """
    batch, w = pb.shape
    k = topk_cls.shape[-1]
    num_classes = lp_t.shape[-1]
    total = _logaddexp(pb, pnb)  # (B, W)

    # the oracle's cut applies to EVERY class including blank/last: the
    # stay path only contributes when those classes survive the frame cut
    lp_blank = lp_t[:, blank][:, None]
    lp_last = jnp.take_along_axis(
        lp_t, jnp.clip(last, 0, num_classes - 1), axis=-1
    )
    blank_in = jnp.any(topk_cls == blank, axis=-1)[:, None]  # (B, 1)
    last_in = jnp.any(
        topk_cls[:, None, :] == last[:, :, None], axis=-1
    )  # (B, W)
    stay_pb = jnp.where(blank_in, total + lp_blank, NEG_INF)
    stay_pnb = jnp.where(last_in & (last >= 0), pnb + lp_last, NEG_INF)

    cls = topk_cls[:, None, :]  # (B, 1, K)
    vals = topk_vals[:, None, :]  # (B, 1, K)
    base = total[:, :, None] + vals
    rep = pb[:, :, None] + vals
    is_last = cls == last[:, :, None]
    ext_pnb = jnp.where(is_last, rep, base)  # (B, W, K)
    if bscore is not None:
        ext_pnb = ext_pnb + jnp.where(cls == space, bscore[:, :, None], 0.0)
    ext_pnb = jnp.where(cls == blank, NEG_INF, ext_pnb)

    cls_u = (topk_cls[:, None, :] + 1).astype(jnp.uint32)
    eh1 = h1[:, :, None] * _H1_MUL + cls_u
    eh2 = h2[:, :, None] * _H2_MUL + cls_u
    ext_last = jnp.broadcast_to(cls, (batch, w, k)).astype(jnp.int32)
    local_ids = parent_offset + jnp.arange(w, dtype=jnp.int32)
    parent = jnp.broadcast_to(local_ids[None, :, None], (batch, w, k))

    cand_h1 = jnp.concatenate([h1, eh1.reshape(batch, -1)], axis=1)
    cand_h2 = jnp.concatenate([h2, eh2.reshape(batch, -1)], axis=1)
    cand_pb = jnp.concatenate(
        [stay_pb, jnp.full((batch, w * k), NEG_INF)], axis=1
    )
    cand_pnb = jnp.concatenate([stay_pnb, ext_pnb.reshape(batch, -1)], axis=1)
    cand_parent = jnp.concatenate(
        [jnp.broadcast_to(local_ids[None, :], (batch, w)),
         parent.reshape(batch, -1)],
        axis=1,
    )
    cand_char = jnp.concatenate(
        [jnp.full((batch, w), -1, jnp.int32), ext_last.reshape(batch, -1)],
        axis=1,
    )

    n_cand = cand_h1.shape[1]
    dead = _logaddexp(cand_pb, cand_pnb) <= NEG_INF / 2
    po = jnp.asarray(parent_offset).astype(jnp.uint32)
    cand_h1 = jnp.where(dead, jnp.uint32(0xFFFFFFFF), cand_h1)
    cand_h2 = jnp.where(
        dead,
        po * (1 + jnp.arange(n_cand, dtype=jnp.uint32))[None, :]
        + jnp.arange(n_cand, dtype=jnp.uint32)[None, :],
        cand_h2,
    )
    return cand_h1, cand_h2, cand_pb, cand_pnb, cand_parent, cand_char


_PACK = 4096  # packed payload stride: char+1 < 4096, parent < 2^19


def merge_top_w(cands, w):
    """Sort candidates by hash pair, merge duplicate prefixes with a
    segmented log-sum-exp, keep the top ``w`` by total probability.

    Returns (pb, pnb, h1, h2, parent, char), each (B, w). The sort carries
    only 5 operands (2 hash keys, the two probability streams, and parent/
    char packed into one int32) — everything else about the merged front
    (``last``, the LM state) is a pure function of (parent, char) and is
    rebuilt by the caller.
    """
    cand_h1, cand_h2, cand_pb, cand_pnb, cand_parent, cand_char = cands
    batch = cand_h1.shape[0]
    packed = cand_parent * _PACK + (cand_char + 1)
    sh1, sh2, s_pb, s_pnb, s_packed = jax.lax.sort(
        (cand_h1, cand_h2, cand_pb, cand_pnb, packed),
        dimension=1,
        num_keys=2,
    )
    first = jnp.concatenate(
        [
            jnp.ones((batch, 1), bool),
            (sh1[:, 1:] != sh1[:, :-1]) | (sh2[:, 1:] != sh2[:, :-1]),
        ],
        axis=1,
    )
    m_pb, m_pnb = _segmented_logsumexp2(s_pb, s_pnb, first)
    m_total = _logaddexp(m_pb, m_pnb)

    _, top_idx = jax.lax.top_k(m_total, w)  # (B, w)
    take = lambda arr: jnp.take_along_axis(arr, top_idx, axis=1)
    t_packed = take(s_packed)
    parent = t_packed // _PACK
    char = t_packed % _PACK - 1
    return take(m_pb), take(m_pnb), take(sh1), take(sh2), parent, char


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "blank", "max_symbols", "space", "cutoff_top_n"
    ),
)
def ctc_beam_search_device(
    probs: jnp.ndarray,  # (B, T, C) softmax probabilities
    lengths: jnp.ndarray,  # (B,) int32 valid frame counts
    beam_width: int = 64,
    blank: int = 0,
    max_symbols: int | None = None,
    lm=None,  # decode.device_lm.DeviceLM for on-device LM fusion
    alpha: float = 0.0,
    beta: float = 0.0,
    space: int = -1,
    cutoff_top_n: int = 40,
):
    """Batched beam search. Returns (labels, times, lens, scores):

    labels — (B, W, T) int32, top-W label sequences (padded with -1)
    times  — (B, W, T) int32 frame index of each emitted char
    lens   — (B, W) int32 sequence lengths
    scores — (B, W) f32 total ln-probabilities, best first

    With ``lm`` (a DeviceLM), word-boundary LM fusion runs inside the scan:
    every space extension earns alpha * ln p(word | context) + beta from
    HBM-resident hash-table probes, and final beams not ending in space
    score their trailing word — the reference's ctcdecode+KenLM
    configuration (decoder.py:96-144) with no host round-trip.
    """
    batch, t_max, num_classes = probs.shape
    w = beam_width
    log_probs = jnp.log(jnp.clip(probs, 1e-30, None)).astype(jnp.float32)

    # beam state
    pb = jnp.full((batch, w), NEG_INF).at[:, 0].set(0.0)
    pnb = jnp.full((batch, w), NEG_INF)
    last = jnp.full((batch, w), -1, jnp.int32)
    h1 = jnp.zeros((batch, w), jnp.uint32)
    h2 = jnp.zeros((batch, w), jnp.uint32)

    if lm is not None:
        from .device_lm import (
            boundary_scores,
            init_lm_state,
            reconstruct_lm_state,
            final_scores,
        )

        lm_state0 = init_lm_state(batch, w, lm.order)
    else:
        lm_state0 = None

    use_topk = cutoff_top_n < num_classes

    def step(state, inputs):
        pb, pnb, last, h1, h2, lm_state = state
        lp_t, t = inputs  # (B, C), scalar

        if use_topk:
            topk_vals, topk_cls = jax.lax.top_k(lp_t, cutoff_top_n)

        if lm is not None:
            if use_topk:
                # LM probing is the dominant per-step cost (hash-table
                # gathers for every beam); a frame whose class cut excludes
                # space cannot extend any word, so the whole probe batch is
                # skipped via cond on most frames of peaky CTC posteriors
                space_present = jnp.any(topk_cls == space)
                bscore, wid = jax.lax.cond(
                    space_present,
                    lambda: boundary_scores(lm, lm_state, alpha, beta),
                    lambda: (
                        jnp.zeros((batch, w), jnp.float32),
                        jnp.full((batch, w), -1, jnp.int32),
                    ),
                )
            else:
                bscore, wid = boundary_scores(lm, lm_state, alpha, beta)
        else:
            bscore = None

        if use_topk:
            cands = expand_candidates_topk(
                pb, pnb, last, h1, h2, lp_t, topk_vals, topk_cls, blank,
                parent_offset=0, space=space, bscore=bscore,
            )
        else:
            ext_bonus = None
            if bscore is not None:
                ext_bonus = (
                    jnp.zeros((batch, w, num_classes))
                    .at[:, :, space]
                    .set(bscore)
                )
            cands = expand_candidates(
                pb, pnb, last, h1, h2, lp_t, blank, parent_offset=0,
                ext_bonus=ext_bonus,
            )
        (n_pb, n_pnb, n_h1, n_h2, bk_parent, bk_char) = merge_top_w(
            cands, w
        )

        # freeze state for rows past their length
        active = (t < lengths)[:, None]
        keep = lambda new, old: jnp.where(active, new, old)
        # inactive rows: every beam keeps itself with no emission
        bk_parent = jnp.where(
            active, bk_parent, jnp.arange(w, dtype=jnp.int32)[None, :]
        )
        bk_char = jnp.where(active, bk_char, jnp.full((batch, w), -1, jnp.int32))
        # ``last`` (like the LM state) is a pure function of (parent, char):
        # rebuilt instead of riding the candidate sort; the frozen-row
        # identity pointers keep it intact automatically
        n_last = jnp.where(
            bk_char >= 0, bk_char, jnp.take_along_axis(last, bk_parent, axis=1)
        )
        if lm is not None:
            lm_state = reconstruct_lm_state(
                lm_state, bk_parent, bk_char, wid, space
            )
        new_state = (
            keep(n_pb, pb), keep(n_pnb, pnb), n_last,
            keep(n_h1, h1), keep(n_h2, h2), lm_state,
        )
        return new_state, (bk_parent, bk_char)

    (pb, pnb, last, h1, h2, lm_state), (parents, chars) = jax.lax.scan(
        step,
        (pb, pnb, last, h1, h2, lm_state0),
        (jnp.transpose(log_probs, (1, 0, 2)), jnp.arange(t_max)),
    )
    if lm is not None:
        extra = final_scores(lm, lm_state, last, alpha, beta, space)
    else:
        extra = None
    return backtrack_beams(pb, pnb, parents, chars, t_max, extra_scores=extra)


@functools.partial(jax.jit, static_argnames=("t_max",))
def backtrack_beams(pb, pnb, parents, chars, t_max, extra_scores=None):
    """Score-sort the final beams and reconstruct label sequences + times
    by walking the per-step (parent, char) pointers backwards.

    parents/chars are (T, B, W); ``extra_scores`` (B, W), if given, is
    added to the CTC path scores before ranking (the trailing-word LM
    term). Returns (labels, times, lens, scores).
    """
    batch, w = pb.shape
    scores = _logaddexp(pb, pnb)  # (B, W)
    if extra_scores is not None:
        scores = scores + extra_scores
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)

    # ---- backtrack (device): walk parent pointers from the end --------
    def backtrack(carry, inputs):
        beam_idx, pos, labels, times = carry
        par_t, chr_t, t = inputs  # (B, W), (B, W), scalar
        ch = jnp.take_along_axis(chr_t, beam_idx, axis=1)  # (B, W)
        emitted = ch >= 0
        pos = pos - emitted.astype(jnp.int32)
        # write ch at pos where emitted
        labels = jax.vmap(
            lambda lab, p, c, e: jax.vmap(
                lambda lab_w, p_w, c_w, e_w: jnp.where(
                    e_w, lab_w.at[p_w].set(c_w), lab_w
                )
            )(lab, p, c, e)
        )(labels, pos, ch, emitted)
        times = jax.vmap(
            lambda tm, p, e: jax.vmap(
                lambda tm_w, p_w, e_w: jnp.where(
                    e_w, tm_w.at[p_w].set(t), tm_w
                )
            )(tm, p, e)
        )(times, pos, emitted)
        beam_idx = jnp.take_along_axis(par_t, beam_idx, axis=1)
        return (beam_idx, pos, labels, times), None

    # sequence lengths: count emissions along the winning path, so run the
    # backtrack twice — once to count, once to place. Simpler: place from
    # the end into position T-1..0, then roll left afterwards.
    b_idx = jnp.broadcast_to(order, (batch, w)).astype(jnp.int32)
    labels0 = jnp.full((batch, w, t_max), -1, jnp.int32)
    times0 = jnp.zeros((batch, w, t_max), jnp.int32)
    pos0 = jnp.full((batch, w), t_max, jnp.int32)
    (_, pos_end, labels, times), _ = jax.lax.scan(
        backtrack,
        (b_idx, pos0, labels0, times0),
        (parents[::-1], chars[::-1], jnp.arange(t_max)[::-1]),
    )
    lens = t_max - pos_end  # (B, W)
    # shift each row's labels left by pos_end
    shift = pos_end[:, :, None]
    idx = (jnp.arange(t_max)[None, None, :] + shift) % t_max
    labels = jnp.take_along_axis(labels, idx, axis=2)
    times = jnp.take_along_axis(times, idx, axis=2)
    labels = jnp.where(jnp.arange(t_max)[None, None, :] < lens[:, :, None], labels, -1)
    return labels, times, lens, scores


class DeviceBeamDecoder:
    """Decoder-API wrapper over :func:`ctc_beam_search_device`.

    Same (strings, offsets) contract as BeamCTCDecoder.decode — including
    LM-fused decoding when ``lm`` is given (an NgramLM/ARPA path is packed
    into a DeviceLM on construction and lives in HBM across calls).
    """

    def __init__(
        self,
        labels: str,
        beam_width: int = 64,
        blank_index: int = 0,
        lm=None,
        alpha: float = 0.0,
        beta: float = 0.0,
        cutoff_top_n: int = 40,
    ):
        self.labels = labels
        self.beam_width = beam_width
        self.blank_index = blank_index
        self.cutoff_top_n = cutoff_top_n
        self.space_index = labels.index(" ") if " " in labels else -1
        self.alpha = alpha
        self.beta = beta
        if lm is not None:
            from .device_lm import DeviceLM, pack_device_lm

            if isinstance(lm, str):
                from .lm import load_lm

                lm = load_lm(lm)
            if not isinstance(lm, DeviceLM):
                lm = pack_device_lm(lm, labels)
        self.lm = lm

    # engine hint: decode(n_best=...) limits the beams fetched to host
    supports_n_best = True

    def decode(self, probs, sizes=None, n_best: int | None = None):
        """Decode to (strings, offsets). ``n_best`` limits how many beams
        are converted AND fetched — the (B, W, T) label/time arrays are
        sliced on device first, so a top-1 serving call transfers W x less
        than the full ctcdecode-style all-beams return."""
        probs = jnp.asarray(probs)
        batch, t_max, _ = probs.shape
        sizes = (
            jnp.asarray(sizes, jnp.int32)
            if sizes is not None
            else jnp.full((batch,), t_max, jnp.int32)
        )
        labels, times, lens, scores = ctc_beam_search_device(
            probs, sizes, beam_width=self.beam_width, blank=self.blank_index,
            lm=self.lm, alpha=self.alpha, beta=self.beta,
            space=self.space_index, cutoff_top_n=self.cutoff_top_n,
        )
        top = self.beam_width if n_best is None else min(n_best, self.beam_width)
        labels, times = np.asarray(labels[:, :top]), np.asarray(times[:, :top])
        lens, scores = np.asarray(lens[:, :top]), np.asarray(scores)
        all_strings, all_offsets = [], []
        for b in range(batch):
            strings, offsets = [], []
            for k in range(top):
                n = int(lens[b, k])
                strings.append(
                    "".join(self.labels[c] for c in labels[b, k, :n])
                )
                offsets.append(times[b, k, :n].astype(np.int32))
            all_strings.append(strings)
            all_offsets.append(offsets)
        return all_strings, all_offsets
