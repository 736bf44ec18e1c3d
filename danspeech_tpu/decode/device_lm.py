"""Device-resident n-gram LM scoring for the on-device beam search.

Completes SURVEY §2.2 N2/N3: the reference's LM-fused beam decode lives in
the external C++ ctcdecode extension + KenLM
(/root/reference/danspeech/deepspeech/decoder.py:96-100); round 1 replaced
that with a host C++ decoder (native/ctcbeam) but the flagship LM-decode
configuration could not ride the device mesh. This module puts the n-gram
tables in HBM and scores words *inside* the jitted beam-search step:

- :func:`pack_device_lm` flattens an :class:`~.lm.NgramLM` into an
  open-addressing hash table with bounded linear probing (keys are a pair
  of independent 32-bit multiplicative fingerprints over word ids — TPUs
  have no native 64-bit integers, two 32-bit chains give a 64-bit-equivalent
  collision rate) plus a vocabulary table mapping a rolling hash of a
  word's *label characters* to its word id;
- :func:`boundary_scores` computes alpha * ln p(word | context) + beta for
  each beam's just-completed word with the standard backoff recursion,
  fully vectorized over (batch, beam) via gather probes — no host callback;
- :func:`init_lm_state` / :func:`reconstruct_lm_state` thread the per-beam
  LM state (last order-1 word ids, rolling current-word hash) through the
  beam scan: state is recomputed from each merged candidate's
  (parent, emitted char) pointer, so the parent-pointer merge in
  device_beam.ptr_merge_select carries no extra payload.

HBM-gather layout (the probes are the dominant per-step decode cost, and
XLA TPU gathers cost per gathered ROW, not per byte): the table is
BUCKETIZED — a query hashes to one bucket of ``max_probe`` entries, and
each entry's key pair AND value pair live in the same (P, 4)-word bucket
row — so a probe is ONE gather index fetching one contiguous 64-byte
block, instead of P window slots x separate key/value arrays. The backoff
recursion's 2*(order-1)+1 n-gram lookups are additionally stacked into
ONE probe call. The builder grows the bucket count until no bucket
overflows, so lookup is always a single-row gather; ``load`` trades
memory for fewer overflow retries on skewed key sets.

Scoring semantics match the host scorers (decode/lm.py NgramLM /
native/ctcbeam): natural-log probabilities, OOV words at -1000, OOV
context words dropped from the context window at scoring time (they still
occupy a slot of the last order-1 words), empty words (double space)
score 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

OOV_SCORE = -1000.0

_M32 = 0xFFFFFFFF
# word-character rolling hash (current partial word)
_WM1 = 0x01000193  # FNV-ish odd multipliers
_WM2 = 0x61C88647
# n-gram word-id chain
_NM1 = 0x9E3779B1
_NM2 = 0x85EBCA77
_NG_SEED1 = 0x811C9DC5
_NG_SEED2 = 0xC2B2AE35
# bucket-index mixes (one per hash choice)
_SLOT_MIX = 0x7FEB352D
_SLOT_MIX2 = 0x846CA68B


def _h_word(char_ids) -> tuple[int, int]:
    """Host-side rolling hash of a word's label-character ids."""
    h1 = h2 = 0
    for c in char_ids:
        h1 = (h1 * _WM1 + c + 1) & _M32
        h2 = (h2 * _WM2 + c + 1) & _M32
    return h1, h2


def _h_ngram(word_ids) -> tuple[int, int]:
    """Host-side fingerprint chain over word ids (oldest first)."""
    h1, h2 = _NG_SEED1, _NG_SEED2
    for w in word_ids:
        h1 = (h1 * _NM1 + w + 1) & _M32
        h2 = (h2 * _NM2 + w + 1) & _M32
    if h1 == 0 and h2 == 0:  # keep (0,0) free as the empty-slot sentinel
        h1 = h2 = 1
    return h1, h2


def _buckets2(h1: int, h2: int, n_buckets: int) -> tuple[int, int]:
    """Host-side candidate bucket pair of a key (two-choice hashing)."""
    b1 = ((h1 ^ ((h2 * _SLOT_MIX) & _M32)) & _M32) % n_buckets
    b2 = ((h2 ^ ((h1 * _SLOT_MIX2) & _M32)) & _M32) % n_buckets
    return b1, b2


class _BucketTableBuilder:
    """Two-choice bucketized hash table: each key may live in either of
    two candidate buckets of ``max_probe`` entry lanes (greedy less-full
    placement — the classic power-of-two-choices load balance), and every
    lane packs (k1, k2, v0, v1) into four consecutive 32-bit words. The
    device lookup gathers exactly TWO contiguous (max_probe, 4)-word
    bucket rows per query — independent of table size — and matches
    across the 2 x max_probe lanes. Grows the bucket count and rehashes
    in the (rare, load-bounded) case both candidate buckets overflow."""

    def __init__(self, n_entries: int, n_values: int, max_probe: int,
                 load: float):
        if n_values > 2:
            raise ValueError("bucket slots pack at most 2 values")
        self.max_probe = max_probe
        self.n_values = n_values
        # load = slot headroom (1.0 = exactly as many lanes as entries)
        self.n_buckets = max(2, int(n_entries * load / max_probe) + 1)
        self._alloc()

    def _alloc(self):
        # (nb, P, 4) u32: [k1, k2, value0, value1] (values pre-bitcast)
        self.table = np.zeros((self.n_buckets, self.max_probe, 4), np.uint32)
        self.fill = np.zeros(self.n_buckets, np.int32)

    def insert_all(self, entries):
        """entries: list of (h1, h2, value-tuple of raw uint32 words).
        Retries with more buckets until nothing overflows."""
        while True:
            self._alloc()
            if all(self._insert(*e) for e in entries):
                return
            self.n_buckets = int(self.n_buckets * 1.5) + 1

    def _insert(self, h1, h2, vals) -> bool:
        cands = _buckets2(h1, h2, self.n_buckets)
        for b in cands:
            lanes = self.table[b, : self.fill[b]]
            if ((lanes[:, 0] == h1) & (lanes[:, 1] == h2)).any():
                raise ValueError("duplicate key in device LM table")
        b = min(cands, key=lambda c: self.fill[c])
        if self.fill[b] >= self.max_probe:
            return False
        lane = self.fill[b]
        self.table[b, lane, 0] = h1
        self.table[b, lane, 1] = h2
        for i, v in enumerate(vals):
            self.table[b, lane, 2 + i] = v
        self.fill[b] += 1
        return True


@jax.tree_util.register_pytree_node_class
class DeviceLM:
    """N-gram LM packed as device arrays; a jit-traceable pytree whose
    static aux data is (order, max_probe).

    ng_table — (NB, P, 4) uint32 buckets: [k1, k2, ln-prob (bitcast f32),
    ln-backoff (bitcast f32)] per entry lane;
    voc_table — (VB, P, 4) uint32 buckets: [k1, k2, word id, 0].
    """

    def __init__(self, order, max_probe, ng_table, voc_table):
        self.order = int(order)
        self.max_probe = int(max_probe)
        self.ng_table = ng_table
        self.voc_table = voc_table

    def tree_flatten(self):
        children = (self.ng_table, self.voc_table)
        return children, (self.order, self.max_probe)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux, *children)


def pack_device_lm(lm, labels: str, max_probe: int = 4,
                   load: float = 1.6) -> DeviceLM:
    """Pack an NgramLM (decode/lm.py) into a :class:`DeviceLM`.

    ``labels`` is the acoustic label string: the vocabulary table is keyed
    by each word's label-character ids (the only spelling the beam search
    can produce), so LM words containing characters outside ``labels`` are
    unreachable and skipped.
    """
    char_index = {ch: i for i, ch in enumerate(labels)}

    voc_entries = []
    seen = {}
    for wid, word in enumerate(lm.words):
        try:
            ids = [char_index[ch] for ch in word]
        except KeyError:
            continue
        if not ids:
            continue
        key = _h_word(ids)
        if key == (0, 0):  # would alias the empty-slot sentinel
            raise ValueError(f"word hash hit the empty sentinel: {word!r}")
        if key in seen:  # 64-bit-equivalent hash collision: effectively
            raise ValueError(  # impossible at zoo-vocabulary sizes
                f"vocab hash collision: {word!r} vs {lm.words[seen[key]]!r}"
            )
        seen[key] = wid
        voc_entries.append((key[0], key[1], (np.uint32(wid),)))

    ng_entries = []
    for table in lm.tables:
        for ids, (prob, backoff) in table.items():
            h1, h2 = _h_ngram(ids)
            ng_entries.append((
                h1, h2,
                (np.float32(prob).view(np.uint32),
                 np.float32(backoff).view(np.uint32)),
            ))

    vt = _BucketTableBuilder(len(voc_entries), 1, max_probe, load)
    vt.insert_all(voc_entries)
    nt = _BucketTableBuilder(len(ng_entries), 2, max_probe, load)
    nt.insert_all(ng_entries)

    return DeviceLM(
        order=lm.order,
        max_probe=max_probe,
        ng_table=jnp.asarray(nt.table),
        voc_table=jnp.asarray(vt.table),
    )


# ---------------------------------------------------------------------------
# Device-side probes
# ---------------------------------------------------------------------------


def _probe(table, q1, q2):
    """Vectorized two-choice bucket probe against a packed (NB, P, 4)
    table. Returns (found, vals_u32) with vals (..., 2) raw table words
    (zero where not found); q1/q2 are uint32 of any (matching) shape. TWO
    gather rows per query — each one contiguous (P, 4)-word bucket."""
    nb = jnp.uint32(table.shape[0])
    b1 = (q1 ^ (q2 * jnp.uint32(_SLOT_MIX))) % nb
    b2 = (q2 ^ (q1 * jnp.uint32(_SLOT_MIX2))) % nb
    rows = jnp.concatenate([table[b1], table[b2]], axis=-2)  # (..., 2P, 4)
    match = (rows[..., 0] == q1[..., None]) & (rows[..., 1] == q2[..., None])
    found = jnp.any(match, axis=-1)
    # at most one DISTINCT lane matches (when b1 == b2 the same lane shows
    # up twice) — max over u32 picks the value either way, zeros elsewhere
    vals = jnp.max(
        jnp.where(match[..., None], rows[..., 2:4], np.uint32(0)), axis=-2
    )
    return found, vals


def lookup_word_ids(lm: DeviceLM, wh1, wh2):
    """Map rolling word hashes to word ids; -1 where the word is OOV."""
    found, vals = _probe(lm.voc_table, wh1, wh2)
    return jnp.where(found, vals[..., 0].astype(jnp.int32), -1)


def _ngram_probe_stacked(lm: DeviceLM, q1, q2):
    """Probe a stack of n-gram queries (..., Q) in one two-row bucket
    gather. Returns (found, prob, backoff), each (..., Q)."""
    # the (0,0) -> (1,1) sentinel remap of the host packer
    sent = (q1 == 0) & (q2 == 0)
    q1 = jnp.where(sent, jnp.uint32(1), q1)
    q2 = jnp.where(sent, jnp.uint32(1), q2)
    found, vals = _probe(lm.ng_table, q1, q2)
    fv = jax.lax.bitcast_convert_type(vals, jnp.float32)  # (..., Q, 2)
    prob = jnp.where(found, fv[..., 0], 0.0)
    backoff = jnp.where(found, fv[..., 1], 0.0)
    return found, prob, backoff


def _compact_context(ctx):
    """Right-align the valid (>= 0) entries of the last-axis context
    buffer, preserving order; invalid slots become -1 on the left.

    Mirrors the host scorers: OOV words occupy a slot of the last order-1
    words but are dropped from the scoring context (lm.py score_word).
    Returns (compacted (..., K) int32, m (...,) int32 valid count).
    """
    k = ctx.shape[-1]
    valid = ctx >= 0
    # count of valid entries at or after each position
    cnt_ge = jnp.cumsum(valid[..., ::-1].astype(jnp.int32), axis=-1)[..., ::-1]
    tgt = k - cnt_ge  # output slot for each valid entry
    onehot = (tgt[..., :, None] == jnp.arange(k)) & valid[..., :, None]
    compacted = jnp.where(
        jnp.any(onehot, axis=-2),
        jnp.sum(jnp.where(onehot, ctx[..., :, None], 0), axis=-2),
        -1,
    )
    return compacted, valid.sum(axis=-1)


def _chain(h1, h2, wid):
    """Extend an n-gram fingerprint chain by one word id (uint32 math)."""
    w = (wid + 1).astype(jnp.uint32)
    return h1 * jnp.uint32(_NM1) + w, h2 * jnp.uint32(_NM2) + w


def score_word_ids(lm: DeviceLM, ctx, wid):
    """ln p(wid | ctx) with backoff, vectorized over leading dims.

    ctx: (..., order-1) int32 word ids oldest-first, -1 = absent/OOV slot;
    wid: (...,) int32, -1 = OOV (scores OOV_SCORE). Matches
    NgramLM.score_word_ids / the native C++ scorer semantics. All
    2*(order-1)+1 backoff-recursion lookups go out as ONE stacked probe.
    """
    kmax = lm.order - 1
    seed1 = jnp.uint32(_NG_SEED1)
    seed2 = jnp.uint32(_NG_SEED2)
    wid_safe = jnp.maximum(wid, 0)

    if kmax == 0:
        h1, h2 = _chain(
            jnp.broadcast_to(seed1, wid.shape),
            jnp.broadcast_to(seed2, wid.shape),
            wid_safe,
        )
        found, prob, _ = _ngram_probe_stacked(
            lm, h1[..., None], h2[..., None]
        )
        score = jnp.where(found[..., 0], prob[..., 0], OOV_SCORE)
        return jnp.where(wid < 0, OOV_SCORE, score)

    cmp_ctx, m = _compact_context(ctx)
    ctx_safe = jnp.maximum(cmp_ctx, 0)

    # fingerprint chains of every context suffix: suffix of length k spans
    # positions [kmax-k, kmax). K <= 4, so the O(K^2) unroll is tiny.
    suf1 = [None] * (kmax + 1)  # suffix length -> (h1, h2)
    suf2 = [None] * (kmax + 1)
    suf1[0], suf2[0] = (
        jnp.broadcast_to(seed1, wid.shape),
        jnp.broadcast_to(seed2, wid.shape),
    )
    for klen in range(1, kmax + 1):
        h1, h2 = seed1, seed2
        for p in range(kmax - klen, kmax):
            h1, h2 = _chain(h1, h2, ctx_safe[..., p])
        suf1[klen], suf2[klen] = h1, h2

    # stack ALL lookups into one probe: prob queries (suffix + word) for
    # klen = kmax..0 at positions [0, kmax], then backoff queries (suffix
    # alone) for klen = kmax..1 at positions [kmax+1, 2*kmax]
    pq = [_chain(suf1[klen], suf2[klen], wid_safe) for klen in range(kmax, -1, -1)]
    bq = [(suf1[klen], suf2[klen]) for klen in range(kmax, 0, -1)]
    q1 = jnp.stack([q[0] for q in pq + bq], axis=-1)  # (..., 2*kmax+1)
    q2 = jnp.stack([q[1] for q in pq + bq], axis=-1)
    found, prob, backoff = _ngram_probe_stacked(lm, q1, q2)

    zero = jnp.zeros(wid.shape, jnp.float32)
    result = jnp.full(wid.shape, OOV_SCORE, jnp.float32)
    done = jnp.zeros(wid.shape, bool)
    backoff_acc = zero
    for klen in range(kmax, -1, -1):
        pi = kmax - klen  # position of this level's prob query
        applicable = klen <= m
        hit = applicable & ~done & found[..., pi]
        result = jnp.where(hit, backoff_acc + prob[..., pi], result)
        done = done | hit
        if klen > 0:
            bi = kmax + 1 + (kmax - klen)  # this level's backoff query
            backoff_acc = backoff_acc + jnp.where(
                applicable & ~done & found[..., bi], backoff[..., bi], 0.0
            )
    return jnp.where(wid < 0, OOV_SCORE, result)


# ---------------------------------------------------------------------------
# Beam-scan integration
# ---------------------------------------------------------------------------


def init_lm_state(batch: int, w: int, order: int):
    """Per-beam LM state pytree: (ctx, cw_h1, cw_h2, cw_len).

    ctx — (B, W, order-1) int32 last completed word ids (-1 = absent/OOV);
    cw_* — rolling hash pair of the current partial word; cw_len — its
    character count (0 = at a word boundary).
    """
    kmax = max(order - 1, 1)
    return (
        jnp.full((batch, w, kmax), -1, jnp.int32),
        jnp.zeros((batch, w), jnp.uint32),
        jnp.zeros((batch, w), jnp.uint32),
        jnp.zeros((batch, w), jnp.int32),
    )


def boundary_scores(lm: DeviceLM, lm_state, alpha: float, beta: float):
    """(bscore, wid) per beam: the LM bonus the beam earns if the next
    emitted char completes its current word (i.e. is a space), and the
    current word's vocab id (-1 = OOV) for the context push.

    bscore = alpha * ln p(word | ctx) + beta; 0 for an empty word (double
    space), reproducing the host _LMScorer.score_boundary (decode/beam.py).
    """
    ctx, cw_h1, cw_h2, cw_len = lm_state
    wid = lookup_word_ids(lm, cw_h1, cw_h2)
    s = score_word_ids(lm, ctx, wid)
    has_word = cw_len > 0
    wid = jnp.where(has_word, wid, -1)
    return jnp.where(has_word, alpha * s + beta, 0.0), wid


def reconstruct_lm_state(lm_state, parent, char, wid, space: int):
    """LM state of each merged candidate from its (parent, emitted char).

    The LM state is a pure function of the prefix, and a merged candidate's
    prefix is parent-prefix + char — so instead of carrying the LM state
    through the merge, gather the parent's state and apply one char
    update. ``parent``/``char`` are the (B, W) backtrack pointers the merge
    emits (char -1 = no emission), ``wid`` the per-parent current-word ids
    from :func:`boundary_scores`.
    """
    ctx, cw_h1, cw_h2, cw_len = lm_state
    g2 = lambda a: jnp.take_along_axis(a, parent, axis=1)
    p_ctx = jnp.take_along_axis(ctx, parent[..., None], axis=1)
    p_h1, p_h2, p_len = g2(cw_h1), g2(cw_h2), g2(cw_len)
    p_wid = g2(wid)

    is_space = char == space
    is_char = (char >= 0) & ~is_space

    pushed = jnp.concatenate([p_ctx[..., 1:], p_wid[..., None]], axis=-1)
    new_ctx = jnp.where((is_space & (p_len > 0))[..., None], pushed, p_ctx)

    c = jnp.where(is_char, char, 0).astype(jnp.uint32) + 1
    up_h1 = p_h1 * jnp.uint32(_WM1) + c
    up_h2 = p_h2 * jnp.uint32(_WM2) + c
    zero_u = jnp.zeros_like(p_h1)
    new_h1 = jnp.where(is_space, zero_u, jnp.where(is_char, up_h1, p_h1))
    new_h2 = jnp.where(is_space, zero_u, jnp.where(is_char, up_h2, p_h2))
    new_len = jnp.where(
        is_space, 0, p_len + is_char.astype(jnp.int32)
    )
    return new_ctx, new_h1, new_h2, new_len


def final_scores(lm: DeviceLM, lm_state, last, alpha: float, beta: float,
                 space: int):
    """End-of-utterance LM bonus: prefixes not ending in space score their
    trailing partial word (host oracle decode/beam.py prefix_beam_search
    final loop; ctcdecode semantics)."""
    bscore, _ = boundary_scores(lm, lm_state, alpha, beta)
    return jnp.where((last >= 0) & (last != space), bscore, 0.0)
