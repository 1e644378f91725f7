"""Jaro-Winkler similarity — vectorized Arrow ``pandas_udf``.

Parity: the reference reranks candidate pairs with string similarity on
title/artist plus Hamming distance on perceptual hashes
(``mediachain/indexer/mc_dedupe.py`` / ``mc_models.py`` pairwise scoring).
Levenshtein and Hamming stay JVM-side (built-ins); Jaro-Winkler has no Spark
built-in and no rapidfuzz/jellyfish in this environment, so it is the ONE
Python crossing in the hot path — an Arrow-batched ``pandas_udf`` whose inner
loop is bounded by max string length (≤ ``MAXLEN``), with all per-pair work
done as numpy array ops across the whole batch:

- strings are padded into (batch, MAXLEN) int32 code matrices;
- the greedy in-window match scan runs once per *character position*
  (≤ MAXLEN numpy steps), not once per pair;
- transpositions come from comparing the matched-character sequences, again
  batch-wide.

The plan must therefore show ``ArrowEvalPython`` — never ``BatchEvalPython``
(BASELINE.md row 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

MAXLEN = 64  # titles/artists; longer strings are truncated (similarity-stable)
_PAD = -1
WINKLER_P = 0.1
WINKLER_MAX_PREFIX = 4


def _encode(s: pd.Series) -> np.ndarray:
    """(n, MAXLEN) int32 char-code matrix, padded with -1.

    One C-level conversion: numpy's fixed-width unicode dtype is UCS-4, so a
    (n,) '<U64' array *is* an (n, 64) uint32 code matrix — no Python loop.
    """
    arr = np.asarray(s.to_numpy(), dtype=f"U{MAXLEN}")
    codes = arr.view(np.uint32).reshape(len(s), MAXLEN).astype(np.int32)
    codes[codes == 0] = _PAD  # NUL padding → sentinel
    return codes


def jaro_winkler_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized Jaro-Winkler over a batch of string pairs → float64 [0,1]."""
    a = a.fillna("")
    b = b.fillna("")
    A = _encode(a)
    B = _encode(b)
    la = (A != _PAD).sum(axis=1)
    lb = (B != _PAD).sum(axis=1)
    n = len(a)
    maxlen = int(max(la.max(initial=0), lb.max(initial=0)))

    # match window per pair: floor(max(la,lb)/2) - 1 (≥ 0)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    used_b = np.zeros((n, maxlen if maxlen else 1), dtype=bool)
    m = np.zeros(n, dtype=np.int64)  # match count
    a_seq = np.full((n, maxlen if maxlen else 1), _PAD, dtype=np.int32)
    b_pos = np.full((n, maxlen if maxlen else 1), maxlen, dtype=np.int32)
    j_idx = np.arange(maxlen, dtype=np.int64)[None, :]

    for i in range(maxlen):
        ai = A[:, i]  # (n,)
        active = (ai != _PAD)
        if not active.any():
            break
        lo = np.maximum(i - window, 0)[:, None]
        hi = np.minimum(i + window + 1, lb)[:, None]
        cand = (
            (B[:, :maxlen] == ai[:, None])
            & ~used_b
            & (j_idx >= lo)
            & (j_idx < hi)
            & active[:, None]
        )
        found = cand.any(axis=1)
        j_star = cand.argmax(axis=1)
        rows = np.nonzero(found)[0]
        used_b[rows, j_star[rows]] = True
        a_seq[rows, m[rows]] = ai[rows]
        b_pos[rows, m[rows]] = j_star[rows]
        m[rows] += 1

    # transpositions: matched a-chars in i-order vs matched b-chars in j-order
    order = np.argsort(b_pos, axis=1, kind="stable")
    b_seq = np.take_along_axis(_gather_b(B, b_pos, maxlen), order, axis=1)
    k_idx = np.arange(maxlen if maxlen else 1)[None, :]
    valid = k_idx < m[:, None]
    t = ((a_seq != b_seq) & valid).sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        mf = m.astype(np.float64)
        jaro = (mf / la + mf / lb + (mf - t) / mf) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    both_empty = (la == 0) & (lb == 0)
    jaro = np.where(both_empty, 1.0, jaro)

    # Winkler prefix boost: ℓ = common prefix length (≤ 4)
    pl = np.zeros(n, dtype=np.int64)
    still = np.ones(n, dtype=bool)
    for i in range(min(WINKLER_MAX_PREFIX, maxlen)):
        eq = (A[:, i] == B[:, i]) & (A[:, i] != _PAD) & still
        pl += eq
        still &= eq
    jw = jaro + pl * WINKLER_P * (1.0 - jaro)
    return pd.Series(np.clip(jw, 0.0, 1.0))


def _gather_b(B: np.ndarray, b_pos: np.ndarray, maxlen: int) -> np.ndarray:
    """b-characters at matched positions (PAD where unmatched slot)."""
    safe = np.minimum(b_pos, maxlen - 1 if maxlen else 0)
    gathered = np.take_along_axis(B[:, : maxlen if maxlen else 1], safe, axis=1)
    return np.where(b_pos < maxlen, gathered, _PAD)


jaro_winkler = pandas_udf(jaro_winkler_batch, returnType=DoubleType())


def make_gated_jw(hamming_radius: int, text_floor: float, text_only: float):
    """Cascade-scoring JW: compute Jaro-Winkler ONLY where it can flip the
    match decision; other rows return NaN (→ null).

    With text_sim = max((jw + lev)/2, lev_sorted) and the decision
    (hamming ≤ r ∧ text_sim ≥ floor) ∨ (text_sim ≥ τ), JW is decision-
    relevant iff:
      (hamming ≤ r ∧ lev_sorted < floor)   — jw could lift past the floor
      ∨ (lev ≥ 2τ − 1)                     — jw could lift past τ
    Everywhere else the outcome is invariant for any jw ∈ [0,1] (the
    (jw+lev)/2 term is bounded by (1+lev)/2 < τ, and accepted rows stay
    accepted via lev_sorted alone).  This is the classic cheap-filter →
    expensive-refine cascade: at the measured corpus it skips ~90% of the
    Python string work without changing a single match bit.
    """

    def gated(
        a: pd.Series,
        b: pd.Series,
        lev_sim: pd.Series,
        lev_sorted: pd.Series,
        hamming: pd.Series,
    ) -> pd.Series:
        a = a.fillna("")
        b = b.fillna("")
        need = (
            (hamming.to_numpy() <= hamming_radius)
            & (lev_sorted.to_numpy() < text_floor)
        ) | (lev_sim.to_numpy() >= 2.0 * text_only - 1.0)
        # equality short-circuit: a == b ⇒ jw = 1 and lev_sim = 1, so
        # (jw+lev)/2 = 1 = the coalesce fallback — value-invariant for
        # text_sim, and the scorer's jw(null) path handles it.  At the
        # measured bench corpus 14% of candidate pairs are exact-text dupes
        # and ALL of them pass the thresholds above; skipping them halves
        # the Python string work.
        need &= a.to_numpy() != b.to_numpy()
        out = pd.Series(np.full(len(a), np.nan))
        if need.any():
            idx = np.nonzero(need)[0]
            vals = jaro_winkler_batch(
                a.iloc[idx].reset_index(drop=True),
                b.iloc[idx].reset_index(drop=True),
            )
            out.iloc[idx] = vals.to_numpy()
        return out

    # .asNondeterministic(): the UDF IS deterministic in fact, but the marker
    # is the standard barrier against CollapseProject / filter pushdown.
    # Without it, a consumer like score_pairs(...).where("is_match") lets
    # Catalyst inline is_match → text_sim → gated(...) into a pushed-down
    # join filter that ExtractPythonUDFs cannot lift, and whole-stage codegen
    # dies with INTERNAL_ERROR "Cannot evaluate expression: gated(...)"
    # (round-1 driver failure on er_matches; regression: tests/test_simtext.py
    # ::test_filter_unpersisted_scores).
    return pandas_udf(gated, returnType=DoubleType()).asNondeterministic()


# ---------------------------------------------------------------------------
# Vectorized Levenshtein (numpy batch DP) — used by the per-block
# in-worker scoring fallback (operators/scoring.score_pairs_in_blocks),
# where the JVM levenshtein built-in isn't reachable.  No truncation: pads to
# the batch max length.
# ---------------------------------------------------------------------------
def _encode_width(s: pd.Series, width: int) -> np.ndarray:
    arr = np.asarray(s.to_numpy(), dtype=f"U{width}")
    codes = arr.view(np.uint32).reshape(len(s), width).astype(np.int32)
    codes[codes == 0] = _PAD
    return codes


def levenshtein_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Exact edit distance over a batch of string pairs → int64 array.

    Row-at-a-time DP vectorized across the batch: one loop over character
    positions of `a` (≤ batch max length), each step O(batch × len_b) numpy.
    The insertion recurrence curr[j] = min(..., curr[j-1]+1) is sequential in
    j; it folds into a prefix scan —
        curr[j] = j + min_{k<=j}(t[k] - k)  via np.minimum.accumulate —
    where t[] holds the deletion/substitution candidates.
    """
    a = a.fillna("")
    b = b.fillna("")
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    width = max(int(a.str.len().max()), int(b.str.len().max()), 1)
    A = _encode_width(a, width)
    B = _encode_width(b, width)
    la = (A != _PAD).sum(axis=1)
    lb = (B != _PAD).sum(axis=1)

    ar = np.arange(width + 1, dtype=np.int64)[None, :]
    prev = np.broadcast_to(ar, (n, width + 1)).copy()  # D[0, j] = j
    final_row = prev.copy()  # rows with la == 0 finish here
    for i in range(1, width + 1):
        cost = (B != A[:, i - 1][:, None]).astype(np.int64)  # (n, width)
        t = np.empty((n, width + 1), dtype=np.int64)
        t[:, 0] = i
        t[:, 1:] = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        curr = np.minimum.accumulate(t - ar, axis=1) + ar
        done = la == i
        if done.any():
            final_row[done] = curr[done]
        prev = curr
    return final_row[np.arange(n), lb]


def levenshtein_sim_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """1 - dist/maxlen (1.0 when both empty) — mirrors the JVM-side
    ``1 - levenshtein(a, b) / greatest(length(a), length(b))`` in
    operators/scoring.score_pairs."""
    a = a.fillna("")
    b = b.fillna("")
    d = levenshtein_batch(a, b).astype(np.float64)
    m = np.maximum(a.str.len().to_numpy(), b.str.len().to_numpy()).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = 1.0 - d / m
    return np.where(m == 0, 1.0, sim)


# ---------------------------------------------------------------------------
# Pure-Python scalar reference (oracle for tests — FIXTURES.md B5)
# ---------------------------------------------------------------------------
def jaro_winkler_ref(s1: str, s2: str) -> float:
    s1, s2 = (s1 or "")[:MAXLEN], (s2 or "")[:MAXLEN]
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    la, lb = len(s1), len(s2)
    window = max(max(la, lb) // 2 - 1, 0)
    used = [False] * lb
    a_matched, b_matched = [], []
    for i, ch in enumerate(s1):
        lo, hi = max(i - window, 0), min(i + window + 1, lb)
        for j in range(lo, hi):
            if not used[j] and s2[j] == ch:
                used[j] = True
                a_matched.append(ch)
                b_matched.append(j)
                break
    m = len(a_matched)
    if m == 0:
        return 0.0
    b_chars = [s2[j] for j in sorted(b_matched)]
    t = sum(1 for x, y in zip(a_matched, b_chars) if x != y) // 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    pl = 0
    for x, y in zip(s1, s2):
        if x != y or pl == WINKLER_MAX_PREFIX:
            break
        pl += 1
    return min(jaro + pl * WINKLER_P * (1.0 - jaro), 1.0)
