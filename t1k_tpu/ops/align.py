"""Batched banded affine-gap alignment scores on device (JAX).

Same scoring contract as the native engine / reference aligner
(AlignAlgo.hpp:215-421): match 2 / mismatch -2 / gap open -4 / extend -1,
band 5 widened by the length difference, N matches everything, boundary
quirks preserved.  Scores are bit-identical to the host engine (tested).

TPU-first formulation: the usual row recurrence has a serial horizontal
chain through the F (deletion) matrix.  Writing H[j] = max(diag, E[j])
(the f-free part) the chain decouples:

    F[j] = GO + GE*j + max_{k<j} (U[k]),   U[k] = H'[k] - GE*k

where H'[k] also folds in the column-0 boundary.  The row update is then
pure element-wise work plus one cumulative max — O(L) VPU work per row
with no sequential scalar loop, so a whole batch of alignments runs as
[B, L] vector ops over a fori_loop on rows.  This is the same schedule
the Pallas kernel (align_pallas.py) uses with rows pinned in VMEM.
"""

from __future__ import annotations

import functools

from ..utils import jaxcache as _jaxcache

_jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

SCORE_MATCH = 2
SCORE_MISMATCH = -2
GO = -4
GE = -1
NEG_INF = -(1 << 24)


def _row_step(i, carry, t_codes, p_codes, t_lens, p_lens, left_band, right_band, Lt):
    """One DP row (read position i, 1-based) over the whole batch."""
    m_prev, e_prev, score = carry
    B = t_codes.shape[0]
    cols = jnp.arange(Lt + 1)  # [Lt+1]

    p_base = p_codes[:, i - 1][:, None]                      # [B, 1]
    sub = jnp.where(
        (t_codes == p_base) | (t_codes == 4) | (p_base == 4),
        SCORE_MATCH, SCORE_MISMATCH,
    )  # [B, Lt] for columns 1..Lt

    # E (insertion, vertical) from the previous row.
    e_cur = jnp.maximum(e_prev + GE, m_prev + GO + GE)       # [B, Lt+1]
    # column 0 boundary: e[i][0] = GO + i*GE
    e_cur = e_cur.at[:, 0].set(GO + i * GE)

    # H = max(diagonal move, E)
    diag = jnp.concatenate(
        [jnp.full((B, 1), NEG_INF, jnp.int32), m_prev[:, :-1] + sub], axis=1)
    h = jnp.maximum(diag, e_cur)
    # column 0: m[i][0] = GO + i*GO
    m0 = GO + i * GO
    h = h.at[:, 0].set(m0)

    # band mask for this row
    start = jnp.maximum(i - left_band, 1)[:, None]            # [B,1]
    end = jnp.minimum(i + right_band, t_lens)[:, None]
    in_band = (cols[None, :] >= start) & (cols[None, :] <= end)
    col0 = cols[None, :] == 0
    h = jnp.where(in_band | (col0 & (start <= 1)), h, NEG_INF)

    # F via exclusive cumulative max of U = H' - GE*j, where column 0 also
    # carries the f-boundary chain f[i][0] = GO + i*GO (folded via -GO).
    u = h - GE * cols[None, :]
    u = u.at[:, 0].set(jnp.where(start[:, 0] <= 1,
                                 jnp.maximum(m0, m0 - GO), NEG_INF))
    cmax = jax.lax.cummax(u, axis=1)
    f_chain = jnp.concatenate(
        [jnp.full((B, 1), NEG_INF, jnp.int32), cmax[:, :-1]], axis=1)
    f = GO + GE * cols[None, :] + f_chain
    f = f.at[:, 0].set(m0)

    m_cur = jnp.maximum(h, f)
    m_cur = jnp.where(in_band | col0, m_cur, NEG_INF)
    m_cur = m_cur.at[:, 0].set(m0)

    # out-of-band E must read as the sentinel when the band reaches the
    # column later (reference writes negInf sentinels at the band edges)
    e_cur = jnp.where(in_band | col0, e_cur, NEG_INF)

    active = i <= p_lens
    m_cur = jnp.where(active[:, None], m_cur, m_prev)
    e_keep = jnp.where(active[:, None], e_cur, e_prev)

    final_here = (i == p_lens)
    end_scores = jnp.take_along_axis(m_cur, t_lens[:, None], axis=1)[:, 0]
    score = jnp.where(final_here, end_scores, score)
    return m_cur, e_keep, score


@functools.partial(jax.jit, static_argnames=("Lt", "Lp"))
def _banded_scores_impl(t_codes, t_lens, p_codes, p_lens, Lt: int, Lp: int):
    B = t_codes.shape[0]
    t_lens = t_lens.astype(jnp.int32)
    p_lens = p_lens.astype(jnp.int32)
    diff = t_lens - p_lens
    left_band = 5 + jnp.maximum(-diff, 0)
    right_band = 5 + jnp.maximum(diff, 0)

    cols = jnp.arange(Lt + 1)
    m0_row = (GO + cols * GO).astype(jnp.int32) * (cols > 0)
    m0_row = jnp.broadcast_to(m0_row[None, :], (B, Lt + 1)).astype(jnp.int32)
    # reference boundary quirk: e[0][j] = GO + (lenp+1)*GO for j >= 1
    e0_row = jnp.where(cols[None, :] > 0,
                       GO + (p_lens[:, None] + 1) * GO, 0).astype(jnp.int32)

    def body(i, carry):
        return _row_step(i, carry, t_codes, p_codes, t_lens, p_lens,
                         left_band, right_band, Lt)

    score0 = jnp.take_along_axis(m0_row, t_lens[:, None], axis=1)[:, 0]
    score0 = jnp.where(p_lens == 0, score0 * 0, score0)
    _, _, score = jax.lax.fori_loop(1, Lp + 1, body, (m0_row, e0_row, score0))

    # degenerate cases (reference AlignAlgo.hpp:217-236)
    single = (t_lens == 1) & (p_lens == 1)
    eq = (t_codes[:, 0] == p_codes[:, 0]) | (t_codes[:, 0] == 4) | (p_codes[:, 0] == 4)
    score = jnp.where(single, jnp.where(eq, SCORE_MATCH, SCORE_MISMATCH), score)
    score = jnp.where((t_lens == 0) | (p_lens == 0), 0, score)
    return score


def banded_scores(t_codes, t_lens, p_codes, p_lens):
    """Alignment scores for a padded batch.

    t_codes [B, Lt] int8/int32 (pad value arbitrary), t_lens [B],
    p_codes [B, Lp], p_lens [B].  Returns int32 scores [B].
    """
    t_codes = jnp.asarray(t_codes, jnp.int32)
    p_codes = jnp.asarray(p_codes, jnp.int32)
    return _banded_scores_impl(
        t_codes, jnp.asarray(t_lens), p_codes, jnp.asarray(p_lens),
        int(t_codes.shape[1]), int(p_codes.shape[1]))
