"""CTC Viterbi forced alignment (F2).

Capability port of the reference's forced-alignment module
(/root/reference/pero_ocr/core/force_alignment.py:13-147): align a known
symbol sequence to per-frame CTC negative log-probabilities, returning the
most probable frame-level state path (including blanks), the per-character
frame positions, and per-character confidences.

The formulation here is deliberately different from the reference's
(which materializes a dense states x states transition matrix and walks its
finite entries per frame): CTC's topology permits exactly three incoming
transitions per state — stay, advance by one, and skip the separating blank
when adjacent symbols differ — so the DP is three shifted vector ops per
frame. Tie-breaking matches the reference exactly: on equal cost the
SMALLEST predecessor state wins (skip > advance > stay), and the final
frame prefers the last symbol state over the trailing blank.

Everything is deterministic pure numpy — usable verbatim inside Ray stages
and the sequential oracle.
"""

from __future__ import annotations

import numpy as np


def expand_symbols(symbols: list[int], blank: int) -> np.ndarray:
    """CTC state sequence [blank, s0, blank, s1, ..., blank]."""
    symbols = list(symbols)
    if blank in symbols:
        raise ValueError(f"blank symbol {blank} occurs in the symbol seq")
    out = np.full(2 * len(symbols) + 1, blank, dtype=np.int64)
    out[1::2] = symbols
    return out


def state_char_positions(n_symbols: int) -> np.ndarray:
    """For each CTC state, the index of the character it emits (-1 = blank)."""
    pos = np.full(2 * n_symbols + 1, -1, dtype=np.int64)
    pos[1::2] = np.arange(n_symbols)
    return pos


def _skip_allowed(symbols: list[int]) -> np.ndarray:
    """Mask over states: may state i be entered from state i-2?

    True only for symbol states (odd i >= 3) whose symbol differs from the
    previous one — the standard CTC rule that repeated symbols must keep
    their separating blank."""
    n_states = 2 * len(symbols) + 1
    allow = np.zeros(n_states, dtype=bool)
    for k in range(1, len(symbols)):
        if symbols[k] != symbols[k - 1]:
            allow[2 * k + 1] = True
    return allow


def ctc_force_align(neg_logprobs: np.ndarray, symbols: list[int],
                    blank: int, return_seq_positions: bool = False
                    ) -> list[int]:
    """Most probable CTC state path for ``symbols`` under ``neg_logprobs``.

    Args:
        neg_logprobs: (frames, n_classes) negative log-probabilities.
        symbols: the known transcription as symbol ids.
        return_seq_positions: when True return per-frame CHARACTER indices
            (-1 for blank frames) instead of per-frame symbol ids.

    Returns one entry per frame. Raises ValueError on an empty symbol
    sequence, a blank inside ``symbols``, out-of-range symbol ids, or an
    impossible alignment (more required states than frames).
    """
    if len(symbols) == 0:
        raise ValueError("cannot align an empty symbol sequence")
    neg_logprobs = np.asarray(neg_logprobs, dtype=np.float64)
    if neg_logprobs.ndim != 2:
        raise ValueError("neg_logprobs must be 2-D (frames, classes)")
    states = expand_symbols(symbols, blank)
    if int(np.max(states)) >= neg_logprobs.shape[1] or int(np.min(states)) < 0:
        raise ValueError("symbol id out of range of the logit classes")
    n_frames = neg_logprobs.shape[0]
    n_states = len(states)
    # per-frame cost of each state = cost of its emitted class
    frame_costs = neg_logprobs[:, states]          # (frames, states)
    allow_skip = _skip_allowed(list(symbols))

    inf = np.inf
    cost = np.full(n_states, inf)
    cost[0] = frame_costs[0, 0]
    if n_states > 1:
        cost[1] = frame_costs[0, 1]
    # backpointers delta-coded (0=stay, 1=advance, 2=skip): uint8 keeps the
    # (frames x states) table 8x smaller than state indices — long lines
    # would otherwise allocate hundreds of MB per call
    backptr = np.zeros((n_frames, n_states), dtype=np.uint8)

    for t in range(1, n_frames):
        adv = np.concatenate(([inf], cost[:-1]))      # from state i-1
        skp = np.concatenate(([inf, inf], cost[:-2]))  # from state i-2
        skp = np.where(allow_skip, skp, inf)
        # tie-break = smallest predecessor: seed with skip, strictly better
        # candidates overwrite (advance beats skip only when cheaper, stay
        # beats both only when cheaper) — reference compute_update semantics
        best = skp
        bp = np.full(n_states, 2, dtype=np.uint8)
        take = adv < best
        best = np.where(take, adv, best)
        bp[take] = 1
        take = cost < best
        best = np.where(take, cost, best)
        bp[take] = 0
        cost = best + frame_costs[t]
        backptr[t] = bp

    final = cost.copy()
    if n_states > 2:
        final[:-2] = inf
    if not np.isfinite(final.min()):
        raise ValueError("alignment impossible: no finite-cost path reaches "
                         "the final states")
    state = int(np.argmin(final))
    path = [state]
    for t in range(n_frames - 1, 0, -1):
        state -= int(backptr[t, state])
        path.append(state)
    path.reverse()
    if return_seq_positions:
        char_pos = state_char_positions(len(symbols))
        return [int(char_pos[s]) for s in path]
    return [int(states[s]) for s in path]


def ctc_char_positions(neg_logprobs: np.ndarray, symbols: list[int],
                       blank: int) -> np.ndarray:
    """Best frame per character: among the frames force-aligned to char k,
    the one whose overall max class probability peaks (ties -> first frame)
    — the align_text analog
    (/root/reference/pero_ocr/core/force_alignment.py:150-165)."""
    frame_chars = np.asarray(
        ctc_force_align(neg_logprobs, symbols, blank,
                        return_seq_positions=True))
    max_probs = (-np.asarray(neg_logprobs, dtype=np.float64)).max(axis=-1)
    # vectorized per-char argmax (argmax ties -> first frame): sort frames
    # by (char asc, prob desc, frame asc) and take each char's first row
    sel = frame_chars >= 0
    frames = np.nonzero(sel)[0]
    chars = frame_chars[sel]
    order = np.lexsort((frames, -max_probs[frames], chars))
    chars_sorted = chars[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = chars_sorted[1:] != chars_sorted[:-1]
    out = np.zeros(len(symbols), dtype=np.int64)
    out[chars_sorted[first]] = frames[order][first]
    return out


def ctc_char_confidences(neg_logprobs: np.ndarray, symbols: list[int],
                         blank: int) -> np.ndarray:
    """Per-character confidence: probability of the character's class at its
    best aligned frame (exp of the negative log-prob) — the confidence
    source for ALTO word WC values (layout.py word confidence analog)."""
    positions = ctc_char_positions(neg_logprobs, symbols, blank)
    neg = np.asarray(neg_logprobs, dtype=np.float64)
    return np.exp(-neg[positions, np.asarray(symbols, dtype=np.int64)])
