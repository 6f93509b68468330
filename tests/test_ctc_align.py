"""CTC Viterbi forced-alignment tests (F2), mirroring the reference's
test/test_force_alignment.py case coverage over the engine's independent
3-transition formulation, plus a brute-force path-enumeration property test
and the ALTO WC wiring."""

import hashlib

import numpy as np
import pytest

from pero_ocr_ray.kernels.ctc_align import (
    ctc_char_confidences, ctc_char_positions, ctc_force_align,
    expand_symbols, state_char_positions, _skip_allowed,
)


# ---- state-sequence construction (complete_state_seq analog) --------------

def test_expand_trivial():
    assert expand_symbols([1], 0).tolist() == [0, 1, 0]
    assert state_char_positions(1).tolist() == [-1, 0, -1]


def test_expand_two_letter():
    assert expand_symbols([1, 2], 0).tolist() == [0, 1, 0, 2, 0]
    assert state_char_positions(2).tolist() == [-1, 0, -1, 1, -1]


def test_expand_rejects_blank_in_symbols():
    with pytest.raises(ValueError):
        expand_symbols([1, 0, 2], 0)


# ---- skip-transition rule (hmm_trans_from_string analog) ------------------

def test_skip_mask_different_letters():
    # [1, 2]: states b 1 b 2 b — state 3 (symbol 2) may skip the blank
    assert _skip_allowed([1, 2]).tolist() == [False] * 3 + [True, False]


def test_skip_mask_same_letters():
    # [1, 1]: repeated symbol must keep its separating blank
    assert _skip_allowed([1, 1]).tolist() == [False] * 5


def test_empty_symbols_rejected():
    with pytest.raises(ValueError):
        ctc_force_align(np.zeros((2, 2)), [], 0)


# ---- top-level alignment (force_align analog, same expected paths) --------

def test_align_trivial():
    neg = np.asarray([[0.0, 10.0], [10.0, 0.0]])
    assert ctc_force_align(neg, [1], 0) == [0, 1]


def test_align_single_symbol_multi_blank():
    neg = np.asarray([
        [0.0, 10.0, 0.0], [0.0, 10.0, 0.0], [0.0, 10.0, 0.0],
        [10.0, 0.0, 10.0], [0.0, 10.0, 0.0], [0.0, 10.0, 0.0]])
    assert ctc_force_align(neg, [1], 0) == [0, 0, 0, 1, 0, 0]


def test_align_multi_frame_symbol():
    neg = np.asarray([
        [0.0, 10.0, 0.0], [0.0, 10.0, 0.0], [10.0, 0.0, 10.0],
        [10.0, 0.0, 10.0], [10.0, 0.0, 10.0], [0.0, 10.0, 0.0]])
    assert ctc_force_align(neg, [1], 0) == [0, 0, 1, 1, 1, 0]


def test_align_respects_final_states():
    # cheapest raw path would stay in the leading blank; the final-state
    # constraint forces the symbol to be consumed
    neg = np.asarray([[0.0, 10.0], [0.0, 8.0], [0.0, 10.0]])
    assert ctc_force_align(neg, [1], 0) == [0, 1, 0]


def test_align_repeated_symbol_regression():
    neg = np.asarray([
        [0.0, 10.0, 10.0], [10.0, 10.0, 0.0],
        [5.0, 10.0, 5.0], [10.0, 10.0, 0.0]])
    assert ctc_force_align(neg, [2, 2], 0) == [0, 2, 0, 2]


def test_align_skips_leading_blank_regression():
    neg = np.asarray([[10.0, 10.0, 0.0], [0.0, 10.0, 10.0]])
    # 2 frames for 2 distinct symbols: must enter at symbol 1... the only
    # valid assignment is [2, 1]? No: symbols [1, 2] in order — frame 0 must
    # be symbol 1, frame 1 symbol 2 via the blank skip... but costs favor
    # class 2 then class 0. Reference expects the blank-skip path [1, 2]:
    assert ctc_force_align(neg, [1, 2], 0) == [1, 2]


def test_align_impossible_raises():
    # repeated symbol needs >= 3 frames (1, blank, 1)
    with pytest.raises(ValueError):
        ctc_force_align(np.zeros((2, 3)), [1, 1], 0)
    # inf-cost class makes every path infinite
    neg = np.full((3, 2), 0.0)
    neg[:, 1] = np.inf
    with pytest.raises(ValueError):
        ctc_force_align(neg, [1], 0)


def test_align_symbol_out_of_range():
    with pytest.raises(ValueError):
        ctc_force_align(np.zeros((3, 2)), [2], 0)


def test_align_seq_positions():
    neg = np.asarray([
        [0.0, 10.0, 0.0], [10.0, 0.0, 10.0],
        [0.0, 10.0, 0.0], [10.0, 10.0, 0.0]])
    # frame -> character index (-1 = blank)
    assert ctc_force_align(neg, [1, 2], 0, return_seq_positions=True) \
        == [-1, 0, -1, 1]


# ---- brute-force property test -------------------------------------------

def _all_paths(n_frames, symbols):
    """Every valid CTC state path (monotone through the expanded states,
    skips only between distinct symbols, ends in the last two states)."""
    n_states = 2 * len(symbols) + 1
    skip_ok = _skip_allowed(symbols)
    paths = []

    def go(t, s, acc):
        if t == n_frames:
            if s >= n_states - 2:
                paths.append(list(acc))
            return
        for nxt in (s, s + 1, s + 2):
            if nxt >= n_states:
                continue
            if nxt == s + 2 and not skip_ok[nxt]:
                continue
            acc.append(nxt)
            go(t + 1, nxt, acc)
            acc.pop()

    for s0 in (0, 1):
        go(1, s0, [s0])
    return paths


@pytest.mark.parametrize("case", range(8))
def test_viterbi_matches_bruteforce(case):
    """Viterbi cost equals exhaustive-enumeration minimum on random-ish
    (hash-derived, deterministic) lattices; the chosen path is optimal."""
    h = hashlib.md5(f"ctc{case}".encode()).digest()
    n_frames = 4 + h[0] % 3
    symbols = [1 + (b % 3) for b in h[1:1 + (1 + h[4] % 2)]]
    n_classes = 5
    costs = np.array([
        [(hashlib.md5(f"{case}:{t}:{c}".encode()).digest()[0] % 100) / 10.0
         for c in range(n_classes)] for t in range(n_frames)])
    states = expand_symbols(symbols, 0)
    paths = _all_paths(n_frames, symbols)
    if not paths:
        with pytest.raises(ValueError):
            ctc_force_align(costs, symbols, 0)
        return
    best_cost = min(sum(costs[t, states[s]] for t, s in enumerate(p))
                    for p in paths)
    got = ctc_force_align(costs, symbols, 0)
    # recover the state path cost from the emitted symbol path
    got_states = ctc_force_align(costs, symbols, 0,
                                 return_seq_positions=True)
    cost = 0.0
    for t, (sym, pos) in enumerate(zip(got, got_states)):
        cost += costs[t, sym]
    assert cost == pytest.approx(best_cost)


# ---- char positions / confidences (align_text analog) ---------------------

def test_char_positions_pick_peak_frames():
    neg = np.asarray([
        [0.1, 5.0, 5.0],   # confident blank
        [5.0, 0.2, 5.0],   # symbol 1 (weak)
        [5.0, 0.05, 5.0],  # symbol 1 (strong) <- best frame for char 0
        [0.1, 5.0, 5.0],
        [5.0, 5.0, 0.1],   # symbol 2
    ])
    pos = ctc_char_positions(neg, [1, 2], 0)
    assert pos.tolist() == [2, 4]
    confs = ctc_char_confidences(neg, [1, 2], 0)
    assert confs == pytest.approx([np.exp(-0.05), np.exp(-0.1)])


# ---- ALTO WC wiring -------------------------------------------------------

def test_alto_aligned_word_confidences():
    """to_alto_aligned WC values come from forced alignment: they vary per
    word and equal a sequential recompute through the same kernels."""
    import re
    from pero_ocr_ray.kernels.config import DEFAULT_CONFIG
    from pero_ocr_ray.kernels.emit import parse_payload, segment_blocks
    from pero_ocr_ray.kernels.order import reading_order
    from pero_ocr_ray.kernels.score import classify_blocks
    from pero_ocr_ray.sources.pagexml import (
        aligned_line_confidences, page_to_alto,
    )
    html = (b"<html><body><article><p>alpha beta gamma delta epsilon "
            b"zeta eta theta</p></article></body></html>")
    blocks, kind, enc, err = parse_payload(html, DEFAULT_CONFIG)
    segment_blocks(blocks)
    classify_blocks(blocks, DEFAULT_CONFIG)
    reading_order([b for b in blocks if b["keep"]])
    row = {"url": "https://x.example/a", "blocks": blocks,
           "payload_kind": kind, "encoding": enc, "error": err,
           "warc_ts": None}
    confs = aligned_line_confidences(row)
    assert confs  # at least one aligned line
    xml = page_to_alto(row, line_confidences=confs)
    wcs = [float(m) for m in re.findall(r'WC="([0-9.]+)"', xml)]
    assert len(wcs) == 8          # one WC per word
    assert all(0.0 <= w <= 1.0 for w in wcs)
    assert len(set(wcs)) > 1      # alignment-derived, not one block score
    # sequential recompute must match exactly
    xml2 = page_to_alto(row, line_confidences=aligned_line_confidences(row))
    assert xml == xml2
    # without confidences, WC falls back to the (out-of-range ok) block score
    xml_plain = page_to_alto(row)
    assert xml_plain != xml
