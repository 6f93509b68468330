"""Prefix-beam decoding with optional char-LM fusion (M15/M16/A5 analog).

Capability parity with the reference's richest operator — the CTC prefix
beam search (/root/reference/pero_ocr/decoding/decoders.py:170-299) with a
carried language-model hidden state (lm_wrapper.py:57-127) that the page
parser threads line-to-line within a document and resets per document
(document_ocr/page_parser.py:96-156).

Independent implementation: the reference vectorizes a (beam × chars)
score matrix with explicit prefix-joining bookkeeping; here the classic
per-prefix dict formulation is used (each beam entry carries its blank /
non-blank path scores, so prefix merging falls out of the dict key), in
log space throughout. Differences from the reference, by design:

* LM scores are normalized log-probs (log-softmax over [eos]+chars), not
  raw decoder scores;
* tie-breaks are deterministic on the prefix itself (byte-identity rule —
  the engine bans nondeterminism, CLAUDE.md).

Semantics mirrored from the reference's test suite
(test/test_decoding/test_decoders.py): blank-collapse, double-symbol via
blank, prefix joining (same transcript never appears twice, scores
logaddexp-merged), insertion bonus per emitted char, lm_scale weighting,
eos modeling, hidden state of the best hypothesis returned and accepted
(line-to-line carryover).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

BLANK = "<blank>"
LOG_ZERO = -np.inf
RELEVANCE_THRESHOLD = -10.0  # select_relevant_logits analog (decoders.py:216)


def validate_letters(letters: list[str]) -> None:
    seen = set()
    dups = [x for x in letters if x in seen or seen.add(x)]
    if dups:
        raise ValueError(f"duplicate letters: {dups}")
    if letters.index(BLANK) != len(letters) - 1:
        raise ValueError(f"{BLANK!r} must be the last letter")


def validate_beam(k) -> None:
    if not isinstance(k, int):
        raise TypeError(f"beam size must be int, got {type(k)}")
    if k < 1:
        raise ValueError(f"beam size must be positive, got {k}")


def logprob_deviation(logprobs: np.ndarray) -> float:
    return float(np.max(np.abs(np.exp(logprobs).sum(axis=1) - 1.0)))


class Hypothesis(NamedTuple):
    transcript: str
    vis_sc: float
    lm_sc: float | None


class HypothesisBag:
    """Scored alternatives for one line (BagOfHypotheses analog)."""

    def __init__(self, lm_weight: float = 1.0):
        self.hyps: list[Hypothesis] = []
        self.lm_weight = lm_weight

    def add(self, transcript: str, vis_sc: float,
            lm_sc: float | None = None) -> None:
        self.hyps.append(Hypothesis(transcript, vis_sc, lm_sc))

    def total_scores(self) -> list[float]:
        return [h.vis_sc + self.lm_weight * (h.lm_sc or 0.0)
                for h in self.hyps]

    def sort(self) -> None:
        # deterministic: score desc, then transcript
        order = sorted(range(len(self.hyps)),
                       key=lambda i: (-self.total_scores()[i],
                                      self.hyps[i].transcript))
        self.hyps = [self.hyps[i] for i in order]

    def posteriors(self) -> list[float]:
        scores = self.total_scores()
        total = float(np.logaddexp.reduce(scores)) if scores else LOG_ZERO
        return [s - total for s in scores]

    def confidence(self) -> float:
        post = self.posteriors()
        return math.exp(max(post)) if post else 0.0

    def best_hyp(self) -> str:
        self.sort()
        return self.hyps[0].transcript if self.hyps else ""

    def __iter__(self):
        return iter(self.hyps)

    def __len__(self):
        return len(self.hyps)


class LinearCharLM:
    """Deterministic scalar-recurrence character LM (the LMWrapper analog,
    sized for tests and the refinement stage — a real NN LM would slot in
    behind the same four methods).

    State is one float ``h``; vocabulary index 0 is ``<eos>`` (doubles as
    the start symbol, like the reference's ``</s>``), chars follow.

        advance:   h' = emb[sym] + w * h + b
        scores:    log_softmax(out_w * h + out_b) over [<eos>] + chars
    """

    def __init__(self, chars: str, emb: list[float], w: float, b: float,
                 out_w: list[float], out_b: list[float], h_init: float = 0.0):
        n = len(chars) + 1
        assert len(emb) == len(out_w) == len(out_b) == n
        self.chars = chars
        self.emb = np.asarray(emb, dtype=np.float64)
        self.w = float(w)
        self.b = float(b)
        self.out_w = np.asarray(out_w, dtype=np.float64)
        self.out_b = np.asarray(out_b, dtype=np.float64)
        self.h_init = float(h_init)
        self.index = {c: i + 1 for i, c in enumerate(chars)}

    def initial_state(self) -> float:
        # consume the start symbol, like LMWrapper.initial_h
        return self.advance(self.h_init, 0)

    def advance(self, h: float, sym: int) -> float:
        return float(self.emb[sym] + self.w * h + self.b)

    def _log_softmax(self, h: float) -> np.ndarray:
        y = self.out_w * h + self.out_b
        m = y.max()
        return y - (m + math.log(np.exp(y - m).sum()))

    def log_probs(self, h: float) -> np.ndarray:
        """Per-char next-symbol log-probs (excludes eos; index = char)."""
        return self._log_softmax(h)[1:]

    def eos_score(self, h: float) -> float:
        return float(self._log_softmax(h)[0])

    def sentence_logprob(self, text: str, with_eos: bool = False) -> float:
        """Independent path for tests: sum of per-step log-probs."""
        h = self.initial_state()
        total = 0.0
        for c in text:
            total += float(self.log_probs(h)[self.index[c] - 1])
            h = self.advance(h, self.index[c])
        if with_eos:
            total += self.eos_score(h)
        return total


class BigramCharLM:
    """Add-one-smoothed bigram char LM trained from a seed corpus — the
    practical deterministic LM for the refinement stage."""

    def __init__(self, chars: str, corpus: str):
        self.chars = chars
        self.index = {c: i + 1 for i, c in enumerate(chars)}
        n = len(chars) + 1  # 0 = eos/start
        counts = np.ones((n, n), dtype=np.float64)  # add-one smoothing
        prev = 0
        for c in corpus:
            cur = self.index.get(c)
            if cur is None:
                continue
            counts[prev, cur] += 1
            prev = cur
        counts[prev, 0] += 1
        self._logp = np.log(counts / counts.sum(axis=1, keepdims=True))

    def initial_state(self) -> int:
        return 0

    def advance(self, h: int, sym: int) -> int:
        return sym

    def log_probs(self, h: int) -> np.ndarray:
        return self._logp[h, 1:]

    def eos_score(self, h: int) -> float:
        return float(self._logp[h, 0])


class _Entry(NamedTuple):
    pb: float        # log P(prefix, ending in blank)
    pnb: float       # log P(prefix, ending in non-blank)
    lm: float        # accumulated LM log-prob (+ insertion bonus)
    state: object    # LM state after consuming the prefix


def _merge(d: dict, prefix: tuple, pb: float, pnb: float, lm: float,
           state) -> None:
    e = d.get(prefix)
    if e is None:
        d[prefix] = _Entry(pb, pnb, lm, state)
    else:
        # same prefix reached twice: visual paths logaddexp-merge (the
        # reference's adjust_for_prefix_joining); LM score/state are a
        # function of the prefix alone, so they already agree
        d[prefix] = _Entry(np.logaddexp(e.pb, pb), np.logaddexp(e.pnb, pnb),
                           e.lm, e.state)


def ctc_prefix_beam_decode(
        logprobs: np.ndarray, letters: list[str], k: int,
        lm=None, lm_scale: float = 1.0, insertion_bonus: float = 0.0,
        model_eos: bool = False, init_state=None, return_state: bool = False,
        max_unnormalization: float = 1e-5):
    """Decode a (T × len(letters)) log-prob matrix (blank last column).

    Returns a :class:`HypothesisBag`; with ``return_state`` also the LM
    state of the best hypothesis (for line-to-line carryover)."""
    validate_letters(letters)
    validate_beam(k)
    logprobs = np.asarray(logprobs, dtype=np.float64)
    if logprobs.size and logprob_deviation(logprobs) > max_unnormalization:
        raise ValueError("expected normalized log-probs per frame")
    blank = len(letters) - 1

    state0 = (init_state if init_state is not None
              else (lm.initial_state() if lm else None))
    beams: dict[tuple, _Entry] = {(): _Entry(0.0, LOG_ZERO, 0.0, state0)}

    for frame in logprobs:
        p_blank = frame[blank]
        relevant = [c for c in range(blank)
                    if frame[c] > RELEVANCE_THRESHOLD]
        new: dict[tuple, _Entry] = {}
        for prefix, e in beams.items():
            p_total = np.logaddexp(e.pb, e.pnb)
            # stay on this prefix: blank, or a repeat of the last char
            pnb_same = (e.pnb + frame[prefix[-1]]) if prefix else LOG_ZERO
            _merge(new, prefix, p_total + p_blank, pnb_same, e.lm, e.state)
            if not relevant:
                continue
            lm_lp = lm.log_probs(e.state) if lm else None
            for c in relevant:
                if prefix and c == prefix[-1]:
                    # same char again only via an intervening blank
                    p_new = e.pb + frame[c]
                else:
                    p_new = p_total + frame[c]
                if p_new == LOG_ZERO:
                    continue
                if lm:
                    lm_new = e.lm + float(lm_lp[c]) + insertion_bonus
                    st_new = lm.advance(e.state, c + 1)
                else:
                    lm_new, st_new = 0.0, None
                _merge(new, prefix + (c,), LOG_ZERO, p_new, lm_new, st_new)

        # prune to the beam: total score desc, deterministic prefix tiebreak
        def key(item):
            prefix, e = item
            vis = np.logaddexp(e.pb, e.pnb)
            return (-(vis + lm_scale * e.lm), prefix)
        beams = dict(sorted(new.items(), key=key)[:k])

    bag = HypothesisBag(lm_weight=lm_scale)
    best_state, best_score = state0, LOG_ZERO
    for prefix, e in beams.items():
        vis = float(np.logaddexp(e.pb, e.pnb))
        lm_sc = None
        if lm:
            lm_sc = e.lm + (lm.eos_score(e.state) if model_eos else 0.0)
        text = "".join(letters[c] for c in prefix)
        bag.add(text, vis, lm_sc)
        total = vis + lm_scale * (lm_sc or 0.0)
        if total > best_score:
            best_score, best_state = total, e.state
    bag.sort()
    if return_state:
        return bag, best_state
    return bag


def greedy_ctc_decode(logprobs: np.ndarray, letters: list[str],
                      max_unnormalization: float = 1e-5) -> HypothesisBag:
    """Best-path collapse (GreedyDecoder analog, decoders.py:42-62)."""
    validate_letters(letters)
    logprobs = np.asarray(logprobs, dtype=np.float64)
    if logprobs.size and logprob_deviation(logprobs) > max_unnormalization:
        raise ValueError("expected normalized log-probs per frame")
    blank = len(letters) - 1
    args = logprobs.argmax(axis=1) if logprobs.size else np.array([], int)
    out, prev = [], -1
    for a in args:
        if a != prev and a != blank:
            out.append(letters[a])
        prev = a
    bag = HypothesisBag()
    score = float(np.logaddexp.reduce(logprobs.max(axis=1))) if logprobs.size else 0.0
    bag.add("".join(out), score)
    return bag


# ---------------------------------------------------------------------------
# deterministic lattice synthesis (tests / the decode query): text -> a
# noisy CTC log-prob lattice whose ambiguities an LM can resolve
# ---------------------------------------------------------------------------


def text_to_lattice(text: str, letters: list[str], noise: float = 0.25,
                    seed_salt: str = "") -> np.ndarray:
    """Deterministic per-char lattice: each char becomes a frame with most
    mass on the true char and ``noise`` mass on an md5-chosen confusable;
    a blank frame follows every char (hash-derived, never RNG state)."""
    import hashlib
    validate_letters(letters)
    blank = len(letters) - 1
    index = {c: i for i, c in enumerate(letters)}
    frames = []
    for pos, ch in enumerate(text):
        c = index[ch]
        digest = hashlib.md5(f"{seed_salt}:{pos}:{ch}".encode()).digest()
        alt = digest[0] % blank
        p = np.full(len(letters), 1e-9)
        if alt == c:
            p[c] = 1.0
        else:
            p[c] = 1.0 - noise
            p[alt] = noise
        p /= p.sum()
        frames.append(np.log(p))
        pb = np.full(len(letters), 1e-9)
        pb[blank] = 1.0
        pb /= pb.sum()
        frames.append(np.log(pb))
    return (np.asarray(frames) if frames
            else np.zeros((0, len(letters)), dtype=np.float64))
