"""Prefix-beam decoder tests mirroring the reference's decoder suite
(/root/reference/test/test_decoding/test_decoders.py) case-for-case in the
new engine's formulation, plus the LM-fusion and carryover semantics."""

import numpy as np
import pytest

from pero_ocr_ray.kernels.beam import (
    BLANK, BigramCharLM, HypothesisBag, LinearCharLM,
    ctc_prefix_beam_decode, greedy_ctc_decode, text_to_lattice,
    validate_letters,
)

LETTERS = ["a", "b", "c", BLANK]


def decode(logits, k=2, **kw):
    return ctc_prefix_beam_decode(np.asarray(logits, float), LETTERS, k,
                                  max_unnormalization=np.inf, **kw)


# ---- CTCPrefixDecodersBeam1Tests analog (both k=1 and k=2, like the
# reference's Beam1/Beam2 class pairing) --------------------------------


@pytest.mark.parametrize("k", [1, 2])
class TestBeamBasics:
    def test_single_frame(self, k):
        assert decode([[0, -80, -80, -80]], k).best_hyp() == "a"

    def test_single_blank_score(self, k):
        bag = decode([[-80, -80, -80, -5.0]], k)
        assert bag.best_hyp() == ""
        assert bag.hyps[0].vis_sc == pytest.approx(-5.0)

    def test_trivial(self, k):
        assert decode([[0, -80, -80, -80]] * 2, k).best_hyp() == "a"

    def test_double_symbol(self, k):
        logits = [[0, -80, -80, -80], [-80, -80, -80, 0], [0, -80, -80, -80]]
        assert decode(logits, k).best_hyp() == "aa"

    def test_two_symbols_immediate(self, k):
        assert decode([[0, -80, -80, -80], [-80, 0, -80, -80]], k
                      ).best_hyp() == "ab"

    def test_continued_symbol(self, k):
        logits = [[0, -80, -80, -80], [0, -80, -80, -80], [-80, -80, -80, 0]]
        assert decode(logits, k).best_hyp() == "a"

    def test_continued_symbol_regression(self, k):
        logits = [[-7e-2, -80, -80, -2.0], [-4e-4, -80, -80, -7.0],
                  [-9e-1, -80, -80, -5e-1], [-80, -80, -80, 0.0]]
        assert decode(logits, k).best_hyp() == "a"

    def test_require_log_probs(self, k):
        with pytest.raises(ValueError):
            ctc_prefix_beam_decode(np.asarray([[-10.0, -80, -80, -10.0]]),
                                   LETTERS, k)


def test_prefix_joining_regression():
    """Wider beam: the same transcript never appears twice; 'a' and ''
    survive (reference CTCPrefixDecoderWiderBeamTests)."""
    logits = [[-2, -10, -80, -2.0], [-4e-4, -80, -80, -7.0],
              [-9e-1, -80, -80, -5e-1], [-80, -80, -80, 0.0]]
    bag = decode(logits, k=2)
    transcripts = [h.transcript for h in bag]
    assert bag.best_hyp() == "a"
    assert len(set(transcripts)) == len(transcripts) == 2
    assert set(transcripts) == {"a", ""}


def test_wide_beam_merged_visual_score():
    """Prefix joining logaddexp-merges the visual paths (reference
    test_wide_beam_regression)."""
    logits = [[-0.1, -8.0, -80, -2.0], [-0.0, -5.0, -80, -80]]
    bag = decode(logits, k=2)
    a_hyps = [h for h in bag if h.transcript == "a"]
    assert len(a_hyps) == 1
    assert a_hyps[0].vis_sc == pytest.approx(np.logaddexp(-0.1, -2.0))


# ---- validation (BlankCheckTests analog) ----------------------------------


def test_letters_must_be_unique():
    with pytest.raises(ValueError):
        validate_letters(["a", "a", BLANK])


def test_blank_must_be_last():
    with pytest.raises(ValueError):
        validate_letters(["a", BLANK, "b"])


def test_beam_must_be_positive_int():
    with pytest.raises(TypeError):
        ctc_prefix_beam_decode(np.zeros((0, 4)), LETTERS, 1.5)
    with pytest.raises(ValueError):
        ctc_prefix_beam_decode(np.zeros((0, 4)), LETTERS, 0)


# ---- greedy (GreedyDecoderTests analog) -----------------------------------


def test_greedy_collapse():
    logits = np.log(np.asarray([
        [0.9, 0.05, 0.025, 0.025],
        [0.9, 0.05, 0.025, 0.025],
        [0.025, 0.025, 0.05, 0.9],
        [0.9, 0.05, 0.025, 0.025],
    ]))
    assert greedy_ctc_decode(logits, LETTERS).best_hyp() == "aa"


# ---- LM fusion (CTCDecodingWithLMTests analog) ----------------------------


def _uniform_lm(bias_a=-10.0, bias_b=-10.0, bias_c=-10.0):
    """State-independent LM preferring per-char biases (the reference's
    get_lm shape: output weights zeroed, per-symbol biases)."""
    return LinearCharLM("abc", emb=[0, 1, 2, 3], w=0.0, b=0.0,
                        out_w=[0, 0, 0, 0],
                        out_b=[-100.0, bias_a, bias_b, bias_c])


def _switching_lm(prefer_after_a="c"):
    """State-dependent LM: at the start state (h=20) it mildly prefers 'b';
    after consuming a char the state grows (h doubles + emb) and the
    preference flips to ``prefer_after_a`` — the reference's bying/cying
    LM construction (test_decoders.get_bying_lm/get_cying_lm)."""
    if prefer_after_a == "c":
        out_w = [0.0, 0.0, -2.0, -1.0]
        out_b = [-100.0, -10.0, 30.0, 0.0]
    else:
        out_w = [0.0, 0.0, -1.0, -2.0]
        out_b = [-100.0, -10.0, 0.0, 30.0]
    return LinearCharLM("abc", emb=[0, 1, 2, 3], w=2.0, b=0.0,
                        out_w=out_w, out_b=out_b, h_init=10.0)


def test_lm_breaks_visual_tie_toward_a():
    bag = decode([[-1, -1, -80, -80]], k=1, lm=_uniform_lm(bias_a=-1))
    assert bag.best_hyp() == "a"
    for h in bag:
        assert h.lm_sc == pytest.approx(
            _uniform_lm(bias_a=-1).sentence_logprob(h.transcript))


def test_lm_breaks_visual_tie_toward_b():
    bag = decode([[-1, -1, -80, -80]], k=1, lm=_uniform_lm(bias_b=-1))
    assert bag.best_hyp() == "b"


def test_lm_tie_repeated_frames():
    bag = decode([[-1, -1, -80, -80]] * 2, k=1, lm=_uniform_lm(bias_b=-1))
    assert bag.best_hyp() == "b"


def test_insertion_bonus_counts_emitted_chars():
    lm = _uniform_lm(-1, -1, -1)
    bag = decode([[-80, -0.1, -80, -0.7]], k=1, lm=lm, insertion_bonus=0.5)
    assert bag.best_hyp() == "b"
    for h in bag:
        assert h.lm_sc == pytest.approx(
            lm.sentence_logprob(h.transcript) + 0.5 * len(h.transcript))


def test_switching_lm_prefers_context_continuation():
    """After seeing 'a', a state-dependent LM flips a visual tie."""
    logits = [[-1, -80, -80, -80], [-80, -1.0, -1.0, -80]]
    bag_c = decode(logits, k=1, lm=_switching_lm("c"))
    assert bag_c.best_hyp() == "ac"
    bag_b = decode(logits, k=1, lm=_switching_lm("b"))
    assert bag_b.best_hyp() == "ab"


def test_model_eos_rescoring():
    """With model_eos, the eos score is added per hypothesis (reference
    test_respecting_eos: the LM's eos preference flips the pick)."""
    # LM state h: after 'a' h=1, after 'b' h=2, after 'c' h=3 (w=0): eos
    # strongly prefers to follow 'b'
    lm = LinearCharLM("abc", emb=[0, 1, 2, 3], w=0.0, b=0.0,
                      out_w=[5.0, 0, 0, 0],
                      out_b=[-10.0, 0.0, 0.0, 0.0])
    logits = [[-0.8, -0.9, -80, -80]]  # visual slightly prefers 'a'
    no_eos = decode(logits, k=2, lm=lm)
    with_eos = decode(logits, k=2, lm=lm, model_eos=True)
    assert no_eos.best_hyp() == "a"
    assert with_eos.best_hyp() == "b"  # eos after b scores 5*2-10 = 0 > -5


def test_lm_scale_recorded_and_applied():
    bag = decode([[-80, -2.0, -80, -1.0]], k=2, lm=_uniform_lm(), lm_scale=0.1)
    assert bag.lm_weight == 0.1
    # scale small enough that the visual blank wins despite LM
    assert bag.best_hyp() in ("", "b")


def test_hidden_state_returns_and_propagates():
    """return_state gives the best hyp's LM state; feeding it back biases
    the next line (the page_parser last_h carryover)."""
    lm = _switching_lm("c")
    bag1, state = decode([[-1, -80, -80, -80]], k=2, lm=lm,
                         return_state=True)
    assert bag1.best_hyp() == "a"
    # second line: visual tie between b and c — carried state prefers c
    bag2 = decode([[-80, -0.9, -1.0, -80]], k=2, lm=lm, init_state=state)
    assert bag2.best_hyp() == "c"
    # fresh state (no carryover): visual order wins
    bag3 = decode([[-80, -0.9, -1.0, -80]], k=2, lm=lm)
    assert bag3.best_hyp() == "b"


def test_posteriors_and_confidence():
    bag = HypothesisBag()
    bag.add("x", np.log(0.75))
    bag.add("y", np.log(0.25))
    post = np.exp(bag.posteriors())
    assert post.sum() == pytest.approx(1.0)
    assert bag.confidence() == pytest.approx(0.75)


# ---- lattice + end-to-end decode stage ------------------------------------


CHARS = "abcdefghijklmnopqrstuvwxyz "
FULL = list(CHARS) + [BLANK]


def test_lattice_roundtrip_greedy():
    lat = text_to_lattice("hello world", FULL, noise=0.1)
    assert greedy_ctc_decode(lat, FULL).best_hyp() == "hello world"


def test_lattice_is_deterministic():
    a = text_to_lattice("same text", FULL, seed_salt="s")
    b = text_to_lattice("same text", FULL, seed_salt="s")
    assert np.array_equal(a, b)
    c = text_to_lattice("same text", FULL, seed_salt="other")
    assert not np.array_equal(a, c)


def test_lm_fixes_noisy_lattice():
    """At high noise greedy misreads some chars; the bigram LM + beam
    recovers more of the true text (the operator's reason to exist)."""
    from pero_ocr_ray.kernels.align import levenshtein_distance
    corpus = ("data stream table merge sort filter batch query window "
              "group join key row column value index scan shuffle ") * 4
    lm = BigramCharLM(CHARS, corpus)
    text = "merge sort table scan index key value row column batch"
    lat = text_to_lattice(text, FULL, noise=0.45, seed_salt="q")
    greedy = greedy_ctc_decode(lat, FULL).best_hyp()
    fused = ctc_prefix_beam_decode(lat, FULL, k=8, lm=lm,
                                   lm_scale=1.0).best_hyp()
    d_greedy = levenshtein_distance(greedy, text)
    d_fused = levenshtein_distance(fused, text)
    assert d_fused <= d_greedy
    assert d_fused < len(text) * 0.1


def test_beam_decode_stage_end_to_end():
    import ray.data as rd
    from pero_ocr_ray.stages.beamdecode import beam_decode
    from pero_ocr_ray.util import dataset_to_table
    rows = [{"doc_id": i,
             "text": "merge sort table scan index key value row " * 2}
            for i in range(6)]
    out = dataset_to_table(beam_decode(rd.from_items(rows), concurrency=2)
                           ).to_pandas().sort_values("doc_id")
    assert len(out) == 6
    assert (out["n_lines"] >= 2).all()          # line split + carryover ran
    assert (out["confidence"] > 0).all()
    # deterministic across runs
    out2 = dataset_to_table(beam_decode(rd.from_items(rows), concurrency=1)
                            ).to_pandas().sort_values("doc_id")
    assert list(out["decoded_text"]) == list(out2["decoded_text"])


def test_lm_seam_custom_factory_via_registry_spec():
    """The LM injection seam (decoding_itf.py:107-136 analog): a toy LM
    obeying the BigramCharLM four-method protocol, handed through a
    registry pipeline spec, changes decoding; the default stays bigram.
    The factory is a closure, so Ray cloudpickles it by value into the
    actor pool — the same path a user module object takes."""
    import ray.data as rd
    from pero_ocr_ray.pipelines.registry import build_from_spec
    from pero_ocr_ray.stages.beamdecode import DECODE_CHARS
    from pero_ocr_ray.util import dataset_to_table

    class VowelLM:
        """Strongly prefers vowels — a deliberately wrong LM whose output
        must therefore differ from the default bigram on noisy lattices."""
        def __init__(self, chars):
            self.boost = np.array(
                [8.0 if c in "aeiou" else -8.0 for c in chars])

        def initial_state(self):
            return 0

        def advance(self, h, sym):
            return 0

        def log_probs(self, h):
            return self.boost

        def eos_score(self, h):
            return 0.0

    def toy_factory(chars):  # closure -> pickled by value
        return VowelLM(chars)

    rows = [{"doc_id": i,
             "text": "merge sort table scan index key value row " * 2}
            for i in range(4)]
    spec_custom = [{"stage": "beam_decode", "concurrency": 1,
                    "lm_factory": toy_factory, "noise": 0.45,
                    "lm_scale": 2.0}]
    spec_default = [{"stage": "beam_decode", "concurrency": 1,
                     "noise": 0.45, "lm_scale": 2.0}]
    got_custom = dataset_to_table(
        build_from_spec(rd.from_items(rows), spec_custom)
    ).to_pandas().sort_values("doc_id")
    got_default = dataset_to_table(
        build_from_spec(rd.from_items(rows), spec_default)
    ).to_pandas().sort_values("doc_id")
    assert len(got_custom) == len(got_default) == 4
    assert (list(got_custom["decoded_text"])
            != list(got_default["decoded_text"]))


def test_lm_seam_string_path_and_errors():
    from pero_ocr_ray.kernels.beam import BigramCharLM
    from pero_ocr_ray.stages.beamdecode import (
        DECODE_CHARS, resolve_lm_factory,
    )
    fac = resolve_lm_factory(
        "pero_ocr_ray.stages.beamdecode:default_lm_factory")
    assert isinstance(fac(DECODE_CHARS), BigramCharLM)
    # dotted form without colon resolves too
    fac2 = resolve_lm_factory(
        "pero_ocr_ray.stages.beamdecode.default_lm_factory")
    assert fac2 is fac
    with pytest.raises(TypeError):
        resolve_lm_factory(42)
    with pytest.raises(TypeError, match="non-callable"):
        resolve_lm_factory("pero_ocr_ray.stages.beamdecode:DECODE_CHARS")
