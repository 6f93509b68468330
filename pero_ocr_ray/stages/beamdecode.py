"""Beam-decode stage: per-document sequential decoding with LM carryover.

The A5 analog of the reference's LM-fused page decoding
(/root/reference/pero_ocr/document_ocr/page_parser.py:96-156): hidden LM
state is threaded line-to-line WITHIN a document (``last_h`` carryover) and
reset per document, so documents stay independently parallelizable — the
property that lets this run as a plain actor-pool ``map_batches`` stage.

The LM (a deterministic bigram over the corpus vocabulary) is built once
per actor in ``__init__`` — the models-loaded-once engine shape
(page_parser.py:457-483).

LM seam: the reference constructs a user-trained LM from a config path and
hands it to the decoder behind a fixed hidden-state protocol
(/root/reference/pero_ocr/decoding/decoding_itf.py:107-136 building
/root/reference/pero_ocr/decoding/lm_wrapper.py:57-127). The analog here is
``lm_factory``: any callable (or ``"module:attr"`` dotted path, for
JSON/INI pipeline specs) returning an object with the four-method protocol
``initial_state() -> h``, ``advance(h, sym) -> h'``, ``log_probs(h) ->
ndarray[n_chars]``, ``eos_score(h) -> float`` (see
:class:`pero_ocr_ray.kernels.beam.BigramCharLM`, the default). The factory
runs once per actor, so an expensive LM load costs one call per pool
member, not per batch."""

from __future__ import annotations

import pyarrow as pa

from pero_ocr_ray.kernels.beam import (
    BLANK, BigramCharLM, ctc_prefix_beam_decode, text_to_lattice,
)

DECODE_CHARS = "abcdefghijklmnopqrstuvwxyz "

# deterministic seed corpus for the per-actor LM: the pages vocabulary
# (sources/pages.py _WORDS) — the engine's documents draw from it
_SEED_CORPUS = (
    "data stream table merge sort filter batch query window group join key "
    "row column value index scan shuffle block page text line word char span "
    "order part small large fast slow deep wide open close read write "
) * 4


def split_lines(text: str, words_per_line: int = 8) -> list[str]:
    """Deterministic line split for lattice decoding (the reference decodes
    per detected text line; documents here carry flat text)."""
    words = text.split(" ")
    return [" ".join(words[i:i + words_per_line])
            for i in range(0, len(words), words_per_line)] or [""]


def default_lm_factory(chars: str):
    """Default LM: add-one bigram over the engine's seed corpus."""
    return BigramCharLM(chars, _SEED_CORPUS)


def resolve_lm_factory(spec):
    """``None`` -> default; callable -> itself; ``"module:attr"`` (or
    ``"module.attr"``) -> imported attribute. String form exists so
    config-file pipeline specs (JSON/INI, the CLI path) can name a
    user LM factory without holding a Python object."""
    if spec is None:
        return default_lm_factory
    if callable(spec):
        return spec
    if isinstance(spec, str):
        import importlib
        mod, _, attr = (spec.partition(":") if ":" in spec
                        else spec.rpartition("."))
        fn = getattr(importlib.import_module(mod), attr)
        if not callable(fn):
            raise TypeError(f"lm_factory {spec!r} resolved to non-callable")
        return fn
    raise TypeError(f"lm_factory must be None, callable or 'module:attr' "
                    f"string, got {type(spec).__name__}")


class BeamDecodeStage:
    """Actor pool: (doc_id, text) -> (doc_id, decoded_text, confidence,
    n_lines). The lattice is synthesized deterministically from the text
    (hash-derived confusions); the beam+LM must undo the confusions.

    ``lm_factory`` is the user-LM injection seam (module docstring); it is
    called once here with the decode alphabet and must return an object
    implementing the BigramCharLM protocol."""

    def __init__(self, k: int = 4, lm_scale: float = 0.8,
                 noise: float = 0.35, chars: str = DECODE_CHARS,
                 lm_factory=None):
        self.letters = list(chars) + [BLANK]
        self.lm = resolve_lm_factory(lm_factory)(chars)
        self.k = k
        self.lm_scale = lm_scale
        self.noise = noise

    def __call__(self, batch: pa.Table) -> pa.Table:
        supported = set(self.letters) - {BLANK}
        ids, texts, confs, nlines = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            try:
                # lattice alphabet is lowercase+space: normalize and drop
                # unsupported chars up front (a poison doc must degrade,
                # never kill the batch — skip-and-continue invariant)
                clean = "".join(c for c in (text or "").lower()
                                if c in supported)
                state = None  # per-document LM reset (last_h reset analog)
                decoded, conf_min = [], 1.0
                for j, line in enumerate(split_lines(clean)):
                    lattice = text_to_lattice(line, self.letters, self.noise,
                                              seed_salt=f"{did}:{j}")
                    bag, state = ctc_prefix_beam_decode(
                        lattice, self.letters, self.k, lm=self.lm,
                        lm_scale=self.lm_scale, init_state=state,
                        return_state=True)
                    decoded.append(bag.best_hyp())
                    conf_min = min(conf_min, bag.confidence())
                texts.append("\n".join(decoded))
                confs.append(conf_min)
                nlines.append(len(decoded))
            except Exception:  # per-row degradation, never a batch failure
                texts.append("")
                confs.append(0.0)
                nlines.append(0)
            ids.append(did)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "decoded_text": pa.array(texts, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
            "n_lines": pa.array(nlines, pa.int64()),
        })


def beam_decode(ds, concurrency: int = 2, batch_size: int = 32,
                **stage_kwargs):
    return ds.map_batches(BeamDecodeStage,
                          fn_constructor_kwargs=stage_kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
