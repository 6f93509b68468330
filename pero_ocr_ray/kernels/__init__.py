"""Pure, deterministic per-document kernels.

Shared verbatim between the sequential oracle and the Ray stages so the
pipeline's ``extracted_text`` is byte-identical to the oracle's per url
(the correctness invariant in BASELINE.json). No RNG, no wall-clock, no
dict-order dependence anywhere in these modules.
"""
