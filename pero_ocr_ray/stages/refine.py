"""Sequential per-document refinement (A5 analog).

The reference's LM-decoder carries hidden state line-to-line *within* a page
and resets it per page (/root/reference/pero_ocr/document_ocr/page_parser.py:
96-156, ``last_h`` reset at :104-106). The extraction-domain analog: a
refinement pass whose decision at line N depends on line N-1 — here,
de-hyphenation across line breaks ("exam-\\nple" -> "example") — run as an
actor-pool stage where each document is processed sequentially inside its
row, so state never crosses documents and rows stay independently
parallelizable (exactly the property that makes A5 safe to distribute).

Refinement writes a NEW column (``refined_text``); ``extracted_text`` stays
byte-identical to the oracle (the refinement itself is deterministic and
oracle-shared via the kernel below).
"""

from __future__ import annotations

import re

import pyarrow as pa

_HYPH_END = re.compile(r"([A-Za-z]{2,})-$")
_WORD_START = re.compile(r"^([a-z]{2,})\b")


def dehyphenate_text(text: str) -> str:
    """Join words split by a hyphen at a line break, per block.

    Sequential over lines: whether line N merges depends on how line N-1
    ended (the carried state). Paragraph breaks (``\\n\\n``) reset the
    state — the per-page reset analog. A merged pair becomes one line."""
    out_blocks = []
    for block in text.split("\n\n"):
        lines = block.split("\n")
        out: list[str] = []
        i = 0
        while i < len(lines):
            line = lines[i]
            if (i + 1 < len(lines) and _HYPH_END.search(line)
                    and _WORD_START.match(lines[i + 1])):
                # drop the hyphen and continue the word on the next line
                lines[i + 1] = line[:-1] + lines[i + 1]
                i += 1
                continue
            out.append(line)
            i += 1
        out_blocks.append("\n".join(out))
    return "\n\n".join(out_blocks)


class RefineStage:
    """Actor-pool stage adding ``refined_text`` (dehyphenated)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refined = [dehyphenate_text(t)
                   for t in batch.column("extracted_text").to_pylist()]
        return batch.append_column("refined_text",
                                   pa.array(refined, pa.string()))


def refine(ds, concurrency: int = 2):
    return ds.map_batches(RefineStage, batch_format="pyarrow",
                          concurrency=concurrency)
