"""RTL post-processing over extraction output (M14 as a pipeline op).

Optional projection: add a ``visual_text`` column with Arabic runs reordered
for LTR display, applied only to rows whose ``lang`` is RTL or whose text
detects as majority-Arabic. ``extracted_text`` (logical order) is untouched
— byte-identity is preserved.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from pero_ocr_ray.kernels.rtl import is_arabic, logical_to_visual

RTL_LANGS = frozenset({"ar", "fa", "ur", "he"})


def visual_order(ds: rd.Dataset) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        langs = (batch.column("lang").to_pylist()
                 if "lang" in batch.column_names
                 else [""] * batch.num_rows)
        out = []
        for lang, text in zip(langs, batch.column("extracted_text").to_pylist()):
            if lang in RTL_LANGS or is_arabic(text):
                out.append("\n".join(logical_to_visual(line)
                                     for line in text.split("\n")))
            else:
                out.append(text)
        return batch.append_column("visual_text", pa.array(out, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")
