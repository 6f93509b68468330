"""Transcription-list reader/writer (S5/W7 analogs).

The reference reads/writes ``<id><space><text>`` line files
(/root/reference/pero_ocr/transcription_io.py:7-35, writer
parse_folder.py:351-354). Recast: `read_text` + a vectorized split into a
(key, text) Dataset, and the inverse projection writer.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def read_transcription_list(path: str) -> rd.Dataset:
    """Read `<id> <text>` lines -> Dataset(key:string, text:string)."""
    ds = rd.read_text(path)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["text"].str.split(" ", n=1, expand=True)
        return pd.DataFrame({
            "key": parts[0],
            "text": parts[1].fillna("") if 1 in parts else "",
        })

    return ds.map_batches(split, batch_format="pandas")


def write_transcription_list(ds: rd.Dataset, path: str,
                             key_col: str = "url",
                             text_col: str = "extracted_text") -> None:
    """Write `<key> <single-line text>` lines (newlines flattened to spaces).

    One appended file, matching the reference's output contract
    (parse_folder.py:351-354 concatenates all page annotations into a single
    transcription file); the flatten runs distributed, only the final line
    stream is consumed on the driver."""
    def project(df: pd.DataFrame) -> pd.DataFrame:
        flat = df[text_col].str.replace(r"\s+", " ", regex=True).str.strip()
        return pd.DataFrame({"line": df[key_col] + " " + flat})

    lines = ds.map_batches(project, batch_format="pandas")
    with open(path, "w", encoding="utf-8") as fh:
        for batch in lines.iter_batches(batch_size=4096, batch_format="pandas"):
            fh.write("\n".join(batch["line"]) + "\n")
