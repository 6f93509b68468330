"""Partition manifest: the resume mechanism.

Analog of the reference's skip-processed set intersection
(/root/reference/user_scripts/parse_folder.py:73-102,314-323): instead of
re-listing output directories, each completed partition commits one JSON
record (atomic write-then-rename). On restart, committed partitions are
anti-joined away from the work list; partially-written output (temp dirs)
is invisible because the rename happens only after a successful write.

Per-partition lineage + metrics (source file, row counts) live in the
manifest records — the checkpointed counters the north-star requires.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)

    def completed(self) -> set[str]:
        return {f[:-5] for f in os.listdir(self.dir) if f.endswith(".json")}

    def commit(self, key: str, record: dict) -> None:
        record = dict(record, partition=key)
        tmp = os.path.join(self.dir, f".{key}.tmp")
        with open(tmp, "w") as fh:
            json.dump(record, fh)
        os.replace(tmp, os.path.join(self.dir, f"{key}.json"))

    def records(self) -> list[dict]:
        out = []
        for key in sorted(self.completed()):
            with open(os.path.join(self.dir, f"{key}.json")) as fh:
                out.append(json.load(fh))
        return out
