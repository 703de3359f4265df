"""Driver-side file sniffers (reference SURVEY.md §2.1 S5-S7).

These inspect file *heads* on the driver — they never read data
through Spark — then parameterize the executor-parallel readers.
Parity:
- :func:`detect_delimiter` ↔ `detect_delimiter`
  (src/utils/dataset_profiling.py:85-99): count candidates in the
  first 64 KiB.
- :func:`infer_format` ↔ `infer_format` (dataset_profiling.py:78-83).
- :func:`fast_line_count` ↔ `fast_line_count`
  (dataset_profiling.py:102-120): buffered newline count. For data
  already in Spark, `df.count()` (parquet: footer metadata) replaces
  this entirely.
"""

from __future__ import annotations

import os

DEFAULT_DELIMS = ("|", ",", ";", "\t")


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("csv", "txt", "tsv"):
        return "csv"
    if ext in ("parquet", "pq"):
        return "parquet"
    if ext in ("xlsx", "xls"):
        return "excel"
    if ext == "json":
        return "json"
    raise ValueError(f"cannot infer format for {path!r}")


def detect_delimiter(path: str, candidates: tuple[str, ...] = DEFAULT_DELIMS) -> str:
    """Most frequent candidate delimiter in the first 64 KiB."""
    with open(path, "rb") as fh:
        head = fh.read(64 * 1024).decode("utf-8", errors="replace")
    counts = {d: head.count(d) for d in candidates}
    best = max(counts, key=counts.get)  # type: ignore[arg-type]
    if counts[best] == 0:
        raise ValueError(f"no candidate delimiter found in {path!r}")
    return best


def fast_line_count(path: str, buf_size: int = 1 << 20) -> int:
    """Buffered newline count (no parsing). Driver-side only — for
    distributed counting use spark.read.text(path).count()."""
    n = 0
    with open(path, "rb") as fh:
        while chunk := fh.read(buf_size):
            n += chunk.count(b"\n")
    return n
