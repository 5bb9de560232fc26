"""Document corpus source (SURVEY.md §2.1 S1-S4).

The reference walks a dated folder tree (`<root>/<year>/<YYYYMMDD>/1场外开基/
<subdir>/<file>.pdf`, dividend_extractor.py:1265,1278-1284) and parses each
PDF with pdfplumber. The engine's scan is declarative:

- ``spark.read.format("binaryFile")`` with ``recursiveFileLookup`` +
  ``pathGlobFilter`` — the listing prunes non-PDFs before any read;
- path-segment metadata (year / date / category) extracted from the
  ``path`` column — filters on them prune FILES, not rows, because they're
  evaluated on file metadata before content is touched;
- filename predicates (S2) applied before the parse stage, which matters
  because Catalyst will not reorder filters around a Python stage;
- the PDF text extraction (S3) is an Arrow-batched ``mapInPandas`` stage
  with per-file try/except feeding the failure side-channel (S7) — a bad
  file becomes a quarantine row, never a job crash
  (dividend_extractor.py:1425-1438).

The pdfplumber/EasyOCR codecs are unavailable in this container, so the
extractor STUB decodes UTF-8 bytes (tests write plain-text ``.pdf``
fixtures) and raises inside the try/except for undecodable content —
the plumbing, schema, and failure semantics are the real ones.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "doc_id long, filename string, rel_path string, year string, "
    "date_partition string, category string, text string, status string, "
    "error string"
)


def scan_binary_corpus(
    spark: SparkSession,
    root: str,
    path_keyword: str | None = None,
    glob: str = "*.pdf",
) -> DataFrame:
    """S1 — recursive binary-file scan with path-predicate pruning."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(root)
    )
    if path_keyword:
        # match the DIRECTORY part only (`"分红" in root`, not the file
        # name — dividend_extractor.py:1279-1281)
        dirname = F.regexp_replace(F.col("path"), "/[^/]*$", "")
        df = df.filter(dirname.contains(path_keyword))
    return df


def parse_path_metadata(df: DataFrame) -> DataFrame:
    """Path segments -> partition-style metadata columns
    (`<year>/<YYYYMMDD>/.../<category>/<file>`)."""
    return (
        df.withColumn("filename", F.element_at(F.split("path", "/"), -1))
        .withColumn("year", F.regexp_extract("path", r"/(\d{4})/\d{8}/", 1))
        .withColumn("date_partition", F.regexp_extract("path", r"/(\d{8})/", 1))
        .withColumn(
            "category", F.element_at(F.split("path", "/"), -2)
        )
    )


def filter_filenames(
    df: DataFrame, excludes: tuple[str, ...] = (), includes: tuple[str, ...] = ()
) -> DataFrame:
    """S2 — cheap filename predicates BEFORE the expensive parse stage."""
    for sub in excludes:
        df = df.filter(~F.col("filename").contains(sub))
    for sub in includes:
        df = df.filter(F.col("filename").contains(sub))
    return df


def extract_text(df: DataFrame) -> DataFrame:
    """S3 + S7 — per-file text extraction with the failure side-channel.

    Stub codec: UTF-8 decode (real deployment swaps in pdfplumber/OCR
    inside the same try/except). Output schema is PARSED_SCHEMA; rows with
    status='error' carry the exception text and NULL text.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                path = r["path"]
                rel = "/".join(path.split("/")[-4:-1]) + "/"
                doc_id = int.from_bytes(
                    hashlib.md5(path.encode()).digest()[:7], "big"
                )
                base = {
                    "doc_id": doc_id,
                    "filename": r["filename"],
                    "rel_path": rel,
                    "year": r["year"],
                    "date_partition": r["date_partition"],
                    "category": r["category"],
                }
                try:
                    content = bytes(r["content"])
                    text = content.decode("utf-8")  # stubbed codec
                    rows.append({**base, "text": text, "status": "ok", "error": None})
                except Exception as ex:  # noqa: BLE001 — S7: never crash the job
                    rows.append(
                        {**base, "text": None, "status": "error", "error": str(ex)[:200]}
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=PARSED_SCHEMA)


def load_corpus(
    spark: SparkSession,
    root: str,
    path_keyword: str | None = None,
    filename_excludes: tuple[str, ...] = (),
    filename_includes: tuple[str, ...] = (),
) -> DataFrame:
    """S1+S2+S3+S7 composed: scan -> prune -> parse. Returns PARSED_SCHEMA
    rows; callers split on ``status`` (ok -> pipeline, error -> quarantine
    sink)."""
    scanned = scan_binary_corpus(spark, root, path_keyword)
    with_meta = parse_path_metadata(scanned)
    pruned = filter_filenames(with_meta, filename_excludes, filename_includes)
    return extract_text(pruned.select(
        "path", "content", "filename", "year", "date_partition", "category"
    ))
