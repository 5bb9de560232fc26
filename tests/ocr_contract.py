"""The OCR backend conformance contract (VERDICT r9 stretch #8) — the
fake-module device of test_ocr_adapter.py / test_zz_ocr_e2e.py,
generalized into a documented, reusable contract helper.

THE CONTRACT. ``sources/corpus.ocr_scanned_pdf`` / ``decode_document``
call any installed glyph-recognition backend through exactly this
surface (the same call shape the reference uses,
manual_purchase_apply_extractor.py:75-181):

    import easyocr
    reader = easyocr.Reader(["ch_sim", "en"], gpu=False)   # once
    lines  = reader.readtext(image, detail=0)              # per page

where ``image`` is a decoded ``numpy.ndarray`` (h, w, 3|1) uint8 for
scanned-PDF pages (the engine decodes pixels itself, from-spec) or the
raw ``bytes`` for standalone image documents, and ``lines`` is a list of
recognized text lines. Pages are visited in PAGE-TREE order; per-page
line lists are joined with newlines; backend exceptions must surface
(they become named S7 quarantine reasons, never masked empty text).

Any module satisfying that surface — the real easyocr, or a scripted
stand-in — makes the manual pipelines green end-to-end FROM RAW
SCANNED-PDF BYTES: ``assert_manual_jobs_conformance`` is the executable
statement of that claim, and test_zz_ocr_e2e runs it with a scripted
backend (the container ships no model weights; a user with the real
backend installed runs the same helper unchanged, minus the script).
The recognition step executes on the distributed ``extract_text``
stage's Python workers, so a conforming backend must be
worker-importable; ``write_scripted_backend`` produces one to ship via
``sc.addPyFile`` exactly the way a real dependency would deploy.

This stays in tests/ (not package source) because it builds its staged
corpus with the INDEPENDENT in-test PDF writer (test_pdf_images) — the
same-source round-trip fallacy guard the codec tests rely on.
"""

from __future__ import annotations

import os


def backend_script(docs) -> dict[int, list[str]]:
    """The deterministic width -> recognized-lines script for ``docs``
    (page width 20 + 4*idx encodes the fixture index) — the shared
    convention between stage_scanned_corpus's staged pages and the
    scripted backend's recognition."""
    return {
        20 + 4 * idx: fixture_text.split("\n")
        for idx, (_id, _fn, _rel, fixture_text) in enumerate(docs)
    }


def stage_scanned_corpus(root: str, docs) -> dict[int, list[str]]:
    """Write one SCANNED (image-only) one-page PDF per fixture doc under
    ``root``/<rel_path>/<filename>, the page an in-test gradient image
    whose WIDTH encodes which fixture text a scripted backend should
    recognize (backend_script's convention). Returns that width -> lines
    mapping. The staged bytes exercise the engine's real from-spec
    scan-detect + embedded-image-decode path."""
    from test_pdf_images import gradient_rgb, image_obj, scanned_pdf

    width_to_lines = backend_script(docs)
    for idx, (_id, filename, rel, _fixture_text) in enumerate(docs):
        w, h = 20 + 4 * idx, 12
        d = os.path.join(root, rel)
        os.makedirs(d, exist_ok=True)
        px = gradient_rgb(w, h)
        with open(os.path.join(d, filename), "wb") as fh:
            fh.write(scanned_pdf([image_obj(px.tobytes(), w, h,
                                            compress=True)]))
    return width_to_lines


_SHIPPED: set[int] = set()


def ship_backend_once(spark, tmp_dir: str, script: dict) -> None:
    """addPyFile is session-wide and irreversible, and re-adding a
    same-named module with different contents is an error — ship the
    scripted backend at most once per SparkContext (keyed by context
    identity so a fresh session in the same process re-ships)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    spark.sparkContext.addPyFile(
        write_scripted_backend(os.path.join(tmp_dir, "easyocr.py"), script)
    )
    _SHIPPED.add(key)


def write_scripted_backend(path: str, script: dict[int, list[str]]) -> str:
    """Write a CONFORMING backend module (the contract above) whose
    recognition is the supplied width -> lines script; anything
    unstaged raises an error NAMING easyocr, so quarantine assertions
    elsewhere stay valid in any test order. Ship it to the workers with
    ``spark.sparkContext.addPyFile(path)`` — addPyFile is session-wide
    and irreversible, which is why the suite runs these last
    (test_zz_ocr_e2e's zz device)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(
            "import numpy as _np\n"
            f"_SCRIPT = {script!r}\n"
            "class Reader:\n"
            "    def __init__(self, langs, gpu=None):\n"
            "        assert list(langs) == ['ch_sim', 'en'] and gpu is False\n"
            "    def readtext(self, image, detail=None):\n"
            "        assert detail == 0\n"
            "        if isinstance(image, _np.ndarray)"
            " and image.shape[1] in _SCRIPT:\n"
            "            return _SCRIPT[image.shape[1]]\n"
            "        raise RuntimeError(\n"
            "            'fake easyocr backend: not a staged test image')\n"
        )
    return path


def assert_manual_jobs_conformance(spark, corpus_root: str, out_dir: str,
                                   expected: dict) -> dict:
    """THE conformance statement: with a contract-conforming backend
    importable on the workers, a full ``jobs.run_all`` over raw
    scanned-PDF bytes lands every manual job's golden rows — scan
    detect -> from-spec embedded-image decode -> backend readtext ->
    C3/P12/P13 cascade -> partitioned sink, all distributed. ``expected``
    maps job name -> (target cols, expected row set, as produced by
    test_fund_jobs.expected_set); returns run_all's status dict for
    further assertions."""
    from pyspark.sql import functions as F

    from fund_data_etl_pipeline_spark import jobs
    from fund_data_etl_pipeline_spark.testing import fixtures as FX

    from test_fund_jobs import rows_set

    status = jobs.run_all(
        spark, corpus_root, FX.dim_df(spark), FX.RUN_DATE, out_dir
    )
    for name, (cols, expected_rows) in expected.items():
        assert status[name], f"{name} sink must have rows"
        back = spark.read.parquet(status[name]).select(
            # partition-column type inference reads '20260115' back as a
            # number; normalize to the job's string type for the compare
            *[F.col(c).cast("string") if c == "biz_date" else F.col(c)
              for c in cols]
        )
        assert rows_set(back) == expected_rows, name
    return status
