"""The run_all OCR e2e (VERDICT r7 #6) + the backend conformance
contract (VERDICT r9 stretch #8), in a LAST-sorting file on purpose:
the recognition step runs on the distributed extract_text stage's
Python workers, where a driver sys.modules fake is invisible, so the
conforming fake backend ships worker-side via
``sc.addPyFile('easyocr.py')``. addPyFile is session-wide and
irreversible, which would flip test_pdf_images' no-backend quarantine
assertions if this ran before them — the zz prefix keeps this the last
OCR-touching test in the default collection order (and the fake raises
an error NAMING easyocr for any unstaged image, so even out-of-order
runs quarantine with an explicable message).

The staging/backend/assertion machinery lives in tests/ocr_contract.py,
whose module docstring IS the documented backend contract: any module
with the easyocr ``Reader(...).readtext(ndarray, detail=0)`` surface
makes the manual pipelines green end-to-end from raw scanned-PDF bytes.
"""

from __future__ import annotations

from fund_data_etl_pipeline_spark.testing import fixtures as FX

from ocr_contract import (
    assert_manual_jobs_conformance,
    backend_script,
    ship_backend_once,
    stage_scanned_corpus,
)


def test_run_all_e2e_through_ocr_backend(spark, tmp_path):
    """VERDICT r7 #6, restated through the r10 contract helper: a full
    ``jobs.run_all`` pass over a corpus of SCANNED (image-only)
    万事如意 PDFs, driving scan-detect → embedded image decode → OCR →
    manual cascade → partitioned sink end-to-end, with the recognition
    step running on the DISTRIBUTED extract_text stage's Python
    workers via a contract-conforming scripted backend shipped with
    ``sc.addPyFile``. All four manual-job sinks must land their golden
    rows — the executable form of the conformance claim: ANY backend
    satisfying ocr_contract's documented surface makes these jobs green
    from raw bytes, the scripted one differing from the real easyocr
    only in what its recognition returns."""
    from test_fund_jobs import expected_set

    from fund_data_etl_pipeline_spark.schemas import (
        MANUAL_APPLY_COLS,
        MANUAL_CONFIRM_COLS,
        MANUAL_DIVIDEND_COLS,
        MANUAL_REDEMPTION_COLS,
    )

    root = tmp_path / "corpus"
    width_to_lines = stage_scanned_corpus(str(root), FX.MANUAL_DOCS)
    ship_backend_once(spark, str(tmp_path), width_to_lines)

    status = assert_manual_jobs_conformance(
        spark,
        str(root),
        str(tmp_path / "out"),
        {
            "manual_apply": (
                MANUAL_APPLY_COLS, expected_set(FX.EXPECTED_MANUAL_APPLY),
            ),
            "manual_confirm": (
                MANUAL_CONFIRM_COLS, expected_set(FX.EXPECTED_MANUAL_CONFIRM),
            ),
            "manual_redemption": (
                MANUAL_REDEMPTION_COLS,
                expected_set(FX.EXPECTED_MANUAL_REDEMPTION),
            ),
            "manual_dividend": (
                MANUAL_DIVIDEND_COLS,
                expected_set(FX.EXPECTED_MANUAL_DIVIDEND),
            ),
        },
    )
    # the non-manual pipelines see only 万事如意 scans, which their
    # classifiers rightly do not match -> empty-result guard (Q2)
    assert status["dividend"] is False
    assert status["purchase_apply"] is False


def test_backend_contract_subset_apply_only(spark, tmp_path):
    """The single-job form of the conformance contract (VERDICT r9
    stretch #8 'fund_manual_apply end-to-end green from raw scanned-PDF
    bytes'): stage ONLY the apply receipt, reuse the session-wide
    backend the previous test shipped (or ship it if this runs alone),
    and assert the one golden row — the minimal statement a user swaps
    their real backend into."""
    from test_fund_jobs import expected_set

    from fund_data_etl_pipeline_spark.schemas import MANUAL_APPLY_COLS

    root = tmp_path / "corpus"
    stage_scanned_corpus(str(root), FX.MANUAL_DOCS[:1])
    # ship the FULL fixture script: the backend may already be aboard
    # from the previous test (session-wide), and the full script's
    # width-20 entry recognizes this test's single staged page
    ship_backend_once(spark, str(tmp_path), backend_script(FX.MANUAL_DOCS))
    assert_manual_jobs_conformance(
        spark,
        str(root),
        str(tmp_path / "out"),
        {
            "manual_apply": (
                MANUAL_APPLY_COLS,
                expected_set(FX.EXPECTED_MANUAL_APPLY[:1]),
            ),
        },
    )
