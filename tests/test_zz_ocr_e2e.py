"""The run_all OCR e2e (VERDICT r7 #6), in a LAST-sorting file on
purpose: the recognition step runs on the distributed extract_text
stage's Python workers, where a driver sys.modules fake is invisible,
so the conforming fake backend ships worker-side via
``sc.addPyFile('easyocr.py')``. addPyFile is session-wide and
irreversible, which would flip test_pdf_images' no-backend quarantine
assertions if this ran before them — the zz prefix keeps this the last
OCR-touching test in the default collection order (and the fake raises
an error NAMING easyocr for any unstaged image, so even out-of-order
runs quarantine with an explicable message)."""

from __future__ import annotations

from fund_data_etl_pipeline_spark.testing import fixtures as FX

from test_pdf_images import gradient_rgb, image_obj, scanned_pdf


def test_run_all_e2e_through_ocr_backend(spark, tmp_path):
    """VERDICT r7 #6: a full ``jobs.run_all`` pass over a corpus of
    SCANNED (image-only) 万事如意 PDFs, driving scan-detect → embedded
    image decode → OCR → manual cascade → partitioned sink end-to-end,
    with the recognition step running on the DISTRIBUTED extract_text
    stage's Python workers. A driver sys.modules fake is invisible
    there, so the conforming fake backend is shipped to the workers the
    way a real dependency would be: as an ``easyocr.py`` module via
    ``sc.addPyFile``. The fake recognizes ONLY this test's staged pages
    (keyed by the decoded pixel width) and raises an error naming
    easyocr for anything else, so the corpus-lifecycle quarantine
    assertions stay valid in any test order. All four manual-job sinks
    must land their golden rows."""
    from pyspark.sql import functions as F

    from test_fund_jobs import expected_set, rows_set

    from fund_data_etl_pipeline_spark import jobs
    from fund_data_etl_pipeline_spark.schemas import (
        MANUAL_APPLY_COLS,
        MANUAL_CONFIRM_COLS,
        MANUAL_DIVIDEND_COLS,
        MANUAL_REDEMPTION_COLS,
    )

    # one scanned one-page PDF per manual fixture; page width encodes
    # which fixture text the fake backend should "recognize"
    root = tmp_path / "corpus"
    width_to_lines = {}
    for idx, (_id, filename, rel, fixture_text) in enumerate(FX.MANUAL_DOCS):
        w, h = 20 + 4 * idx, 12
        width_to_lines[w] = fixture_text.split("\n")
        d = root / rel
        d.mkdir(parents=True, exist_ok=True)
        px = gradient_rgb(w, h)
        (d / filename).write_bytes(
            scanned_pdf([image_obj(px.tobytes(), w, h, compress=True)])
        )

    # worker-importable fake backend with the recognition script baked in
    mod_path = tmp_path / "easyocr.py"
    mod_path.write_text(
        "import numpy as _np\n"
        f"_SCRIPT = {width_to_lines!r}\n"
        "class Reader:\n"
        "    def __init__(self, langs, gpu=None):\n"
        "        assert list(langs) == ['ch_sim', 'en'] and gpu is False\n"
        "    def readtext(self, image, detail=None):\n"
        "        assert detail == 0\n"
        "        if isinstance(image, _np.ndarray) and image.shape[1] in _SCRIPT:\n"
        "            return _SCRIPT[image.shape[1]]\n"
        "        raise RuntimeError(\n"
        "            'fake easyocr backend: not a staged test image')\n",
        encoding="utf-8",
    )
    spark.sparkContext.addPyFile(str(mod_path))

    out = tmp_path / "out"
    status = jobs.run_all(
        spark, str(root), FX.dim_df(spark), FX.RUN_DATE, str(out)
    )
    golden = {
        "manual_apply": (MANUAL_APPLY_COLS, FX.EXPECTED_MANUAL_APPLY),
        "manual_confirm": (MANUAL_CONFIRM_COLS, FX.EXPECTED_MANUAL_CONFIRM),
        "manual_redemption": (
            MANUAL_REDEMPTION_COLS, FX.EXPECTED_MANUAL_REDEMPTION,
        ),
        "manual_dividend": (
            MANUAL_DIVIDEND_COLS, FX.EXPECTED_MANUAL_DIVIDEND,
        ),
    }
    for name, (cols, expected) in golden.items():
        assert status[name], f"{name} sink must have rows"
        back = spark.read.parquet(status[name]).select(
            # partition-column type inference reads '20260115' back as a
            # number; normalize to the job's string type for the compare
            *[F.col(c).cast("string") if c == "biz_date" else F.col(c)
              for c in cols]
        )
        assert rows_set(back) == expected_set(expected), name
    # the non-manual pipelines see only 万事如意 scans, which their
    # classifiers rightly do not match -> empty-result guard (Q2)
    assert status["dividend"] is False
    assert status["purchase_apply"] is False

