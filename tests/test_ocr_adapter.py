"""S4 OCR adapter contract (VERDICT r6 next-step #6): the easyocr
import-gated branch, exercised WITHOUT shipping the model.

The container ships no easyocr, so the real recognition half of
``ocr_scanned_pdf`` / ``decode_document`` never runs under pytest — the
lifecycle tests only prove the quarantine path. These tests close that
gap by injecting a fake ``easyocr`` module into ``sys.modules`` that
conforms exactly to the adapter surface the code (and the reference,
manual_purchase_apply_extractor.py:75-181) relies on:

    reader = easyocr.Reader(["ch_sim", "en"], gpu=False)
    lines  = reader.readtext(<ndarray (h,w,3|1) uint8> | <bytes>, detail=0)

so the scan -> embedded-image decode -> OCR -> C3/P12/P13 cascade path
is executable end-to-end. A user installing the real backend gets the
same call shape, asserted here; nothing is skipped in CI."""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from fund_data_etl_pipeline_spark.sources.corpus import (
    decode_document,
    ocr_scanned_pdf,
)
from fund_data_etl_pipeline_spark.testing import fixtures as FX

from test_pdf_images import gradient_rgb, image_obj, scanned_pdf


class _FakeReader:
    """Records the adapter calls; recognition is a supplied script."""

    def __init__(self, module, langs, gpu=None):
        module.init_calls.append({"langs": list(langs), "gpu": gpu})
        self._module = module

    def readtext(self, image, detail=None):
        self._module.read_calls.append({"image": image, "detail": detail})
        return self._module.script(image)


def _install_fake_easyocr(monkeypatch, script):
    """A module whose Reader conforms to the easyocr surface; ``script``
    maps the image argument to the recognized line list."""
    mod = types.ModuleType("easyocr")
    mod.init_calls = []
    mod.read_calls = []
    mod.script = script
    mod.Reader = lambda langs, gpu=None: _FakeReader(mod, langs, gpu=gpu)
    monkeypatch.setitem(sys.modules, "easyocr", mod)
    return mod


def test_scanned_pdf_recognition_half_page_order(monkeypatch):
    """ocr_scanned_pdf with a backend present: one readtext per page, in
    page-tree order, each fed the DECODED pixel ndarray (not bytes), and
    the per-page line lists joined with newlines."""
    px1 = gradient_rgb(16, 9)
    px2 = gradient_rgb(8, 5)
    pdf = scanned_pdf(
        [
            image_obj(px1.tobytes(), 16, 9, compress=True),
            image_obj(px2.tobytes(), 8, 5, compress=True),
        ]
    )
    mod = _install_fake_easyocr(
        monkeypatch, lambda img: [f"w{img.shape[1]}", f"h{img.shape[0]}"]
    )
    text = ocr_scanned_pdf(pdf)
    assert text == "w16\nh9\nw8\nh5"
    assert mod.init_calls == [{"langs": ["ch_sim", "en"], "gpu": False}]
    assert [c["detail"] for c in mod.read_calls] == [0, 0]
    imgs = [c["image"] for c in mod.read_calls]
    assert all(isinstance(i, np.ndarray) and i.dtype == np.uint8 for i in imgs)
    # raw Flate RGB round-trips exactly, so the backend sees the very
    # pixels the in-test writer embedded
    np.testing.assert_array_equal(imgs[0], px1)
    np.testing.assert_array_equal(imgs[1], px2)


def test_image_document_branch_passes_bytes(monkeypatch):
    """decode_document's PNG/JPEG branch hands the RAW bytes to the
    backend (easyocr accepts both) — the reference's image-file path."""
    payload = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    mod = _install_fake_easyocr(monkeypatch, lambda img: ["line1", "line2"])
    assert decode_document(payload) == "line1\nline2"
    assert mod.read_calls[0]["image"] == payload
    assert mod.init_calls == [{"langs": ["ch_sim", "en"], "gpu": False}]


def test_scan_to_cascade_with_ocr_backend(spark, monkeypatch):
    """S4 recognition -> C3/P12/P13 cascade with a backend present: a
    scanned (image-only) 万事如意 apply receipt is OCR'd by the fake
    backend into the MANUAL_DOCS fixture text via the REAL
    ``decode_document`` dispatch (scan detection -> image decode ->
    readtext), then the recognized text drives the manual cascade, which
    repairs the OCR-noisy code (8l2345 -> B12345) and takes the
    candidate-max amount — the exact golden row the
    pre-extracted-text tests assert.

    The decode runs driver-side here because the distributed
    ``extract_text`` stage executes ``decode_document`` on Python
    workers, where a driver sys.modules fake is rightly invisible —
    that stage's distribution is proven on real bytes by
    test_corpus_lifecycle / test_pdf_images; THIS test pins the
    recognition-half contract those can't reach."""
    from test_fund_jobs import expected_set, rows_set

    from fund_data_etl_pipeline_spark import jobs

    _doc_id, filename, rel, fixture_text = FX.MANUAL_DOCS[0]
    assert "申购受理单" in filename
    pdf = scanned_pdf(
        [image_obj(gradient_rgb().tobytes(), 32, 24, compress=True)]
    )
    _install_fake_easyocr(monkeypatch, lambda img: fixture_text.split("\n"))
    text = decode_document(pdf)
    assert text == fixture_text

    ok = spark.createDataFrame(
        [(601, filename, rel, text)],
        "doc_id long, filename string, rel_path string, text string",
    )
    out = jobs.manual_purchase_apply_job(ok, FX.dim_df(spark), FX.RUN_DATE)
    assert rows_set(out) == expected_set([FX.EXPECTED_MANUAL_APPLY[0]])


def test_backend_errors_still_quarantine(monkeypatch):
    """A backend that fails on a page must surface its own error (S7
    names the real cause), not a masked empty string."""
    pdf = scanned_pdf(
        [image_obj(gradient_rgb(4, 3).tobytes(), 4, 3, compress=True)]
    )

    def boom(img):
        raise RuntimeError("model weights missing")

    _install_fake_easyocr(monkeypatch, boom)
    with pytest.raises(RuntimeError, match="model weights missing"):
        ocr_scanned_pdf(pdf)
