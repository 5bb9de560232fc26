"""Scanned-PDF OCR front-end (SURVEY §2.1 S4): embedded image XObject
extraction (sources/pdf_text.extract_pdf_images) and pixel
reconstruction (sources/corpus.ocr_scanned_pdf).

The reference OCRs scanned manual-transaction PDFs by rasterizing each
page with PyMuPDF and feeding EasyOCR
(manual_purchase_apply_extractor.py:75-181). The engine's from-spec
equivalent pulls the page's embedded /Subtype /Image XObjects — for a
scanned document those ARE the page pixels — and decodes them with the
builtin codecs, leaving only neural glyph recognition import-gated.
These tests build scanned-style PDFs with an independent in-test writer
and round-trip the pixels; the lifecycle test proves the S1→S4 compose
quarantines with the decoded-image inventory when no OCR backend
exists (this container ships none)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from fund_data_etl_pipeline_spark.sources.corpus import (
    _raw_samples_to_pixels,
    decode_document,
    ocr_scanned_pdf,
)
from fund_data_etl_pipeline_spark.sources.pdf_text import (
    extract_pdf_images,
)

from test_jpeg_codec import encode_jpeg
from test_pdf_text import build_pdf, stream_obj


def image_obj(
    payload: bytes,
    w: int,
    h: int,
    color_space: bytes = b"/DeviceRGB",
    bpc: int = 8,
    filt: bytes = b"",
    compress: bool = False,
) -> bytes:
    extra = (
        b" /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /ColorSpace %s /BitsPerComponent %d" % (w, h, color_space, bpc)
    )
    if filt:
        extra += b" /Filter " + filt
    return stream_obj(payload, extra=extra, compress=compress)


def scanned_pdf(image_objs: list[bytes]) -> bytes:
    """One full-page image XObject per page — the scanned-document
    layout (§8.9.5). Image object numbers start after the page tree."""
    n = len(image_objs)
    first_img = 3 + 2 * n
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n))
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n),
    ]
    for i in range(n):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
            b" /Resources << /XObject << /Im0 %d 0 R >> >>"
            b" /Contents %d 0 R >>" % (first_img + i, 4 + 2 * i)
        )
        objects.append(stream_obj(b"q 612 0 0 792 0 0 cm /Im0 Do Q"))
    objects.extend(image_objs)
    return build_pdf(objects)


def gradient_rgb(w: int = 32, h: int = 24) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 8) % 256, (y * 10) % 256, (x + y) * 5 % 256], axis=-1
    ).astype(np.uint8)


def test_dct_image_extracted_and_decodes():
    from fund_data_etl_pipeline_spark.operators.jpeg_codec import decode_jpeg

    px = gradient_rgb()
    jpeg = encode_jpeg(px)
    pdf = scanned_pdf([image_obj(jpeg, 32, 24, filt=b"/DCTDecode")])
    recs = extract_pdf_images(pdf)
    assert len(recs) == 1
    rec = recs[0]
    assert (rec["page"], rec["format"]) == (0, "jpeg")
    assert (rec["width"], rec["height"]) == (32, 24)
    assert rec["color_space"] == "DeviceRGB"
    assert rec["data"] == jpeg  # DCT payload verbatim, not re-filtered
    w, h, c, out = decode_jpeg(rec["data"])
    assert (w, h, c) == (32, 24, 3)
    err = np.abs(out.astype(float) - px.astype(float))
    assert err.max() <= 12 and err.mean() <= 2.5


def test_flate_raw_rgb_exact_and_pixelizes():
    px = gradient_rgb(16, 9)
    pdf = scanned_pdf([image_obj(px.tobytes(), 16, 9, compress=True)])
    (rec,) = extract_pdf_images(pdf)
    assert rec["format"] == "raw"
    assert rec["data"] == px.tobytes()
    out = _raw_samples_to_pixels(rec)
    assert out.shape == (9, 16, 3)
    assert np.array_equal(out, px)


def test_one_bit_gray_rows_byte_aligned():
    # w=10 forces per-row padding: stride 2 bytes, 6 trailing pad bits
    w, h = 10, 4
    bits = (np.arange(h)[:, None] + np.arange(w)[None, :]) % 2
    packed = np.packbits(bits.astype(np.uint8), axis=1)  # pads rows
    pdf = scanned_pdf(
        [
            image_obj(
                packed.tobytes(), w, h, color_space=b"/DeviceGray",
                bpc=1, compress=True,
            )
        ]
    )
    (rec,) = extract_pdf_images(pdf)
    out = _raw_samples_to_pixels(rec)
    assert out.shape == (h, w, 1)
    assert np.array_equal(out[..., 0], bits * 255)


def test_two_pages_in_order_and_indirect_resources():
    px0, px1 = gradient_rgb(8, 8), gradient_rgb(12, 6)
    img0 = image_obj(px0.tobytes(), 8, 8, compress=True)
    img1 = image_obj(px1.tobytes(), 12, 6, compress=True)
    # page 1's /Resources is an indirect object (common in real writers)
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R"
        b" /Resources << /XObject << /Im0 7 0 R >> >> /Contents 4 0 R >>",
        stream_obj(b"/Im0 Do"),
        b"<< /Type /Page /Parent 2 0 R /Resources 9 0 R"
        b" /Contents 6 0 R >>",
        stream_obj(b"/Im0 Do"),
        img0,
        img1,
        b"<< /XObject << /Im0 8 0 R >> >>",
    ]
    recs = extract_pdf_images(build_pdf(objects))
    assert [(r["page"], r["width"]) for r in recs] == [(0, 8), (1, 12)]


def test_orphan_image_surfaces_with_page_minus_one():
    px = gradient_rgb(4, 4)
    # image object present but referenced by no page's resources
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        stream_obj(b""),
        image_obj(px.tobytes(), 4, 4, compress=True),
    ]
    recs = extract_pdf_images(build_pdf(objects))
    assert [(r["page"], r["obj"]) for r in recs] == [(-1, 5)]


def test_ccitt_names_the_problem():
    pdf = scanned_pdf(
        [image_obj(b"\x00" * 16, 8, 8, filt=b"/CCITTFaxDecode")]
    )
    with pytest.raises(ValueError, match="CCITT"):
        extract_pdf_images(pdf)


def test_unsupported_raw_shape_names_itself():
    (rec,) = extract_pdf_images(
        scanned_pdf(
            [
                image_obj(
                    b"\x00" * 32, 4, 4, color_space=b"/DeviceCMYK",
                    compress=True,
                )
            ]
        )
    )
    with pytest.raises(ValueError, match="DeviceCMYK"):
        _raw_samples_to_pixels(rec)


def test_ocr_scanned_pdf_inventory_in_named_error():
    """No OCR backend in this container: the ImportError must carry the
    decoded page-image inventory, proving the from-spec front half ran."""
    px = gradient_rgb()
    pdf = scanned_pdf([image_obj(encode_jpeg(px), 32, 24, filt=b"/DCTDecode")])
    with pytest.raises(ImportError, match=r"1 page image.*32x24/jpeg.*no OCR"):
        ocr_scanned_pdf(pdf)


def test_decode_document_falls_back_to_ocr_path_for_scanned():
    """A text-free scanned PDF must NOT return silent empty text from
    the S3 extractor — it routes to the OCR front-end and (here)
    quarantines with the named backend-missing error."""
    px = gradient_rgb(16, 9)
    pdf = scanned_pdf([image_obj(px.tobytes(), 16, 9, compress=True)])
    with pytest.raises(ImportError, match="no OCR backend"):
        decode_document(pdf)


def test_lifecycle_scanned_pdf_quarantines_with_inventory(spark, tmp_path):
    """S1 scan → S3/S4 dispatch → S7 quarantine on real scanned bytes:
    the row lands in the side-channel with the decoded-image proof."""
    from fund_data_etl_pipeline_spark.sources.corpus import (
        extract_text,
        parse_path_metadata,
        scan_binary_corpus,
    )

    root = tmp_path / "2024" / "20240105" / "1场外开基" / "scans"
    root.mkdir(parents=True)
    jpeg = encode_jpeg(gradient_rgb())
    (root / "scan_001.pdf").write_bytes(
        scanned_pdf([image_obj(jpeg, 32, 24, filt=b"/DCTDecode")])
    )
    rows = extract_text(
        parse_path_metadata(scan_binary_corpus(spark, str(tmp_path)))
    ).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.status == "error"
    assert "1 page image" in row.error and "no OCR backend" in row.error


def test_roundtrip_property_random_raw_images():
    """Any size/content raw RGB or gray image embeds and extracts
    byte-exact through the Flate path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        gray=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def prop(w, h, gray, seed):
        ch = 1 if gray else 3
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, ch)
        ).astype(np.uint8)
        cs = b"/DeviceGray" if gray else b"/DeviceRGB"
        pdf = scanned_pdf(
            [image_obj(px.tobytes(), w, h, color_space=cs, compress=True)]
        )
        (rec,) = extract_pdf_images(pdf)
        assert rec["data"] == px.tobytes()
        assert np.array_equal(_raw_samples_to_pixels(rec), px)

    prop()


def test_page_tree_order_beats_object_number_order():
    """§7.7.3: the page SEQUENCE is the /Kids order, not object-number
    order — both the text extractor and the image walk must honor it."""
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    pg = gradient_rgb(6, 4)
    # Kids lists page object 5 FIRST, then 3 — reversed numeric order
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /XObject << /Im0 8 0 R >>"
        b" /Font << /F1 7 0 R >> >> >>",
        stream_obj(b"BT /F1 10 Tf (second) Tj ET /Im0 Do"),
        b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R"
        b" /Resources << /XObject << /Im0 9 0 R >>"
        b" /Font << /F1 7 0 R >> >> >>",
        stream_obj(b"BT /F1 10 Tf (first) Tj ET /Im0 Do"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        image_obj(pg.tobytes(), 6, 4, compress=True),  # on page obj 3
        image_obj(pg.tobytes(), 6, 4, compress=True),  # on page obj 5
    ]
    pdf = build_pdf(objects)
    assert extract_pdf_text(pdf).splitlines() == ["first", "second"]
    recs = extract_pdf_images(pdf)
    # page 0 must carry object 9's image (the Kids-first page, obj 5)
    assert [(r["page"], r["obj"]) for r in recs] == [(0, 9), (1, 8)]


# --- inline images (BI…ID…EI, §8.9.7) --------------------------------


def _inline_pdf(content: bytes) -> bytes:
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        stream_obj(content),
    ]
    return build_pdf(objects)


def test_inline_image_raw_exact_length():
    px = gradient_rgb(5, 3)
    content = (
        b"q BI /W 5 /H 3 /BPC 8 /CS /RGB ID " + px.tobytes() + b" EI Q"
    )
    (rec,) = extract_pdf_images(_inline_pdf(content))
    assert (rec["obj"], rec["page"]) == (-1, 0)
    assert rec["color_space"] == "DeviceRGB" and rec["format"] == "raw"
    assert rec["data"] == px.tobytes()
    assert np.array_equal(_raw_samples_to_pixels(rec), px)


def test_inline_image_flate_with_embedded_EI_bytes():
    # payload engineered to CONTAIN the bytes " EI " mid-stream: the
    # extractor must skip the false terminator and keep decoding
    px = gradient_rgb(8, 8)
    payload = zlib.compress(px.tobytes())
    poisoned = b"q BI /W 8 /H 8 /BPC 8 /CS /RGB /F /Fl ID "
    # if the compressed payload doesn't already contain " EI ", splice a
    # RAW inline image whose pixel data does, exercising the same path
    if b" EI " not in payload:
        raw = bytearray(px.tobytes())
        raw[30:34] = b" EI "
        px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(8, 8, 3)
        payload = zlib.compress(bytes(raw))
    content = poisoned + payload + b" EI Q"
    (rec,) = extract_pdf_images(_inline_pdf(content))
    assert rec["format"] == "raw" and rec["data"] == px.tobytes()


def test_inline_image_ascii_hex_and_dct():
    gray = (np.arange(12, dtype=np.uint8) * 20).reshape(4, 3)
    hexs = gray.tobytes().hex().encode()
    content = b"BI /W 3 /H 4 /BPC 8 /CS /G /F /AHx ID " + hexs + b"> EI"
    (rec,) = extract_pdf_images(_inline_pdf(content))
    assert rec["color_space"] == "DeviceGray"
    assert rec["data"] == gray.tobytes()
    jpg = encode_jpeg(gradient_rgb(8, 8))
    content2 = b"BI /W 8 /H 8 /BPC 8 /CS /RGB /F /DCT ID " + jpg + b" EI"
    (rec2,) = extract_pdf_images(_inline_pdf(content2))
    assert rec2["format"] == "jpeg" and rec2["data"] == jpg


def test_inline_ccitt_shares_the_fax_path():
    from test_ccitt_codec import _text_like, encode_g4

    img = _text_like(rows=6, cols=24, seed=41)
    content = (
        b"BI /W 24 /H 6 /BPC 1 /CS /G /F /CCF"
        b" /DP << /K -1 /Columns 24 /Rows 6 >> ID "
        + encode_g4(img) + b" EI"
    )
    (rec,) = extract_pdf_images(_inline_pdf(content))
    assert rec["bits_per_component"] == 1
    assert np.array_equal(_raw_samples_to_pixels(rec)[..., 0], img)


def test_text_BI_letters_are_not_an_image():
    # 'BI' inside a shown string and no inline image: nothing extracted
    content = b"BT (ABIDE BI ID EI) Tj ET"
    assert extract_pdf_images(_inline_pdf(content)) == []
