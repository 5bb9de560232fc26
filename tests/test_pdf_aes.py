"""AES decryption tests (sources/aes.py + the pdf_text AESV2 path).

Correctness is pinned two independent ways:
1. FIPS-197 Appendix C known-answer vectors — published ciphertexts
   must decrypt to published plaintexts for all three key sizes;
2. round-trips against an in-test FORWARD cipher implemented here from
   the spec's encryption direction (§5.1), plus a full AESV2-encrypted
   PDF built by an in-test writer and read back by the extractor.
"""

from __future__ import annotations

import hashlib
import struct

import pytest

from fund_data_etl_pipeline_spark.sources.aes import (
    _SBOX,
    aes_cbc_decrypt,
    decrypt_block,
)
from fund_data_etl_pipeline_spark.sources.pdf_text import _PW_PAD


# --- in-test FORWARD cipher (FIPS-197 §5.1 encryption direction) ----------

def _xtime(a):
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _expand_key_fwd(key: bytes):
    rcon = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)
    nk = len(key) // 4
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in (t[1], t[2], t[3], t[0]))
            t = bytes((t[0] ^ rcon[i // nk - 1], t[1], t[2], t[3]))
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key_fwd(key)
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, nr + 1):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        for r in range(1, 4):  # ShiftRows: row r rotates LEFT by r
            row = [s[r + 4 * c] for c in range(4)]
            for c in range(4):
                s[r + 4 * c] = row[(c + r) % 4]
        if rnd < nr:  # MixColumns
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                s[4 * c + 0] = _xtime(a[0]) ^ _xtime(a[1]) ^ a[1] ^ a[2] ^ a[3]
                s[4 * c + 1] = a[0] ^ _xtime(a[1]) ^ _xtime(a[2]) ^ a[2] ^ a[3]
                s[4 * c + 2] = a[0] ^ a[1] ^ _xtime(a[2]) ^ _xtime(a[3]) ^ a[3]
                s[4 * c + 3] = _xtime(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xtime(a[3])
        for i in range(16):
            s[i] ^= rk[rnd][i]
    return bytes(s)


def aes_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    pad = 16 - (len(plain) % 16)
    plain = plain + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for off in range(0, len(plain), 16):
        block = bytes(
            a ^ b for a, b in zip(plain[off : off + 16], prev)
        )
        prev = encrypt_block(key, block)
        out += prev
    return bytes(out)


def test_fips197_known_answers():
    vectors = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for khex, chex in vectors:
        key, ct = bytes.fromhex(khex), bytes.fromhex(chex)
        assert decrypt_block(key, ct) == pt
        assert encrypt_block(key, pt) == ct  # forward twin agrees too


def test_cbc_roundtrip_and_padding():
    key = bytes(range(16))
    iv = bytes(range(100, 116))
    for n in (1, 15, 16, 17, 100):
        plain = bytes((i * 7) & 0xFF for i in range(n))
        ct = aes_cbc_encrypt(key, iv, plain)
        assert aes_cbc_decrypt(key, ct) == plain
    with pytest.raises(ValueError, match="padding|multiple"):
        aes_cbc_decrypt(key, b"\x00" * 31)
    with pytest.raises(ValueError, match="padding"):
        aes_cbc_decrypt(bytes(16), aes_cbc_encrypt(key, iv, b"x" * 20))


def build_aes_pdf(content: bytes) -> bytes:
    """In-test AESV2 (/V 4 /R 4) writer with an empty user password."""
    n = 16
    o = bytes(range(200, 232))
    p = -3904
    id0 = bytes.fromhex("ffeeddccbbaa99887766554433221100")
    h = hashlib.md5(_PW_PAD + o + struct.pack("<i", p) + id0).digest()
    for _ in range(50):
        h = hashlib.md5(h[:n]).digest()
    key = h[:n]

    def _rc4(k, data):
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + k[i % len(k)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        out = bytearray()
        i = j = 0
        for c in data:
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out.append(c ^ s[(s[i] + s[j]) & 0xFF])
        return bytes(out)

    u = hashlib.md5(_PW_PAD + id0).digest()
    u = _rc4(key, u)
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16

    k4 = hashlib.md5(
        key + (4).to_bytes(3, "little") + (0).to_bytes(2, "little")
        + b"sAlT"
    ).digest()[:16]
    iv = bytes(range(50, 66))
    payload = aes_cbc_encrypt(k4, iv, content)
    enc_dict = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d "
        b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <%s> /U <%s> >>"
        % (p, o.hex().encode(), u.hex().encode())
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(payload) + payload
        + b"\nendstream",
        enc_dict,
    ]
    out = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    for i, body in enumerate(objects, start=1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += (
        b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R "
        b"/ID [<%s> <%s>] >>\n%%%%EOF\n"
        % (id0.hex().encode(), id0.hex().encode())
    )
    return bytes(out)


def test_aesv2_pdf_decrypts():
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    content = b"BT /F1 12 Tf (aes decrypted: 123,456.78) Tj ET"
    assert extract_pdf_text(build_aes_pdf(content)) == (
        "aes decrypted: 123,456.78"
    )


def test_aesv2_pdf_with_plaintext_xref_stream_decrypts():
    # Regression (ADVICE r6): ISO 32000 §7.5.8.2 exempts cross-reference
    # streams from encryption. Real AESV2/AESV3 files (PDF 1.6+) nearly
    # always carry one; decrypting its plaintext payload raises an AES
    # length/padding ValueError and quarantined a supported file.
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    content = b"BT /F1 12 Tf (xref exempt ok) Tj ET"
    blob = build_aes_pdf(content)
    # 13-byte payload: not a multiple of the AES block, so any attempt
    # to decrypt it would raise before the fix's skip.
    xref_payload = b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d"
    xref_obj = (
        b"6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Length %d >>\n"
        b"stream\n" % len(xref_payload)
        + xref_payload
        + b"\nendstream\nendobj\n"
    )
    head, trailer = blob.rsplit(b"trailer\n", 1)
    assert extract_pdf_text(head + xref_obj + b"trailer\n" + trailer) == (
        "xref exempt ok"
    )


def test_crypt_identity_stream_left_plaintext():
    # §7.4.10: a /Crypt filter naming /Identity marks that stream's
    # payload as not encrypted even inside an encrypted file.
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (identity ok) Tj ET")
    meta_payload = b"<x:xmpmeta/>"  # 12 bytes, not an AES block multiple
    meta_obj = (
        b"7 0 obj\n<< /Type /Metadata /Filter /Crypt "
        b"/DecodeParms << /Name /Identity >> /Length %d >>\n"
        b"stream\n" % len(meta_payload)
        + meta_payload
        + b"\nendstream\nendobj\n"
    )
    head, trailer = blob.rsplit(b"trailer\n", 1)
    assert extract_pdf_text(head + meta_obj + b"trailer\n" + trailer) == (
        "identity ok"
    )


def test_crypt_default_identity_with_legacy_name_key():
    # Regression (ADVICE r7): the /Crypt-Identity exemption must read
    # /Name inside the /DecodeParms subdict only. A legacy ``/Name /Im1``
    # key in the stream dict itself (older image XObjects) previously
    # defeated the default-Identity detection, so this plaintext
    # metadata stream got AES-decrypted (12 bytes — not a block
    # multiple) and the whole file quarantined.
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (legacy name ok) Tj ET")
    meta_payload = b"<x:xmpmeta/>"
    meta_obj = (
        b"7 0 obj\n<< /Type /Metadata /Name /Im1 /Filter /Crypt "
        b"/Length %d >>\n"
        b"stream\n" % len(meta_payload)
        + meta_payload
        + b"\nendstream\nendobj\n"
    )
    head, trailer = blob.rsplit(b"trailer\n", 1)
    assert extract_pdf_text(head + meta_obj + b"trailer\n" + trailer) == (
        "legacy name ok"
    )


def test_named_crypt_filter_not_exempted_by_identity_h():
    # Regression (ADVICE r7): an ``/Identity-H`` substring elsewhere in
    # the header (a CID font encoding name) must not exempt a stream
    # whose /Crypt DecodeParms names a REAL crypt filter — that stream
    # is ciphertext and skipping decryption yields garbage.
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (named crypt decrypted) Tj ET")
    assert b"4 0 obj\n<< /Length" in blob
    blob = blob.replace(
        b"4 0 obj\n<< /Length",
        b"4 0 obj\n<< /Filter /Crypt "
        b"/DecodeParms << /Name /StdCF >> "
        b"/Encoding /Identity-H /Length",
    )
    assert extract_pdf_text(blob) == "named crypt decrypted"


def test_crypt_unresolvable_indirect_decodeparms_decrypts():
    # Regression (ADVICE r8): a /Crypt filter whose /DecodeParms is an
    # indirect reference to an object MISSING from the file must not
    # default to Identity — that would skip decryption on a genuinely
    # encrypted stream and emit ciphertext as text. The conservative
    # reading is "a real crypt filter": decrypt. Object 99 does not
    # exist in the build_aes_pdf fixture.
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (unresolvable parms decrypted) Tj ET")
    assert b"4 0 obj\n<< /Length" in blob
    blob = blob.replace(
        b"4 0 obj\n<< /Length",
        b"4 0 obj\n<< /Filter /Crypt /DecodeParms 99 0 R /Length",
    )
    assert extract_pdf_text(blob) == "unresolvable parms decrypted"


def test_crypt_filter_chain_decodeparms_array_position():
    # The /DecodeParms lookup must follow the /Crypt POSITION in a
    # filter-chain array: [/FlateDecode /Crypt] with parms
    # [null << /Name /Identity >>] is plaintext-deflate.
    import zlib

    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (array parms ok) Tj ET")
    meta_payload = zlib.compress(b"<x:xmpmeta/>")
    meta_obj = (
        b"7 0 obj\n<< /Type /Metadata "
        b"/Filter [/FlateDecode /Crypt] "
        b"/DecodeParms [null << /Name /Identity >>] /Length %d >>\n"
        b"stream\n" % len(meta_payload)
        + meta_payload
        + b"\nendstream\nendobj\n"
    )
    head, trailer = blob.rsplit(b"trailer\n", 1)
    assert extract_pdf_text(head + meta_obj + b"trailer\n" + trailer) == (
        "array parms ok"
    )


def test_aes256_r5_draft_quarantines():
    # the withdrawn /R 5 draft revision stays unsupported
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = build_aes_pdf(b"BT (x) Tj ET").replace(
        b"/V 4 /R 4", b"/V 5 /R 5"
    ).replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(ValueError, match="unsupported security handler"):
        extract_pdf_text(blob)


# --- AES-256 /V 5 /R 6 (AESV3) --------------------------------------------

def _hash_2b_test(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Independent transcription of the R6 hardened hash using the
    in-test forward cipher."""

    def cbc_raw(key, iv, plain):
        out = bytearray()
        prev = iv
        for off in range(0, len(plain), 16):
            block = bytes(
                a ^ b for a, b in zip(plain[off : off + 16], prev)
            )
            prev = encrypt_block(key, block)
            out += prev
        return bytes(out)

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\xff"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = cbc_raw(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
    return k[:32]


def test_hash_2b_agrees_with_source():
    from fund_data_etl_pipeline_spark.sources.pdf_text import _hash_2b

    for pw, salt in ((b"", b"12345678"), (b"secret", b"\x00" * 8)):
        assert _hash_2b(pw, salt) == _hash_2b_test(pw, salt)


def build_aes256_pdf(content: bytes) -> bytes:
    file_key = bytes((i * 37 + 11) & 0xFF for i in range(32))
    vs = b"valsalt!"
    ks = b"keysalt!"
    u = _hash_2b_test(b"", vs) + vs + ks
    ikey = _hash_2b_test(b"", ks)
    # wrap the file key: AES-256-CBC encrypt with zero IV, no padding
    prev = b"\x00" * 16
    ue = b""
    for off in range(0, 32, 16):
        block = bytes(
            a ^ b for a, b in zip(file_key[off : off + 16], prev)
        )
        prev = encrypt_block(ikey, block)
        ue += prev
    iv = bytes(range(16))
    payload = aes_cbc_encrypt(file_key, iv, content)
    enc_dict = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -4 "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <%s> /OE <%s> /U <%s> /UE <%s> /Perms <%s> >>"
        % (
            (b"\x00" * 48).hex().encode(),
            (b"\x00" * 32).hex().encode(),
            u.hex().encode(),
            ue.hex().encode(),
            (b"\x00" * 16).hex().encode(),
        )
    )
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n" % len(payload) + payload
        + b"\nendstream",
        enc_dict,
    ]
    out = bytearray(b"%PDF-2.0\n%\xe2\xe3\xcf\xd3\n")
    for i, body in enumerate(objects, start=1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF\n"
    return bytes(out)


def test_aesv3_r6_pdf_decrypts():
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    content = b"BT /F1 12 Tf (aes256 opened: 999.99) Tj ET"
    assert extract_pdf_text(build_aes256_pdf(content)) == (
        "aes256 opened: 999.99"
    )


def test_aesv3_real_password_quarantines():
    from fund_data_etl_pipeline_spark.sources.pdf_text import (
        extract_pdf_text,
    )

    blob = bytearray(build_aes256_pdf(b"BT (x) Tj ET"))
    i = blob.index(b"/U <") + 4
    blob[i:i + 2] = b"00" if blob[i:i + 2] != b"00" else b"ff"
    with pytest.raises(ValueError, match="password-protected"):
        extract_pdf_text(bytes(blob))
