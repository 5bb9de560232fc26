"""AES decryption from FIPS-197 (the PDF AESV2/AESV3 filter's cipher).

Pure-Python inverse cipher — key expansion (§5.2), InvSubBytes /
InvShiftRows / InvMixColumns / AddRoundKey (§5.3) — plus CBC chaining
and the PKCS#5 padding removal PDF's AES filters use (ISO 32000
§7.6.2: the first 16 payload bytes are the IV). 128/192/256-bit keys
(Nk 4/6/8, Nr 10/12/14).

Correctness is pinned two ways in tests/test_pdf_aes.py: the FIPS-197
Appendix C known-answer vectors (decrypting the published ciphertexts
must yield the published plaintexts — independent of any code here),
and round-trips against an in-test FORWARD cipher implemented from the
spec's encryption direction.

Performance note: this decrypts kilobyte-scale PDF content streams at
the codec boundary (Arrow-batched, per blob); it is not a bulk cipher
and does not pretend to be.
"""

from __future__ import annotations

# FIPS-197 §5.1.1 S-box (forward, needed for key expansion) and its
# inverse (§5.3.2)
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes.fromhex(
    "52096ad53036a538bf40a39e81f3d7fb7ce339829b2fff87348e4344c4dee9cb"
    "547b9432a6c2233dee4c950b42fac34e082ea16628d924b2765ba2496d8bd125"
    "72f8f66486689816d4a45ccc5d65b6926c704850fdedb9da5e154657a78d9d84"
    "90d8ab008cbcd30af7e45805b8b34506d02c1e8fca3f0f02c1afbd0301138a6b"
    "3a9111414f67dcea97f2cfcef0b4e67396ac7422e7ad3585e2f937e81c75df6e"
    "47f11a711d29c5896fb7620eaa18be1bfc563e4bc6d279209adbc0fe78cd5af4"
    "1fdda8338807c731b11210592780ec5f60517fa919b54a0d2de57a9f93c99cef"
    "a0e03b4dae2af5b0c8ebbb3c83539961172b047eba77d626e169146355210c7d"
)
_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys (Nr+1 of 16 bytes each), FIPS-197 §5.2."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                _SBOX[b] for b in (t[1], t[2], t[3], t[0])
            )
            t = bytes((t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]))
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [
        b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)
    ]


def _inv_mix_columns(s: bytearray) -> None:
    for c in range(4):
        a = s[4 * c : 4 * c + 4]
        s[4 * c + 0] = (
            _gmul(a[0], 14) ^ _gmul(a[1], 11) ^ _gmul(a[2], 13)
            ^ _gmul(a[3], 9)
        )
        s[4 * c + 1] = (
            _gmul(a[0], 9) ^ _gmul(a[1], 14) ^ _gmul(a[2], 11)
            ^ _gmul(a[3], 13)
        )
        s[4 * c + 2] = (
            _gmul(a[0], 13) ^ _gmul(a[1], 9) ^ _gmul(a[2], 14)
            ^ _gmul(a[3], 11)
        )
        s[4 * c + 3] = (
            _gmul(a[0], 11) ^ _gmul(a[1], 13) ^ _gmul(a[2], 9)
            ^ _gmul(a[3], 14)
        )


def decrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block through the FIPS-197 §5.3 inverse cipher.

    State layout: FIPS-197 fills the state COLUMN-major; a 16-byte
    block maps so byte i is state column i//4, row i%4 — which means
    InvShiftRows rotates the byte positions {r, r+4, r+8, r+12}."""
    return _decrypt_block_rk(_expand_key(key), block)


def _decrypt_block_rk(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates RIGHT by r (row r = bytes r::4)
        for r in range(1, 4):
            row = [s[r + 4 * c] for c in range(4)]
            for c in range(4):
                s[r + 4 * c] = row[(c - r) % 4]
        # InvSubBytes
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        # AddRoundKey
        for i in range(16):
            s[i] ^= rk[rnd][i]
        if rnd > 0:
            _inv_mix_columns(s)
    return bytes(s)


def encrypt_block(key: bytes, block: bytes) -> bytes:
    """One 16-byte block through the FIPS-197 §5.1 forward cipher —
    needed by PDF's R6 hardened password hash (Algorithm 2.B), whose
    inner loop ENCRYPTS with AES-128-CBC."""
    return _encrypt_block_rk(_expand_key(key), block)


def aes_cbc_encrypt_raw(key: bytes, iv: bytes, plain: bytes) -> bytes:
    """CBC encryption WITHOUT padding (input must be block-aligned) —
    the Algorithm 2.B inner step."""
    if len(plain) % 16:
        raise ValueError("raw CBC input must be a multiple of 16 bytes")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(plain), 16):
        block = bytes(a ^ b for a, b in zip(plain[off : off + 16], prev))
        prev = _encrypt_block_rk(rk, block)
        out += prev
    return bytes(out)


def _encrypt_block_rk(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    for rnd in range(1, nr + 1):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        for r in range(1, 4):
            row = [s[r + 4 * c] for c in range(4)]
            for c in range(4):
                s[r + 4 * c] = row[(c + r) % 4]
        if rnd < nr:
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                s[4 * c + 0] = (
                    _xtime(a[0]) ^ _xtime(a[1]) ^ a[1] ^ a[2] ^ a[3]
                )
                s[4 * c + 1] = (
                    a[0] ^ _xtime(a[1]) ^ _xtime(a[2]) ^ a[2] ^ a[3]
                )
                s[4 * c + 2] = (
                    a[0] ^ a[1] ^ _xtime(a[2]) ^ _xtime(a[3]) ^ a[3]
                )
                s[4 * c + 3] = (
                    _xtime(a[0]) ^ a[0] ^ a[1] ^ a[2] ^ _xtime(a[3])
                )
        for i in range(16):
            s[i] ^= rk[rnd][i]
    return bytes(s)


def aes_cbc_decrypt(key: bytes, payload: bytes) -> bytes:
    """IV-prefixed CBC decryption with PKCS#5 unpadding — the PDF
    AESV2/AESV3 stream layout (ISO 32000 §7.6.2)."""
    if len(payload) < 32 or len(payload) % 16:
        raise ValueError(
            "AES payload must be IV + a positive multiple of 16 bytes"
        )
    iv = payload[:16]
    rk = _expand_key(key)  # once per payload, not per block
    out = bytearray()
    prev = iv
    for off in range(16, len(payload), 16):
        block = payload[off : off + 16]
        out += bytes(
            a ^ b for a, b in zip(_decrypt_block_rk(rk, block), prev)
        )
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("AES padding invalid (wrong key or corrupt data)")
    return bytes(out[:-pad])
