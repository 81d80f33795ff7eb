"""AES-128/256 (FIPS-197) block cipher + CBC mode, from scratch.

Used by the PDF standard security handler's /AESV2 crypt filter
(ISO 32000-1 7.6.2: per-object key with the 'sAlT' suffix, 16-byte
IV prepended to the CBC ciphertext, PKCS#5 padding). The reference
opens AES-encrypted empty-password documents through PDFBox's
standard security handler (tika-parsers/.../pdf/PDFParser.java:76-99);
this module supplies the cipher so the from-scratch parser can do the
same without a crypto dependency.

Pure Python, table-driven. Decrypt is the hot direction (parser);
encrypt exists for the deterministic fixture writer. Both operate on
one object's strings/streams at a time — small payloads, cold path
(encrypted PDFs are a tiny corpus fraction), so interpreter-speed AES
is acceptable; the bulk extraction path never touches this module.
"""

from __future__ import annotations

# FIPS-197 S-box (public spec constant)
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76"
    "ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d83115"
    "04c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f84"
    "53d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa8"
    "51a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d1973"
    "60814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479"
    "e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a"
    "703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df"
    "8ca1890dbfe6426841992d0fb054bb16")

_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


_M2 = bytes(_gmul(x, 2) for x in range(256))
_M3 = bytes(_gmul(x, 3) for x in range(256))
_M9 = bytes(_gmul(x, 9) for x in range(256))
_M11 = bytes(_gmul(x, 11) for x in range(256))
_M13 = bytes(_gmul(x, 13) for x in range(256))
_M14 = bytes(_gmul(x, 14) for x in range(256))

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)

# state layout: flat list, index 4*c + r (FIPS-197 column-major)
_SHIFT = [4 * ((c + r) % 4) + r for c in range(4) for r in range(4)]
_INV_SHIFT = [4 * ((c - r) % 4) + r for c in range(4) for r in range(4)]


def _expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 key schedule for 128/192/256-bit keys: Nr+1 round
    keys of 16 bytes (Nr = Nk + 6)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError("AES needs a 16/24/32-byte key")
    nr = nk + 6
    w = [list(key[i * 4:(i + 1) * 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[b] for b in t[1:] + t[:1]]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [bytes(b for word in w[r * 4:(r + 1) * 4] for b in word)
            for r in range(nr + 1)]


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[0])]
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        s = [s[i] for i in _SHIFT]
        t = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c:c + 4]
            t += (_M2[a0] ^ _M3[a1] ^ a2 ^ a3,
                  a0 ^ _M2[a1] ^ _M3[a2] ^ a3,
                  a0 ^ a1 ^ _M2[a2] ^ _M3[a3],
                  _M3[a0] ^ a1 ^ a2 ^ _M2[a3])
        s = [b ^ k for b, k in zip(t, rks[rnd])]
    s = [_SBOX[b] for b in s]
    s = [s[i] for i in _SHIFT]
    return bytes(b ^ k for b, k in zip(s, rks[nr]))


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    nr = len(rks) - 1
    s = [b ^ k for b, k in zip(block, rks[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = [s[i] for i in _INV_SHIFT]
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rks[rnd])]
        t = []
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = s[c:c + 4]
            t += (_M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                  _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                  _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                  _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3])
        s = t
    s = [s[i] for i in _INV_SHIFT]
    s = [_INV_SBOX[b] for b in s]
    return bytes(b ^ k for b, k in zip(s, rks[0]))


def cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """PDF /AESV2 payload: 16-byte IV prefix + CBC ciphertext with
    PKCS#5 padding. Malformed padding is stripped leniently (degrade,
    don't raise — parity with the reference's tolerant decryptors)."""
    if len(data) < 32:
        return b""
    iv, ct = data[:16], data[16:len(data) - len(data) % 16]
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i:i + 16]
        pt = _decrypt_block(blk, rks)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    pad = out[-1] if out else 0
    if 1 <= pad <= 16 and len(out) >= pad:
        del out[-pad:]
    return bytes(out)


def cbc_encrypt_raw(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """CBC encrypt with NO padding and NO IV prefix (multiple of 16
    required) — the shape ISO 32000-2 Algorithm 2.B's inner AES-128
    step and the /UE /OE key wrapping use."""
    if len(plaintext) % 16:
        raise ValueError("raw CBC needs a 16-byte multiple")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(plaintext), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(plaintext[i:i + 16], prev)), rks)
        out += prev
    return bytes(out)


def cbc_decrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt with NO padding strip and NO IV prefix — /UE /OE
    file-key unwrapping (zero IV, exactly 32 bytes)."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data) - len(data) % 16, 16):
        blk = data[i:i + 16]
        out += bytes(a ^ b for a, b in
                     zip(_decrypt_block(blk, rks), prev))
        prev = blk
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """Forward direction for the fixture writer: returns IV + CBC
    ciphertext with PKCS#5 padding (the /AESV2 wire shape)."""
    pad = 16 - len(plaintext) % 16
    pt = plaintext + bytes([pad]) * pad
    rks = _expand_key(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(pt), 16):
        prev = _encrypt_block(
            bytes(a ^ b for a, b in zip(pt[i:i + 16], prev)), rks)
        out += prev
    return bytes(out)
