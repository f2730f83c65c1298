"""Reference-exact ECL hash functions.

The reference's HASH family (rtl/eclrtl/eclrtl.cpp):

- ``HASH``   — Bob Jenkins' lookup2 (rtlHashData :4017, mix macro :3990),
  initval 0, little-endian words, length folded into c;
- ``HASH32`` — FNV-1 32-bit (rtlHash32Data :3909, init HASH32_INIT
  0x811C9DC5, prime 0x1000193; multiply THEN xor — FNV-1, not 1a);
- ``HASH64`` — FNV-1 64-bit (rtlHash64Data :3820, init
  0xcbf29ce484222325, prime 0x100000001b3);
- ``HASHCRC`` — CRC-32 with the reflected polynomial 0xEDB88320, zero
  initial value and NO final xor (system/jlib/jcrc.cpp table CRC).

Integers hash their 8 little-endian bytes; strings hash their bytes with
trailing spaces trimmed (rtlTrimStrLen). The python forms serve constant
folding and tests; ``fnv1_32_col``/``fnv1_64_col`` are pure-Column
(unrolled byte loop, JVM arithmetic — Java long multiplication wraps
mod 2^64, which IS the FNV-64 modulus) for distributed inputs.

These are the PARITY functions: they reproduce the reference's values
bit-for-bit (pinned by testing/regress/ecl/hash.ecl keys). The
throughput-oriented hashing in functions/hashing.py (xxhash64-based)
remains the default for partitioning/dedup where only distribution
quality matters.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF
FNV32_INIT, FNV32_PRIME = 0x811C9DC5, 0x1000193
FNV64_INIT, FNV64_PRIME = 0xCBF29CE484222325, 0x100000001B3


def _int_bytes(v: int) -> bytes:
    return struct.pack("<q", ((v + 2**63) % 2**64) - 2**63)


def _data(v) -> bytes:
    if isinstance(v, bytes):
        return v  # pre-typed bytes (typed_bytes)
    if isinstance(v, bool):
        return b"\x01" if v else b"\x00"
    if isinstance(v, int):
        return _int_bytes(v)
    if isinstance(v, str):
        return v.rstrip(" ").encode("utf-8", "replace")
    raise TypeError(f"unhashable ECL value {type(v).__name__}")


# Unicode Default_Ignorable_Code_Point ranges (DerivedCoreProperties;
# inclusive). NOT the same set as category Cf — e.g. U+0600 ARABIC
# NUMBER SIGN is Cf yet carries collation weight and must NOT be
# stripped (r15 ADVICE), while U+3164 HANGUL FILLER is Lo yet ignorable.
_DEFAULT_IGNORABLE = (
    (0x00AD, 0x00AD), (0x034F, 0x034F), (0x061C, 0x061C),
    (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180B, 0x180F),
    (0x200B, 0x200F), (0x202A, 0x202E), (0x2060, 0x206F),
    (0x3164, 0x3164), (0xFE00, 0xFE0F), (0xFEFF, 0xFEFF),
    (0xFFA0, 0xFFA0), (0xFFF0, 0xFFF8), (0x1BCA0, 0x1BCA3),
    (0x1D173, 0x1D17A), (0xE0000, 0xE0FFF), (0xE0100, 0xE01EF),
)


def _is_default_ignorable(cp: int) -> bool:
    for lo, hi in _DEFAULT_IGNORABLE:
        if lo <= cp <= hi:
            return True
    return False


def strip_ignorable(s: str) -> str:
    """Remove ICU default-ignorable code points (soft hyphen U+00AD,
    zero-width space U+200B, joiners, bidi marks, variation selectors)
    — they carry no collation weight, so unicode equality and
    rtlHashUnicode both ignore them (eclrtl rtlHashUnicode normalizes;
    issue10957). Filters on the Default_Ignorable_Code_Point property,
    not category Cf (the sets differ — r15 ADVICE)."""
    return "".join(c for c in s if not _is_default_ignorable(ord(c)))


def typed_bytes(v, ty, mode: str = "hash") -> "bytes | object":
    """The byte stream the reference's typed hash helpers feed the hash
    cores (rtlfield.cpp RtlTypeInfo::hash; issue10921/issue10957 keys):

    - string/varstring/qstring — bytes, trailing spaces trimmed
      (rtlTrimStrLen);
    - unicode/varunicode/utf8 — UTF-16LE code units, trailing spaces
      trimmed; HASH/HASH32/HASH64 additionally strip default-ignorable
      code points (rtlHashUnicode normalizes), HASHCRC does not, and
      HASHMD5 hashes the RAW code units untrimmed (``mode``:
      "hash" | "crc" | "md5");
    - data — the RAW bytes, nothing trimmed;
    - everything else — unchanged (ints/bools take _data's rules).
    """
    if not isinstance(v, str) or not isinstance(ty, str):
        return v
    base = ty.lower()
    if base != "utf8":
        base = base.rstrip("0123456789_")
    if base in ("unicode", "varunicode", "utf8"):
        s = v
        if mode == "hash":
            s = strip_ignorable(s).rstrip(" ")
        elif mode == "crc":
            s = s.rstrip(" ")
        return s.encode("utf-16-le", "replace")
    if base == "data":
        # DATA carried as str is a byte-per-char latin-1 round trip
        # (r15 ADVICE: utf-8 would expand bytes >0x7F to multi-byte
        # sequences and diverge from the reference's raw-byte hashing)
        return v.encode("latin-1", "replace")
    if mode == "md5":
        return v.encode("utf-8", "replace")  # raw, untrimmed
    return v


def fnv1_32(v, init: int = FNV32_INIT) -> int:
    """FNV-1 32 with a chainable ``init`` — multi-field hashes chain
    field hashes through ``inhash`` exactly as the reference's
    RtlTypeInfo::hash chain does (rtlfield.cpp:1576 string trims
    trailing blanks, :767 int hashes 8 LE bytes)."""
    h = init
    for b in _data(v):
        h = ((h * FNV32_PRIME) & _M32) ^ b
    return h


def fnv1_64(v) -> int:
    h = FNV64_INIT
    for b in _data(v):
        h = ((h * FNV64_PRIME) & _M64) ^ b
    return h


def _mix(a: int, b: int, c: int):
    a = (a - b - c) & _M32; a ^= c >> 13  # noqa: E702
    b = (b - c - a) & _M32; b ^= (a << 8) & _M32  # noqa: E702
    c = (c - a - b) & _M32; c ^= b >> 13  # noqa: E702
    a = (a - b - c) & _M32; a ^= c >> 12  # noqa: E702
    b = (b - c - a) & _M32; b ^= (a << 16) & _M32  # noqa: E702
    c = (c - a - b) & _M32; c ^= b >> 5  # noqa: E702
    a = (a - b - c) & _M32; a ^= c >> 3  # noqa: E702
    b = (b - c - a) & _M32; b ^= (a << 10) & _M32  # noqa: E702
    c = (c - a - b) & _M32; c ^= b >> 15  # noqa: E702
    return a, b, c


def jenkins_hash(v, init: int = 0) -> int:
    """rtlHashData — Jenkins lookup2 over the value's bytes."""
    k = _data(v)
    a = b = 0x9E3779B9
    c = init
    i, length = 0, len(k)
    ln = length
    while ln >= 12:
        a = (a + int.from_bytes(k[i : i + 4], "little")) & _M32
        b = (b + int.from_bytes(k[i + 4 : i + 8], "little")) & _M32
        c = (c + int.from_bytes(k[i + 8 : i + 12], "little")) & _M32
        a, b, c = _mix(a, b, c)
        i += 12
        ln -= 12
    c = (c + length) & _M32
    t = k[i:]
    if ln >= 9:
        c = (c + sum(t[8 + j] << (8 * (j + 1)) for j in range(ln - 8))) & _M32
    if ln >= 5:
        b = (b + sum(t[4 + j] << (8 * j) for j in range(min(ln, 8) - 4))) & _M32
    if ln >= 1:
        a = (a + sum(t[j] << (8 * j) for j in range(min(ln, 4)))) & _M32
    a, b, c = _mix(a, b, c)
    return c


_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (0xEDB88320 if _c & 1 else 0)
    _CRC_TABLE.append(_c)


def ecl_crc(v) -> int:
    """HASHCRC — table CRC-32, zero init, no final xor."""
    c = 0
    for b in _data(v):
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c


def fnv1_32_col(col: Column) -> Column:
    """Column FNV-1 32 over an integer's 8 LE bytes — unrolled JVM
    arithmetic, no UDF (h*prime stays under 2^56, no overflow)."""
    v = col.cast("long")
    h = F.lit(FNV32_INIT).cast("long")
    for i in range(8):
        byte = F.shiftrightunsigned(v, 8 * i).bitwiseAND(F.lit(0xFF))
        h = (h * F.lit(FNV32_PRIME)).bitwiseAND(F.lit(_M32)).bitwiseXOR(byte)
    return h


def fnv1_64_col(col: Column) -> Column:
    """Column FNV-1 64 over an integer's 8 LE bytes — Arrow-batched
    (ANSI mode rejects the wrap-multiply a pure-Column form needs).
    Values above 2^63 come back wrapped into the signed long range;
    callers masking to a field width (unsignedN) are unaffected."""
    def _fnv64(vs):
        def one(v):
            if v is None:
                return None
            h = fnv1_64(int(v))
            return h - (1 << 64) if h >= 1 << 63 else h

        return vs.apply(one)

    # explicit returnType form: postponed annotations (PEP 563) confuse
    # the decorator's type-hint inspection
    return F.pandas_udf(_fnv64, "long")(col.cast("long"))


def jenkins_col(col: Column) -> Column:
    """Column Jenkins lookup2 over an integer's 8 LE bytes —
    Arrow-batched parity path."""
    def _jh(vs):
        return vs.apply(lambda v: None if v is None else jenkins_hash(int(v)))

    return F.pandas_udf(_jh, "long")(col.cast("long"))


def ecl_crc_col(col: Column) -> Column:
    """Column table-CRC over an integer's 8 LE bytes — Arrow-batched."""
    def _crc(vs):
        return vs.apply(lambda v: None if v is None else ecl_crc(int(v)))

    return F.pandas_udf(_crc, "long")(col.cast("long"))


def _mix_col(a: Column, b: Column, c: Column):
    """Column form of the lookup2 mix macro — 32-bit wrapping
    subtraction/xor/shift over longs masked to 32 bits."""
    m32 = F.lit(_M32)

    def sub(x, y, z):
        return (x - y - z).bitwiseAND(m32)

    a = sub(a, b, c); a = a.bitwiseXOR(F.shiftright(c, 13))  # noqa: E702
    b = sub(b, c, a); b = b.bitwiseXOR(F.shiftleft(a, 8).bitwiseAND(m32))  # noqa: E702,E501
    c = sub(c, a, b); c = c.bitwiseXOR(F.shiftright(b, 13))  # noqa: E702
    a = sub(a, b, c); a = a.bitwiseXOR(F.shiftright(c, 12))  # noqa: E702
    b = sub(b, c, a); b = b.bitwiseXOR(F.shiftleft(a, 16).bitwiseAND(m32))  # noqa: E702,E501
    c = sub(c, a, b); c = c.bitwiseXOR(F.shiftright(b, 5))  # noqa: E702
    a = sub(a, b, c); a = a.bitwiseXOR(F.shiftright(c, 3))  # noqa: E702
    b = sub(b, c, a); b = b.bitwiseXOR(F.shiftleft(a, 10).bitwiseAND(m32))  # noqa: E702,E501
    c = sub(c, a, b); c = c.bitwiseXOR(F.shiftright(b, 15))  # noqa: E702
    return a, b, c


def jenkins_int_col(col: Column) -> Column:
    """Pure-Column Jenkins lookup2 over an integer's 8 LE bytes — the
    len==8 tail unrolled (a += word0; b += word1; c += 8; mix). No UDF,
    so it composes inside higher-order-function lambdas (gsoc2's
    SORT(l.children, HASH(cid)))."""
    m32 = F.lit(_M32)
    v = col.cast("long")
    # little-endian words of the two's-complement 64-bit value
    w0 = v.bitwiseAND(F.lit(0xFFFFFFFF))
    w1 = F.shiftrightunsigned(v, 32).bitwiseAND(F.lit(0xFFFFFFFF))
    a = (F.lit(0x9E3779B9) + w0).bitwiseAND(m32)
    b = (F.lit(0x9E3779B9) + w1).bitwiseAND(m32)
    c = F.lit(8).cast("long")
    _a, _b, c = _mix_col(a, b, c)
    return c
