"""ECL record/type layer (SURVEY.md §1.2-1.3).

The reference's type system (type_vals, system/include/rtlconst.hpp:25-85)
is declared per-record at compile time; this module maps those declarations
onto Spark StructTypes and supplies the ingest/compare codecs where Spark's
types don't carry the semantics natively:

- fixed-width STRINGn is blank-padded with trailing-blank-insensitive
  comparison (ECL semantics) → rpad on ingest, rtrim on compare;
- UNSIGNED8 exceeds signed long → DecimalType(20, 0);
- QSTRING is a 6-bit uppercase alphabet → uppercase StringType;
- DECIMALn_m (packed BCD, rtl/nbcd/nbcd.hpp, max 32 digits) →
  DecimalType(n, m);
- Std.Date Date_t/Time_t int encodings live in functions.dates.

Record definitions are ordered field lists, mirroring ECL RECORD structure
including nesting (child DATASET fields → ArrayType(StructType)).
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_TYPES = {1: T.ByteType(), 2: T.ShortType(), 3: T.IntegerType(), 4: T.IntegerType(),
              5: T.LongType(), 6: T.LongType(), 7: T.LongType(), 8: T.LongType()}
_UINT_TYPES = {1: T.ShortType(), 2: T.IntegerType(), 3: T.IntegerType(), 4: T.LongType(),
               5: T.LongType(), 6: T.LongType(), 7: T.LongType()}


@dataclass(frozen=True)
class Field:
    name: str
    ecl_type: str
    # nested child dataset: a RecordDef instead of a scalar type string
    child: "RecordDef | None" = None


@dataclass(frozen=True)
class RecordDef:
    """Ordered ECL RECORD — build with ecl_type strings like 'string10',
    'unsigned4', 'decimal10_2', 'set of string', or nested records."""

    fields: Sequence[Field] = field(default_factory=list)

    def spark_type(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, _resolve(f), True) for f in self.fields]
        )

    def coerce(self, df: DataFrame) -> DataFrame:
        """Apply ingest codecs: rpad fixed strings, uppercase qstrings,
        cast ints/decimals to the declared widths."""
        out = df
        for f in self.fields:
            out = out.withColumn(f.name, _ingest(f, F.col(f.name)))
        return out


def _resolve(f: Field) -> T.DataType:
    t = f.ecl_type.lower().strip()
    if f.child is not None:
        return T.ArrayType(f.child.spark_type())
    if t == "boolean":
        return T.BooleanType()
    if t in ("real4",):
        return T.FloatType()
    if t in ("real", "real8"):
        return T.DoubleType()
    if t == "data":
        return T.BinaryType()
    if m := re.fullmatch(r"integer(\d)", t):
        return _INT_TYPES[int(m.group(1))]
    if t == "integer":
        return T.LongType()
    if m := re.fullmatch(r"unsigned(\d)", t):
        n = int(m.group(1))
        # UNSIGNED8's full range exceeds signed long (the reference stores
        # it as a raw 8-byte value) → 20-digit decimal.
        return T.DecimalType(20, 0) if n == 8 else _UINT_TYPES[n]
    if t == "unsigned":
        return T.DecimalType(20, 0)
    if m := re.fullmatch(r"u?decimal(\d+)_(\d+)", t):
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if m := re.fullmatch(r"u?decimal(\d+)", t):
        return T.DecimalType(int(m.group(1)), 0)
    if re.fullmatch(r"(string|qstring|varstring|unicode|utf8)(\d*)", t):
        return T.StringType()
    if t.startswith("set of "):
        inner = Field(f.name, t[len("set of "):])
        return T.ArrayType(_resolve(inner))
    if t.startswith("alien:"):
        # user TYPE module (type_alien rtlconst.hpp:52): the logical
        # type comes from the registered codec
        return alien_type(t[len("alien:"):]).logical_type
    raise ValueError(f"unknown ECL type: {f.ecl_type}")


def _ingest(f: Field, c: Column) -> Column:
    t = f.ecl_type.lower().strip()
    if t.startswith("alien:"):
        return alien_load(t[len("alien:"):], c)
    if m := re.fullmatch(r"string(\d+)", t):
        # Fixed-width blank-padded (type_string, rtlconst.hpp:31): pad to
        # width, truncate overflow — byte-compatible with the reference's
        # fixed STRINGn layout.
        n = int(m.group(1))
        return F.rpad(F.substring(c, 1, n), n, " ")
    if m := re.fullmatch(r"qstring(\d*)", t):
        q = F.upper(c)
        if m.group(1):
            n = int(m.group(1))
            q = F.rpad(F.substring(q, 1, n), n, " ")
        return q
    target = _resolve(f)
    if not isinstance(target, (T.StringType, T.ArrayType, T.StructType, T.BinaryType)):
        return c.cast(target)
    return c


def fixed_eq(a: Column | str, b: Column | str) -> Column:
    """ECL fixed-string equality: trailing blanks are insignificant
    (STRINGn comparison semantics)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.rtrim(ca) == F.rtrim(cb)


# -- exotic ingest types (rtlconst.hpp: type_ebcdic :79, type_bitfield :36,
# -- type_enumerated :39, type_ifblock :70) ---------------------------------

def _ebcdic_tables(codepage: str) -> tuple[str, str]:
    src = "".join(chr(i) for i in range(256))
    dst = bytes(range(256)).decode(codepage)
    return src, dst


def ebcdic_to_string(col: Column | str, codepage: str = "cp037") -> Column:
    """EBCDIC string ingest (type_ebcdic, rtlconst.hpp:79): decode an
    EBCDIC-encoded binary/fixed-string field to a Unicode string.

    JVM-side: the 256-entry code page is baked into one ``translate`` call
    (byte -> latin-1 char -> code-page char), so decoding stays inside
    whole-stage codegen — no Python UDF for a per-row byte remap."""
    c = F.col(col) if isinstance(col, str) else col
    src, dst = _ebcdic_tables(codepage)
    return F.translate(F.decode(c, "ISO-8859-1"), src, dst)


def bitfield_extract(col: Column | str, start_bit: int, n_bits: int) -> Column:
    """BITFIELD unpack (type_bitfield, rtlconst.hpp:36): ``n_bits`` wide
    field starting at ``start_bit`` (LSB=0) of an integer container —
    shift + mask, pure codegen arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    mask = (1 << n_bits) - 1
    return F.shiftright(c.cast("long"), start_bit).bitwiseAND(F.lit(mask))


def enum_decode(
    col: Column | str, mapping: dict[int, str], default: str | None = None
) -> Column:
    """ENUM ingest (type_enumerated, rtlconst.hpp:39): integer code ->
    label via a literal map lookup (broadcast into the plan)."""
    c = F.col(col) if isinstance(col, str) else col
    pairs = [x for k, v in mapping.items() for x in (F.lit(k), F.lit(v))]
    looked = F.create_map(*pairs)[c]
    return F.coalesce(looked, F.lit(default)) if default is not None else looked


def ifblock(cond: Column, **fields: Column) -> list[Column]:
    """IFBLOCK (type_ifblock, rtlconst.hpp:70): fields that exist only when
    the guard condition on earlier fields holds — absent fields are NULL,
    exactly the reference's semantics when the block isn't present."""
    return [F.when(cond, c).alias(n) for n, c in fields.items()]


# -- alien types (type_alien, rtlconst.hpp:52) ------------------------------
# The reference lets a record declare a user TYPE module whose LOAD/STORE
# functions translate between the stored physical form and the logical
# value (eclhelper IHThorAlienTypeInfo). The Spark analogue: a registered
# codec pair of Column transforms applied at ingest/store time.

@dataclass(frozen=True)
class AlienType:
    """A pluggable physical<->logical codec (type_alien).

    ``load`` maps the stored Column to the logical value (the TYPE
    module's LOAD); ``store`` maps a logical value back to the stored
    form (STORE); ``logical_type`` is the Spark type LOAD yields."""

    name: str
    load: "object"   # Callable[[Column], Column]
    store: "object"  # Callable[[Column], Column]
    logical_type: T.DataType


_ALIEN_TYPES: dict[str, AlienType] = {}


def register_alien_type(name, load, store, logical_type) -> AlienType:
    """Register an alien TYPE so record fields may declare
    ``alien:<name>`` and get the codec applied on ingest. Returns the
    registration (idempotent by name; re-registering replaces)."""
    at = AlienType(name.lower(), load, store, logical_type)
    _ALIEN_TYPES[at.name] = at
    return at


def alien_type(name: str) -> AlienType:
    at = _ALIEN_TYPES.get(name.lower())
    if at is None:
        raise KeyError(f"alien type {name!r} is not registered")
    return at


def alien_load(name: str, col: Column | str) -> Column:
    """Stored physical form -> logical value (TYPE module LOAD)."""
    c = F.col(col) if isinstance(col, str) else col
    return alien_type(name).load(c)


def alien_store(name: str, col: Column | str) -> Column:
    """Logical value -> stored physical form (TYPE module STORE)."""
    c = F.col(col) if isinstance(col, str) else col
    return alien_type(name).store(c)
