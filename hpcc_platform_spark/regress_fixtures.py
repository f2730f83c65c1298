"""Reference-regress fixture shims: the setup/* data-generation modules
re-expressed Spark-side.

The reference's regression suite generates its input data once
(testing/regress/ecl/setup/setup.ecl, setupsq.ecl) and each test then
reads it through module members of testing/regress/ecl/setup/files.ecl
(``setup.Files(...)``: DG_FlatFile, DG_Fnames, QueryFilePrefix, ...) and
setup/sq.ecl (``setup.sq(...)``: HousePersonBookDs, SimplePersonBookDs,
...). This module rebuilds those datasets as DataFrames so the regress
files run verbatim: the generation RULES are re-implemented in Spark
idiom (cited per function), while the fixture LITERALS (the name lists,
the house/person/book rows) are parsed OUT of the reference tree at
runtime — nothing is vendored, the same way the regress harness reads
key/*.xml at test time.

Member kinds a shim exposes (consumed by eclfront's shim binder):
  ("const", value, ecl_type) — scalar constants (file-name prefixes...)
  ("set", [values])          — SET OF constants (DG_Fnames...)
  ("record", fields)         — record definitions, eclfront field tuples
  ("dataset", build, fields) — build(spark) -> DataFrame, lazy + cached
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import functions as F
from pyspark.sql.window import Window

_ECL_SETUP = "/root/reference/testing/regress/ecl/setup"

# fixture DataFrames are tiny (5-576 rows) but shared across every
# parser instance in a session — build each once per SparkSession
_DF_CACHE: dict = {}


def build_df(spark, fn):
    key = (id(spark), fn.__name__)
    if key not in _DF_CACHE:
        _DF_CACHE[key] = fn(spark)
    return _DF_CACHE[key]


def _read(name: str) -> str:
    with open(f"{_ECL_SETUP}/{name}") as f:
        return f.read()


# --------------------------------------------------------------------------
# DG fixture (setup/setup.ecl + setup/files.ecl)
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _dg_sets() -> dict[str, list]:
    """The EXPORT SET OF ... atoms from setup/files.ecl, parsed at
    runtime (files.ecl:188-206). Each set has 16 elements."""
    text = _read("files.ecl")
    out: dict[str, list] = {}
    for m in re.finditer(
        r"EXPORT\s+SET\s+OF\s+(\w+)\s+(\w+)\s*:=\s*\[([^;]*)\];",
        text,
        re.S,
    ):
        ty, name, body = m.group(1).lower(), m.group(2).lower(), m.group(3)
        vals: list = []
        for item in body.split(","):
            item = item.strip()
            if item.startswith("'"):
                vals.append(item[1:-1])
            else:
                vals.append(int(item))
        if ty.startswith("string"):
            w = int(ty[6:]) if len(ty) > 6 else None
            if w:
                vals = [v.ljust(w) for v in vals]
        out[name] = vals
    return out


# eclfront field tuples: (name, spark_type, width, default)
DG_OUTREC = [
    ("dg_parentid", "long", None, None),
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", 10, None),
    ("dg_prange", "long", None, None),
]
DG_OUTRECCHILD = [
    ("dg_parentid", "long", None, None),
    ("dg_childid", "long", None, None),
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", 10, None),
    ("dg_prange", "long", None, None),
]
_FILEPOS = ("filepos", "long", None, None)
_FILEPOS_VAR = ("__filepos", "long", None, None)
# DG_OutRec is 4+10+10+1 bytes in the reference's flat layout — the
# virtual(fileposition) column is the byte offset of each record
_DG_RECSIZE = 25
_DG_CHILD_RECSIZE = 29


def _dg_parent_rows() -> list[tuple]:
    """DG_ParentRecs (setup.ecl:24-52): one blank row normalized 4× per
    field — firstname outermost, then lastname, then prange — with
    DG_ParentID := COUNTER-1 in that generation order."""
    s = _dg_sets()
    fn, ln, pr = s["dg_fnames"], s["dg_lnames"], s["dg_pranges"]
    rows = []
    pid = 0
    for i in range(4):
        for j in range(4):
            for k in range(4):
                rows.append((pid, fn[i], ln[j], pr[k]))
                pid += 1
    return rows


def _dg_parents(spark):
    # __ord__ carries the stored stream position so joins/positional
    # operators see the reference's emission order
    rows = [
        r + (i * _DG_RECSIZE, i) for i, r in enumerate(_dg_parent_rows())
    ]
    return spark.createDataFrame(
        rows,
        "dg_parentid long, dg_firstname string, dg_lastname string, "
        "dg_prange long, filepos long, __ord__ long",
    ).coalesce(1)


def _dg_children(spark):
    """DG_ChildRecs (setup.ecl:55-66): DG_MaxChildren(=3) per parent,
    DG_ChildID := global COUNTER-1 over the generated stream."""
    rows = []
    cid = 0
    out = []
    for r in _dg_parent_rows():
        for _ in range(3):
            out.append((r[0], cid, r[1], r[2], r[3], cid * _DG_CHILD_RECSIZE))
            cid += 1
    return spark.createDataFrame(
        out,
        "dg_parentid long, dg_childid long, dg_firstname string, "
        "dg_lastname string, dg_prange long, filepos long",
    ).coalesce(1)


def _dg_grandchildren(spark):
    """DG_GrandChildRecs (setup.ecl:70-73): DG_MaxGrandChildren(=3) per
    child, child fields copied through (ChildID stays the child's)."""
    rows = []
    cid = 0
    n = 0
    out = []
    for r in _dg_parent_rows():
        for _ in range(3):
            for _ in range(3):
                out.append(
                    (r[0], cid, r[1], r[2], r[3], n * _DG_CHILD_RECSIZE)
                )
                n += 1
            cid += 1
    return spark.createDataFrame(
        out,
        "dg_parentid long, dg_childid long, dg_firstname string, "
        "dg_lastname string, dg_prange long, filepos long",
    ).coalesce(1)


def _dg_evens(spark):
    """DG_FlatFileEvens (setup.ecl:84-92): parents whose firstname is an
    even-indexed DG_Fnames element."""
    s = _dg_sets()
    evens = {s["dg_fnames"][i] for i in range(1, 16, 2)}
    # filepos restarts for the evens FILE (it is its own stored file —
    # fetch.ecl pins offsets 0, 25, 50 ...)
    rows = [r for r in _dg_parent_rows() if r[1] in evens]
    rows = [r + (j * _DG_RECSIZE, j) for j, r in enumerate(rows)]
    return spark.createDataFrame(
        rows,
        "dg_parentid long, dg_firstname string, dg_lastname string, "
        "dg_prange long, filepos long, __ord__ long",
    ).coalesce(1)


DG_OUTREC_FP = DG_OUTREC + [_FILEPOS]
DG_OUTRECCHILD_FP = DG_OUTRECCHILD + [_FILEPOS]

# ---- var-file fixture (setup.ecl:113-123 Proj1 + files.ecl:131-181) ----

DG_VAR_REC = [
    ("emptyfield", "string", None, None),
    ("dg_parentid", "long", None, None),
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", 10, None),
    ("dg_prange", "long", None, None),
    # IFBLOCK(self.DG_Prange%2=0) string20 ExtraField — absent rows
    # read as NULL (rendered as an omitted cell)
    ("extrafield", "string", 20, ("__optional__", None, None)),
]
DG_VAR_REC_FP = DG_VAR_REC + [_FILEPOS_VAR]
DG_INTINDEX_REC = [
    ("dg_parentid", "long", None, None),
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", None, None),
    _FILEPOS_VAR,
]
DG_VARINDEX_REC = [
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", 10, None),
    _FILEPOS_VAR,
]


def _dg_var_rows() -> list[tuple]:
    """DG_VarOutRecs (setup.ecl:113-120): per parent row, ExtraField
    only when DG_Prange is even — trim(lastname[1..n]+firstname[1..n],
    ALL) with n=prange (or prange-10 past 10). __filepos accumulates
    the VARIABLE record size: 4-byte string length prefix + 25 fixed +
    20 when the IFBLOCK is present."""
    rows = []
    pos = 0
    for pid, fn, ln, pr in _dg_parent_rows():
        extra = None
        if pr % 2 == 0:
            n = pr if pr <= 10 else pr - 10
            extra = (ln[:n] + fn[:n]).replace(" ", "").ljust(20)
        rows.append(("", pid, fn, ln, pr, extra, pos))
        pos += 4 + _DG_RECSIZE + (20 if extra is not None else 0)
    return rows


def _dg_varfile(spark):
    rows = [r + (i,) for i, r in enumerate(_dg_var_rows())]
    return spark.createDataFrame(
        rows,
        "emptyfield string, dg_parentid long, dg_firstname string, "
        "dg_lastname string, dg_prange long, extrafield string, "
        "__filepos long, __ord__ long",
    ).coalesce(1)


def _dg_intindex(spark):
    """DG_IntIndex (files.ecl:177): keys {DG_parentID; DG_firstname},
    payload STRING DG_lastname, __filepos — key order."""
    rows = sorted(
        ((r[1], r[2], r[3], r[6]) for r in _dg_var_rows()),
        key=lambda t: (t[0], t[1], t[3]),
    )
    rows = [r + (i,) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        rows,
        "dg_parentid long, dg_firstname string, dg_lastname string, "
        "__filepos long, __ord__ long",
    ).coalesce(1)


def _dg_varindex(spark):
    """DG_NormalVarIndex / DG_VarIndex (files.ecl:175,181): keys
    {DG_firstname; DG_lastname; __filepos}."""
    rows = sorted(
        ((r[2], r[3], r[6]) for r in _dg_var_rows()),
        key=lambda t: (t[0], t[1], t[2]),
    )
    rows = [r + (i,) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        rows,
        "dg_firstname string, dg_lastname string, __filepos long, "
        "__ord__ long",
    ).coalesce(1)


# ---- qfetch index (files.ecl:104): QSTRING keys, no payload ----

DG_QFETCH_INDEX_REC = [
    ("lname", "string", 25, None),
    ("fname", "string", 15, None),
]


def _dg_qfetchindex(spark):
    """DG_QFetchIndex: {qstring25 Lname, qstring15 Fname} — QSTRING is
    the 6-bit UPPERCASE alphabet (rtlconst type_qstring), key order."""
    rows = sorted(
        (r[3].upper(), r[4].upper()) for r in _fetch_rows()
    )
    rows = [r + (i,) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        rows, "lname string, fname string, __ord__ long"
    ).coalesce(1)


# ---- fetch fixture (setup/setup_fetch.ecl + files.ecl:88-114) ----

DG_FETCH_REC = [
    ("sequence", "long", None, None),
    ("state", "string", 2, None),
    ("city", "string", 20, None),
    ("lname", "string", 25, None),
    ("fname", "string", 15, None),
]
_FETCH_FILEPOS = ("__filepos", "long", None, None)
DG_FETCH_REC_FP = DG_FETCH_REC + [_FETCH_FILEPOS]
# INDEX(DG_FetchFile, {Lname,Fname}, {tfn := TRIM(Fname), state,
# STRING100 blobfield := fname+lname, __filepos}) (files.ecl:103)
DG_FETCH_INDEX_REC = [
    ("lname", "string", 25, None),
    ("fname", "string", 15, None),
    ("tfn", "string", None, None),
    ("state", "string", 2, None),
    ("blobfield", "string", 100, None),
    _FETCH_FILEPOS,
]
_DG_FETCH_RECSIZE = 70  # 8+2+20+25+15 bytes


@lru_cache(maxsize=None)
def _fetch_rows() -> list[tuple]:
    """FetchData literals (setup_fetch.ecl), in the stored FILE order:
    two-way DISTRIBUTE on lname<'Jom', each part SORTed by whole record,
    parts concatenated — __filepos is the global 70-byte offset."""
    text = _read("setup_fetch.ecl")
    rows: list[tuple] = []
    for m in re.finditer(
        r"\{(\d+),\s*'([^']*)',\s*'([^']*)',\s*'([^']*)',\s*'([^']*)'\}",
        text,
    ):
        seq, state, city, ln, fn = m.groups()
        rows.append((int(seq), state, city, ln, fn))
    ordered = sorted(r for r in rows if r[3] < "Jom") + sorted(
        r for r in rows if not (r[3] < "Jom")
    )
    return [
        (
            seq,
            state.ljust(2),
            city.ljust(20),
            ln.ljust(25),
            fn.ljust(15),
            i * _DG_FETCH_RECSIZE,
        )
        for i, (seq, state, city, ln, fn) in enumerate(ordered)
    ]


def _dg_fetchfile(spark):
    return spark.createDataFrame(
        _fetch_rows(),
        "sequence long, state string, city string, lname string, "
        "fname string, __filepos long",
    ).coalesce(1)


def _dg_fetchindex(spark):
    """DG_FetchIndex read order: (lname, fname, state, __filepos) — the
    BUILDINDEX sort (setup_fetch.ecl); payload per files.ecl:103."""
    rows = sorted(
        (
            (r[3], r[4], r[4].strip(), r[1], (r[4] + r[3]).ljust(100), r[5])
            for r in _fetch_rows()
        ),
        key=lambda t: (t[0], t[1], t[3], t[5]),
    )
    return spark.createDataFrame(
        [r + (i,) for i, r in enumerate(rows)],
        "lname string, fname string, tfn string, state string, "
        "blobfield string, __filepos long, __ord__ long",
    ).coalesce(1)


def files_members(multi_part: bool = False, use_local: bool = False) -> dict:
    """The setup.Files(...) module surface (setup/files.ecl). File-name
    prefixes are deterministic constants (they only key the front door's
    logical-file store); DG_* datasets are the generated fixture."""
    prefix = "~regress::" + ("multi" if multi_part else "single") + "::"
    iprefix = "~regress::" + (
        "local" if (multi_part and use_local) else
        "multi" if multi_part else "single"
    ) + "::"
    qprefix = prefix + "spark::workunit::"
    s = _dg_sets()
    m: dict[str, tuple] = {
        "fileprefix": ("const", prefix, "string"),
        "indexprefix": ("const", iprefix, "string"),
        "queryfileprefixid": ("const", "spark::workunit::", "string"),
        "queryfileprefix": ("const", qprefix, "string"),
        "dg_fileout": ("const", prefix + "dg_", "string"),
        "dg_indexout": ("const", iprefix + "dg_", "string"),
        "dg_parentfileout": ("const", prefix + "dg_parent.d00", "string"),
        "dg_childfileout": ("const", prefix + "dg_child.d00", "string"),
        "dg_grandchildfileout": (
            "const", prefix + "dg_grandchild.d00", "string",
        ),
        "dg_maxfield": ("const", 3, "integer"),
        "dg_maxchildren": ("const", 3, "integer"),
        "dg_maxgrandchildren": ("const", 3, "integer"),
        "dg_outrec": ("record", DG_OUTREC),
        "dg_outrecchild": ("record", DG_OUTRECCHILD),
        "dg_flatfile": ("dataset", _dg_parents, DG_OUTREC_FP),
        "dg_flatfileevens": ("dataset", _dg_evens, DG_OUTREC_FP),
        "dg_parentfile": ("dataset", _dg_parents, DG_OUTREC_FP),
        "dg_childfile": ("dataset", _dg_children, DG_OUTRECCHILD_FP),
        "dg_grandchildfile": (
            "dataset", _dg_grandchildren, DG_OUTRECCHILD_FP,
        ),
        # index reads are filtered scans of the base file on this engine
        # (sources/index.py design); same rows, key order
        "dg_indexfile": ("dataset", _dg_index, DG_OUTREC_FP),
        "dg_indexfileevens": ("dataset", _dg_index_evens, DG_OUTREC_FP),
        "dg_varoutrec": ("record", DG_VAR_REC),
        "dg_varfile": ("dataset", _dg_varfile, DG_VAR_REC_FP),
        "dg_intindex": ("dataset", _dg_intindex, DG_INTINDEX_REC),
        "dg_normalvarindex": ("dataset", _dg_varindex, DG_VARINDEX_REC),
        "dg_transvarindex": ("dataset", _dg_varindex, DG_VARINDEX_REC),
        "dg_varindex": ("dataset", _dg_varindex, DG_VARINDEX_REC),
        "dg_fetchrecord": ("record", DG_FETCH_REC),
        "dg_fetchfilename": ("const", prefix + "c.dg_fetchfile", "string"),
        "dg_fetchindex1name": ("const", iprefix + "dg_fetchindex1", "string"),
        "dg_fetchindexdiffname": (
            "const", iprefix + "dg_fetchindexdiff", "string",
        ),
        "dg_fetchfile": ("dataset", _dg_fetchfile, DG_FETCH_REC_FP),
        "dg_fetchfilepreload": ("dataset", _dg_fetchfile, DG_FETCH_REC_FP),
        "dg_fetchfilepreloadindexed": (
            "dataset", _dg_fetchfile, DG_FETCH_REC_FP,
        ),
        "dg_fetchindex": ("dataset", _dg_fetchindex, DG_FETCH_INDEX_REC),
        "dg_qfetchindexname": (
            "const", iprefix + "dg_qfetchindex1", "string",
        ),
        "dg_qfetchindex": (
            "dataset", _dg_qfetchindex, DG_QFETCH_INDEX_REC,
        ),
        "dg_fetchindex1": ("dataset", _dg_fetchindex, DG_FETCH_INDEX_REC),
        "dg_keyedindexfile": (
            "dataset", _dg_keyedindex, DG_KEYEDINDEX_REC,
        ),
        "dg_keyedindexfiledelta": (
            "dataset", _dg_keyedindex_delta, DG_KEYEDINDEX_REC,
        ),
        "dg_dupkeyedindexfile": (
            "dataset", _dg_dupkeyedindex, DG_KEYEDINDEX_REC,
        ),
        "dg_dupkeyedindexsuperfilename": (
            "const", iprefix + "dg_KEYED_INDEX_DUP", "string",
        ),
        # ts text-search word index (files.ecl:206-209; fixture below)
        "namewordindex": ("const", iprefix + "wordIndex", "string"),
        "getwordindex": ("dataset", _ts_word_index, TS_WORDINDEX_REC),
    }
    for name, vals in s.items():
        m[name] = ("set", vals)
    return m


def _dg_index(spark):
    """DG_NormalIndexFile: the flat file ordered by its index key
    (DG_firstname, DG_lastname) — an index read returns key order."""
    df = _dg_parents(spark).drop("__ord__")
    df = df.orderBy("dg_firstname", "dg_lastname", "filepos").coalesce(1)
    return df.withColumn(
        "__ord__", F.row_number().over(
            Window.orderBy("dg_firstname", "dg_lastname", "filepos")
        ).cast("long"),
    ).coalesce(1)


DG_KEYEDINDEX_REC = [
    ("dg_firstname", "string", 10, None),
    ("dg_lastname", "string", 10, None),
    ("dg_prange", "long", None, None),
    ("filepos", "long", None, None),
]


def _dg_keyedindex(spark, delta: int = 0):
    """DG_KeyedIndexFile (files.ecl:159): keys {DG_firstname,
    DG_lastname, DG_Prange}, payload {filepos}, fileposition(false) —
    reads come back in key order. The DELTA variant (files.ecl:160)
    stores filepos+1."""
    df = _dg_parents(spark).drop("__ord__")
    df = df.select(
        "dg_firstname", "dg_lastname", "dg_prange",
        (F.col("filepos") + delta).alias("filepos"),
    )
    return df.withColumn(
        "__ord__",
        F.row_number().over(
            Window.orderBy(
                "dg_firstname", "dg_lastname", "dg_prange", "filepos"
            )
        ).cast("long"),
    ).coalesce(1)


def _dg_keyedindex_delta(spark):
    return _dg_keyedindex(spark, 1)


def _dg_dupkeyedindex(spark):
    """DG_DupKeyedIndexFile (files.ecl:162): superfile merge of the
    KEYED and KEYED_DELTA indexes, k-way merged on the key fields.
    (The reference's within-key tie order between sub-indexes is a
    B+tree node-interleaving artifact; here ties read filepos-ascending.)"""
    a = _dg_keyedindex(spark).drop("__ord__")
    b = _dg_keyedindex_delta(spark).drop("__ord__")
    u = a.unionByName(b)
    return u.withColumn(
        "__ord__",
        F.row_number().over(
            Window.orderBy(
                "dg_firstname", "dg_lastname", "dg_prange", "filepos"
            )
        ).cast("long"),
    ).coalesce(1)


def _dg_index_evens(spark):
    df = _dg_evens(spark).drop("__ord__")
    df = df.orderBy("dg_firstname", "dg_lastname", "filepos").coalesce(1)
    return df.withColumn(
        "__ord__", F.row_number().over(
            Window.orderBy("dg_firstname", "dg_lastname", "filepos")
        ).cast("long"),
    ).coalesce(1)


# --------------------------------------------------------------------------
# sq fixture (setup/setupsq.ecl + setup/sq.ecl)
# --------------------------------------------------------------------------

BOOK_ID_REC = [
    ("id", "long", None, None),
    ("name", "string", None, None),
    ("author", "string", None, None),
    ("rating100", "long", None, None),
    ("price", "decimal(8,2)", None, None),
]
PERSON_BOOK_ID_REC = [
    ("id", "long", None, None),
    ("forename", "string", None, None),
    ("surname", "string", None, None),
    ("dob", "decimal(8,0)", None, None),
    ("booklimit", "decimal(8,0)", None, None),
    ("aage", "long", None, None),
    ("books", "array<struct<id: long, name: string, author: string, "
     "rating100: long, price: decimal(8,2)>>", None,
     ("__child__", BOOK_ID_REC)),
]
HOUSE_PERSON_BOOK_ID_REC = [
    ("id", "long", None, None),
    ("addr", "string", None, None),
    ("postcode", "string", 10, None),
    ("yearbuilt", "long", None, None),
    ("persons", "array<struct<id: long, forename: string, surname: string, "
     "dob: decimal(8,0), booklimit: decimal(8,0), aage: long, "
     "books: array<struct<id: long, name: string, author: string, "
     "rating100: long, price: decimal(8,2)>>>>", None,
     ("__child__", PERSON_BOOK_ID_REC)),
]
HOUSE_ID_REC = [
    ("id", "long", None, None),
    ("addr", "string", None, None),
    ("postcode", "string", 10, None),
    ("yearbuilt", "long", None, None),
]
PERSON_RELATED_ID_REC = [
    ("id", "long", None, None),
    ("forename", "string", None, None),
    ("surname", "string", None, None),
    ("dob", "decimal(8,0)", None, None),
    ("booklimit", "decimal(8,0)", None, None),
    ("aage", "long", None, None),
    ("houseid", "long", None, None),
]
PERSON_BOOK_RELATED_ID_REC = PERSON_BOOK_ID_REC + [
    ("houseid", "long", None, None)
]
BOOK_RELATED_ID_REC = BOOK_ID_REC + [("personid", "long", None, None)]
SIMPLE_PERSON_BOOK_REC = [
    ("surname", "string", 20, None),
    ("forename", "string", 10, None),
    ("dob", "decimal(8,0)", None, None),
    ("limit", "struct<booklimit: decimal(8,0)>", None, None),
    ("aage", "long", None, None),
    ("books", "array<struct<id: long, name: string, author: string, "
     "rating100: long, price: decimal(8,2)>>", None,
     ("__child__", BOOK_ID_REC)),
    _FILEPOS,
]


@lru_cache(maxsize=None)
def _sq_raw() -> list[dict]:
    """Parse the rawHouse inline-dataset literal out of
    setup/setupsq.ecl (the suite's fixture rows, read at runtime) into
    [{addr, postcode, yearBuilt, persons: [{forename, surname, dob,
    booklimit, books: [{name, author, rating100, price}]}]}]."""
    text = _read("setupsq.ecl")
    m = re.search(r"rawHouse\s*:=\s*dataset\(\s*\[", text)
    start = text.index("[", m.end() - 1)
    depth = 0
    i = start
    while True:
        c = text[i]
        if c == "'":  # skip string literal (may hold brackets/commas)
            i += 1
            while text[i] != "'":
                i += 2 if text[i] == "\\" else 1
        elif c == "[":
            depth += 1
        elif c == "]":
            depth -= 1
            if depth == 0:
                break
        i += 1
    body = text[start : i + 1]

    pos = 0

    def skip_ws():
        nonlocal pos
        while pos < len(body) and body[pos] in " \t\r\n,":
            pos += 1

    def parse_value():
        nonlocal pos
        skip_ws()
        c = body[pos]
        if c == "{":
            pos += 1
            items = []
            while True:
                skip_ws()
                if body[pos] == "}":
                    pos += 1
                    return items
                items.append(parse_value())
        if c == "[":
            pos += 1
            items = []
            while True:
                skip_ws()
                if body[pos] == "]":
                    pos += 1
                    return items
                items.append(parse_value())
        if c == "'":
            pos += 1
            out = []
            while body[pos] != "'":
                if body[pos] == "\\":
                    pos += 1
                out.append(body[pos])
                pos += 1
            pos += 1
            return "".join(out)
        m2 = re.match(r"-?\d+\.\d+|-?\d+", body[pos:])
        pos += m2.end()
        t = m2.group()
        return float(t) if "." in t else int(t)

    houses = parse_value()  # the outer [...] list
    out = []
    for h in houses:
        addr, postcode, year, persons = h
        ps = []
        for p in persons:
            fore, sur, dob, limit, _age, books = p
            bs = []
            for b in books:
                name, author, rating = b[0], b[1], b[2]
                price = b[3] if len(b) > 3 else 0
                bs.append(
                    {"name": name, "author": author, "rating100": rating,
                     "price": price}
                )
            ps.append(
                {"forename": fore, "surname": sur, "dob": dob,
                 "booklimit": limit, "books": bs}
            )
        out.append(
            {"addr": addr, "postcode": postcode, "yearbuilt": year,
             "persons": ps}
        )
    return out


_BASE_DATE = 20050101  # setupsq.ecl:26


def _sq_ids() -> list[dict]:
    """Assign house/person/book ids the way setupsq's normalize +
    DoAssignSeq pipeline does (setupsq.ecl:196-215): each level is
    flattened in parent order and numbered 1..N globally; aage :=
    (baseDate - dob)/10000 for dob < baseDate, >200 -> 99
    (setupsq.ecl:117-123)."""
    houses = [dict(h) for h in _sq_raw()]
    pid = 0
    bid = 0
    for hid, h in enumerate(houses, start=1):
        h["id"] = hid
        persons = []
        for p in h["persons"]:
            p = dict(p)
            pid += 1
            p["id"] = pid
            aage = (
                (_BASE_DATE - p["dob"]) // 10000
                if p["dob"] < _BASE_DATE
                else 0
            )
            p["aage"] = 99 if aage > 200 else aage
            persons.append(p)
        h["persons"] = persons
    for h in houses:
        for p in h["persons"]:
            books = []
            for b in p["books"]:
                b = dict(b)
                bid += 1
                b["id"] = bid
                books.append(b)
            p["books"] = books
    return houses


from decimal import Decimal as _D


def _dec(v, scale: int) -> _D:
    return _D(str(v)).quantize(_D(1).scaleb(-scale))


def _sq_house_person_book(spark):
    """HousePersonBookDs: the nested file as written (setupsq.ecl:259)."""
    rows = []
    n = 0
    for h in _sq_ids():
        persons = []
        for p in h["persons"]:
            books = [
                (b["id"], b["name"], b["author"], b["rating100"],
                 _dec(b["price"], 2))
                for b in p["books"]
            ]
            persons.append(
                (p["id"], p["forename"], p["surname"], _dec(p["dob"], 0),
                 _dec(p["booklimit"], 0), p["aage"], books)
            )
        rows.append(
            (h["id"], h["addr"], h["postcode"].ljust(10), h["yearbuilt"],
             persons, n)
        )
        n += 1
    return spark.createDataFrame(
        rows,
        "id long, addr string, postcode string, yearbuilt long, "
        "persons array<struct<id: long, forename: string, surname: string,"
        " dob: decimal(8,0), booklimit: decimal(8,0), aage: long, "
        "books: array<struct<id: long, name: string, author: string, "
        "rating100: long, price: decimal(8,2)>>>>, filepos long",
    ).coalesce(1)


def _sq_person_book(spark):
    """PersonBookDs: one row per person, books nested, houseid link
    (setupsq.ecl:251-252,260)."""
    rows = []
    for h in _sq_ids():
        for p in h["persons"]:
            books = [
                (b["id"], b["name"], b["author"], b["rating100"],
                 _dec(b["price"], 2))
                for b in p["books"]
            ]
            rows.append(
                (p["id"], p["forename"], p["surname"], _dec(p["dob"], 0),
                 _dec(p["booklimit"], 0), p["aage"], books, h["id"],
                 len(rows) + 1)
            )
    return spark.createDataFrame(
        rows,
        "id long, forename string, surname string, dob decimal(8,0), "
        "booklimit decimal(8,0), aage long, "
        "books array<struct<id: long, name: string, author: string, "
        "rating100: long, price: decimal(8,2)>>, houseid long, "
        "__ord__ long",
    ).coalesce(1)


def _sq_house(spark):
    # virtual(fileposition): byte offset in the stored variable-width
    # layout — unsigned4 id + (4+len) addr + string10 postcode +
    # unsigned2 yearbuilt = 20 + len(addr) per row (sqfilt_keyed pins
    # 0/36/73/100)
    rows = []
    pos = 0
    for h in _sq_ids():
        rows.append(
            (h["id"], h["addr"], h["postcode"].ljust(10), h["yearbuilt"], pos)
        )
        pos += 20 + len(h["addr"])
    return spark.createDataFrame(
        rows,
        "id long, addr string, postcode string, yearbuilt long, "
        "filepos long",
    ).coalesce(1)


def _sq_person(spark):
    rows = []
    for h in _sq_ids():
        for p in h["persons"]:
            rows.append(
                (p["id"], p["forename"], p["surname"], _dec(p["dob"], 0),
                 _dec(p["booklimit"], 0), p["aage"], h["id"])
            )
    return spark.createDataFrame(
        rows,
        "id long, forename string, surname string, dob decimal(8,0), "
        "booklimit decimal(8,0), aage long, houseid long",
    ).coalesce(1)


def _sq_book(spark):
    rows = []
    for h in _sq_ids():
        for p in h["persons"]:
            for b in p["books"]:
                rows.append(
                    (b["id"], b["name"], b["author"], b["rating100"],
                     _dec(b["price"], 2), p["id"])
                )
    return spark.createDataFrame(
        rows,
        "id long, name string, author string, rating100 long, "
        "price decimal(8,2), personid long",
    ).coalesce(1)


def _sq_simple_person_book(spark):
    """SimplePersonBookDs (setupsq.ecl:256-266): person rows with
    fixed-width names, the booklimit nested as limit.booklimit."""
    rows = []
    pos = 0
    for h in _sq_ids():
        for p in h["persons"]:
            books = [
                (b["id"], b["name"], b["author"], b["rating100"],
                 _dec(b["price"], 2))
                for b in p["books"]
            ]
            rows.append(
                (p["surname"].ljust(20), p["forename"].ljust(10),
                 _dec(p["dob"], 0), (_dec(p["booklimit"], 0),), p["aage"],
                 books, pos)
            )
            # variable record size (fetch2 pins the offsets): 20+10+4
            # (udecimal8) + 4 (blob NestedBlob) + 1 (unsigned1) + 4-byte
            # child count + per book 4(id)+4+len(name)+4+len(author)+
            # 1(rating)+4(price)
            pos += 43 + sum(
                17 + len(b["name"]) + len(b["author"]) for b in p["books"]
            )
    return spark.createDataFrame(
        rows,
        "surname string, forename string, dob decimal(8,0), "
        "limit struct<booklimit: decimal(8,0)>, aage long, "
        "books array<struct<id: long, name: string, author: string, "
        "rating100: long, price: decimal(8,2)>>, filepos long",
    ).coalesce(1)


def _sq_book_author_grouped(spark):
    from pyspark.sql import functions as F

    return _sq_book(spark).orderBy("author", "id").coalesce(1)


def sq_members(multi_part: bool = False) -> dict:
    """The setup.sq(...) module surface (setup/sq.ecl:122-216)."""
    prefix = "~regress::" + ("multi" if multi_part else "single") + "::"
    m: dict[str, tuple] = {
        "housepersonbookname": ("const", prefix + "housepersonbook", "string"),
        "personbookname": ("const", prefix + "personbook", "string"),
        "housename": ("const", prefix + "house", "string"),
        "personname": ("const", prefix + "person", "string"),
        "bookname": ("const", prefix + "book", "string"),
        "simplepersonbookname": (
            "const", prefix + "simplepersonbook", "string",
        ),
        "houserec": ("record", HOUSE_ID_REC[1:]),
        "personrec": ("record", PERSON_RELATED_ID_REC[1:-1]),
        "bookrec": ("record", BOOK_ID_REC[1:]),
        "houseidrec": ("record", HOUSE_ID_REC),
        "personidrec": (
            "record", PERSON_RELATED_ID_REC[:-1],
        ),
        "bookidrec": ("record", BOOK_ID_REC),
        "personrelatedidrec": ("record", PERSON_RELATED_ID_REC),
        "bookrelatedidrec": ("record", BOOK_RELATED_ID_REC),
        "personbookidrec": ("record", PERSON_BOOK_ID_REC),
        "housepersonbookidrec": ("record", HOUSE_PERSON_BOOK_ID_REC),
        "personbookrelatedidrec": ("record", PERSON_BOOK_RELATED_ID_REC),
        "simplepersonbookrec": ("record", SIMPLE_PERSON_BOOK_REC),
        "housepersonbookds": (
            "dataset", _sq_house_person_book,
            HOUSE_PERSON_BOOK_ID_REC + [_FILEPOS],
        ),
        "housepersonbookexds": (
            "dataset", _sq_house_person_book,
            HOUSE_PERSON_BOOK_ID_REC + [_FILEPOS],
        ),
        "personbookds": (
            "dataset", _sq_person_book, PERSON_BOOK_RELATED_ID_REC,
        ),
        "personbookexds": (
            "dataset", _sq_person_book,
            PERSON_BOOK_RELATED_ID_REC + [_FILEPOS],
        ),
        "houseds": ("dataset", _sq_house, HOUSE_ID_REC + [_FILEPOS]),
        "houseexds": ("dataset", _sq_house, HOUSE_ID_REC + [_FILEPOS]),
        "personds": ("dataset", _sq_person, PERSON_RELATED_ID_REC),
        "personexds": (
            "dataset", _sq_person, PERSON_RELATED_ID_REC + [_FILEPOS],
        ),
        "bookds": ("dataset", _sq_book, BOOK_RELATED_ID_REC),
        "bookexds": (
            "dataset", _sq_book, BOOK_RELATED_ID_REC + [_FILEPOS],
        ),
        "bookauthorgroupedds": (
            "dataset", _sq_book_author_grouped, BOOK_RELATED_ID_REC,
        ),
        "simplepersonbookds": (
            "dataset", _sq_simple_person_book, SIMPLE_PERSON_BOOK_REC,
        ),
        "namestable1": (
            "dataset", _sq_simple_person_book, SIMPLE_PERSON_BOOK_REC,
        ),
        "simplepersonbookindex": (
            "dataset", _sq_simple_index, SIMPLE_PERSON_BOOK_REC,
        ),
        "namesindex1": (
            "dataset", _sq_simple_index, SIMPLE_PERSON_BOOK_REC,
        ),
    }
    return m


def _sq_simple_index(spark):
    """SimplePersonBookIndex: surname/forename/aage key order
    (sq.ecl:205) — an index read returns key order (__ord__ carries
    it for first-of-group TABLE members, indexAggregate)."""
    df = (
        _sq_simple_person_book(spark)
        .orderBy("surname", "forename", "aage")
        .coalesce(1)
    )
    return df.withColumn(
        "__ord__",
        F.row_number().over(
            Window.orderBy("surname", "forename", "aage")
        ).cast("long"),
    ).coalesce(1)


# --------------------------------------------------------------------------
# SerialTest fixture (setup/serialtest.ecl module; data generated by
# setup/setupdict.ecl:20-46 — a tiny two-owner library with nested books
# and grand-child words)
# --------------------------------------------------------------------------

WORD_REC = [("word", "string", None, None)]
BOOK_DS_REC = [
    ("title", "string", None, None),
    (
        "words", "array<struct<word: string>>", None,
        ("__child__", WORD_REC),
    ),
]
LIBRARY_DS_REC = [
    ("owner", "string", None, None),
    (
        "books",
        "array<struct<title: string, words: array<struct<word: string>>>>",
        None,
        ("__child__", BOOK_DS_REC),
    ),
]
BOOK_KEY_REC = [
    ("title", "string", 20, None),
    (
        "words", "array<struct<word: string>>", None,
        ("__child__", WORD_REC),
    ),
    # the index's implicit fileposition payload renders as
    # __internal_fpos__ = 0 (serial5a key)
    ("__internal_fpos__", "long", None, None),
]

_LIBRARY_ROWS = [
    (
        "gavin",
        [
            ("the hobbit", [("gandalf",), ("rivendell",), ("dragon",),
                            ("dwarves",), ("elves",)]),
            ("eragon", [("eragon",), ("dragon",), ("spine",), ("elves",),
                        ("dwarves",), ("krull",)]),
        ],
    ),
    (
        "jim",
        [
            ("complete diy", [("heating",), ("electrics",),
                              ("nuclear reactors",), ("spaceships",)]),
            ("cheeses", [("cheddar",), ("parmesan",), ("stilton",),
                         ("wensleydale",)]),
        ],
    ),
]


def _serial_library(spark):
    rows = [r + (i + 1,) for i, r in enumerate(_LIBRARY_ROWS)]
    return spark.createDataFrame(
        rows,
        "owner string, books array<struct<title: string, "
        "words: array<struct<word: string>>>>, __ord__ long",
    ).coalesce(1)


def _serial_library_dict(spark):
    """The DICTIONARY-serialized twin: child/grand-child entries land
    in the reference's hash-table slot order (RtlLinkedDictionaryBuilder
    linear probing — eclfront._refdict_order; serial4b's key pins
    eragon before the hobbit, words probe-scrambled)."""
    from .eclfront import _refdict_order

    rows = []
    for i, (owner, books) in enumerate(_LIBRARY_ROWS):
        bd = [
            (title, list(_refdict_order(list(words), 1)))
            for (title, words) in _refdict_order(list(books), 1)
        ]
        rows.append((owner, bd, i + 1))
    return spark.createDataFrame(
        rows,
        "owner string, books array<struct<title: string, "
        "words: array<struct<word: string>>>>, __ord__ long",
    ).coalesce(1)


def _serial_book_index(spark):
    """bookIndex (serialtest.ecl:40): the flattened books keyed by
    string20 title — an index read returns key order, titles padded."""
    from pyspark.sql import functions as F

    df = _serial_library(spark)
    books = df.select(F.explode("books").alias("b")).select(
        F.rpad(F.col("b.title"), 20, " ").alias("title"),
        F.col("b.words").alias("words"),
        F.lit(0).cast("long").alias("__internal_fpos__"),
    )
    return (
        books.orderBy("title")
        .withColumn(
            "__ord__",
            F.row_number().over(__import__("pyspark").sql.window.Window.orderBy("title")),
        )
        .coalesce(1)
    )


def serialtest_members() -> dict:
    """The setup.SerialTest module surface (setup/serialtest.ecl):
    records, the nested library dataset (also bound as its logical
    file name), and the book index."""
    prefix = "~regress::multi::"
    return {
        "wordrec": ("record", WORD_REC),
        "bookdsrec": ("record", BOOK_DS_REC),
        "librarydsrec": ("record", LIBRARY_DS_REC),
        "dsfilename": ("const", prefix + "seriallibraryds", "string"),
        "dictfilename": ("const", prefix + "seriallibrarydict", "string"),
        "bookkeyfilename": ("const", prefix + "serialbookkey", "string"),
        "librarydatasetfile": (
            "dataset", _serial_library, LIBRARY_DS_REC,
            prefix + "seriallibraryds",
        ),
        # the DICTIONARY-serialized twin holds the same logical content
        # with children in dictionary slot order (serial4b)
        "librarydictrec": ("record", LIBRARY_DS_REC),
        "bookdictrec": ("record", BOOK_DS_REC),
        "librarydictionaryfile": (
            "dataset", _serial_library_dict, LIBRARY_DS_REC,
            prefix + "seriallibrarydict",
        ),
        "bookindex": (
            "dataset", _serial_book_index, BOOK_KEY_REC,
            prefix + "serialbookkey",
        ),
    }


# --------------------------------------------------------------------------
# ts text-search fixture (setup/ts.ecl + setup/setuptext.ecl)
# --------------------------------------------------------------------------
# The word index the stepping/textsearch regress family reads
# (Setup.Files(...).getWordIndex(), files.ecl:209). setuptext.ecl's
# createSimpleIndex pipeline — tokenize inline documents, normalize
# sentence/paragraph markers into begin/end tags, assign word positions
# (wpos += previous wip), match open/close tags into span widths, then
# lowercase + case flags — re-implemented here as deterministic driver
# Python over the ~100 inline documents (the document text and alias
# rows are read from the reference file at run time, nothing vendored).
# textSearchIndex layout: keys {kind, word, doc, segment, wpos, wip},
# payload {flags, original, dpos} (setup/ts.ecl:57).

TS_WORDINDEX_REC = [
    ("kind", "long", None, None),
    ("word", "string", 20, None),
    ("doc", "long", None, None),
    ("segment", "long", None, None),
    ("wpos", "long", None, None),
    ("wip", "long", None, None),
    ("flags", "long", None, None),
    ("original", "string", 20, None),
    ("dpos", "long", None, None),
]

# kindType (setup/ts.ecl:33): UnknownEntry=0, TextEntry, OpenTagEntry,
# CloseTagEntry, OpenCloseTagEntry, CloseOpenTagEntry
_TS_TEXT, _TS_OPEN, _TS_CLOSE, _TS_OPENCLOSE, _TS_CLOSEOPEN = 1, 2, 3, 4, 5

_TS_WORD_RX = re.compile(r"[A-Za-z][A-Za-z0-9]*")
_TS_TAG_RX = re.compile(r"[A-Za-z][A-Za-z0-9_]*")
_TS_VERSE_RX = re.compile(r"\{[0-9]+:[0-9]+\}")


def _ecl_literal_rows(body: str) -> list[list]:
    """Rows of an ECL inline-dataset literal: {num, num, 'str' + 'str'}
    with //-comments, hex numbers and \\'-style escapes."""
    toks: list[tuple] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == "/" and body[i:i + 2] == "//":
            j = body.find("\n", i)
            i = n if j < 0 else j
        elif c in " \t\r\n":
            i += 1
        elif c == "'":
            j = i + 1
            buf = []
            while body[j] != "'":
                if body[j] == "\\":
                    e = body[j + 1]
                    buf.append(
                        {"n": "\n", "r": "\r", "t": "\t"}.get(e, e)
                    )
                    j += 2
                else:
                    buf.append(body[j])
                    j += 1
            toks.append(("str", "".join(buf)))
            i = j + 1
        elif c in "{},+":
            toks.append((c, c))
            i += 1
        elif body[i:i + 2] in ("0x", "0X"):
            j = i + 2
            while j < n and body[j] in "0123456789abcdefABCDEF":
                j += 1
            toks.append(("num", int(body[i:j], 16)))
            i = j
        elif c.isdigit():
            j = i
            while j < n and body[j].isdigit():
                j += 1
            toks.append(("num", int(body[i:j])))
            i = j
        else:
            i += 1
    rows: list[list] = []
    k = 0
    while k < len(toks):
        if toks[k][0] != "{":
            k += 1
            continue
        k += 1
        cells: list = []
        cur = None
        while toks[k][0] != "}":
            kind, val = toks[k]
            if kind == ",":
                cells.append(cur)
                cur = None
            elif kind == "str":
                cur = (cur or "") + val
            elif kind == "num":
                cur = val
            k += 1
        cells.append(cur)
        rows.append(cells)
        k += 1
    return rows


@lru_cache(maxsize=None)
def _ts_source_rows():
    """(documents, aliases) from setuptext.ecl's inline datasets."""
    text = _read("setuptext.ecl")
    m = re.search(
        r"inputDocuments := dataset\(\[(.*?)\], inputDocumentRecord\);",
        text, re.S,
    )
    docs = [
        (r[0], r[1], r[2] or "") for r in _ecl_literal_rows(m.group(1))
    ]
    m2 = re.search(
        r"inputAliases := dataset\(\[(.*?)\], inputAliasRecord\);",
        text, re.S,
    )
    aliases = _ecl_literal_rows(m2.group(1))
    return docs, aliases


def _ts_match_token(s: str, j: int):
    """matchPattern := patWord | sentenceTerminator | anyTag
    (setuptext.ecl:90-103). Returns (kind, original, end) or None."""
    c = s[j]
    m = _TS_WORD_RX.match(s, j)
    if m:
        return (_TS_TEXT, m.group(0), m.end())
    if c in ".?":
        return (_TS_CLOSEOPEN, "s", j + 1)
    if c == "<":
        k = j + 1
        if k < len(s) and s[k] == "/":
            mt = _TS_TAG_RX.match(s, k + 1)
            if mt:
                e = mt.end()
                while e < len(s) and s[e] in " \t":
                    e += 1
                if e < len(s) and s[e] == ">":
                    return (_TS_CLOSE, mt.group(0), e + 1)
            return None
        mt = _TS_TAG_RX.match(s, k)
        if mt:
            e = mt.end()
            while e < len(s) and s[e] in " \t":
                e += 1
            if e < len(s) and s[e] == ">":
                return (_TS_OPEN, mt.group(0), e + 1)
            if e + 1 < len(s) and s[e] == "/" and s[e + 1] == ">":
                return (_TS_OPENCLOSE, mt.group(0), e + 2)
    return None


def _ts_scan_line(line: str, base: int, out: list) -> None:
    """PARSE(splitFile, text, skipChars* matchPattern, FIRST, SCAN):
    emit (kind, original, dpos 1-based, wip); scan resumes after each
    match, advances one char on failure."""
    i, n = 0, len(line)
    while i < n:
        j = i
        while j < n:
            if line[j] in " \t,;:()":
                j += 1
                continue
            mv = _TS_VERSE_RX.match(line, j)
            if mv:
                j = mv.end()
                continue
            break
        tok = _ts_match_token(line, j) if j < n else None
        if tok is None:
            i += 1
            continue
        kind, original, end = tok
        wip = 0 if kind in (_TS_OPEN, _TS_CLOSE, _TS_OPENCLOSE) else 1
        out.append([kind, original, base + j + 1, wip])
        i = end


def _ts_kind_order(kind: int, wip: int, tag: str) -> int:
    """wordKindSortOrder (setuptext.ecl:85-90): open/wip0 tags, closes,
    then p/s/other span opens, then everything else."""
    if kind == _TS_OPEN and wip == 0:
        return 1
    if kind == _TS_CLOSE:
        return 2
    if kind == _TS_OPEN:
        return 100 + {"p": 1, "s": 2}.get(tag, 3)
    return 1000


def _ts_invert_doc(text: str) -> list[list]:
    """One document's inversion rows [kind, original, dpos, wip, wpos,
    seq] after marker normalization, wpos assignment and open/close tag
    matching (setuptext.ecl convertDocumentToInversion)."""
    raw: list[list] = []
    base = 0
    for line in text.split("\n"):
        if line.strip(" \t") == "":
            raw.append([_TS_CLOSEOPEN, "p", base + 1, 1])
        else:
            _ts_scan_line(line, base, raw)
        base += len(line) + 1
    maxdpos = max((r[2] for r in raw), default=0)
    # five merged streams: implicit starts, marker opens, non-markers,
    # marker closes, implicit ends (processSentanceAndParagraphMarkers)
    s0 = [[_TS_OPEN, "p", 0, 1], [_TS_OPEN, "s", 0, 1]]
    s1 = [[_TS_OPEN, r[1], r[2], r[3]] for r in raw if r[0] == _TS_CLOSEOPEN]
    s2 = [r for r in raw if r[0] != _TS_CLOSEOPEN]
    s3 = [[_TS_CLOSE, r[1], r[2], 0] for r in raw if r[0] == _TS_CLOSEOPEN]
    s4 = [
        [_TS_CLOSE, "s", maxdpos + 1, 0],
        [_TS_CLOSE, "p", maxdpos + 1, 0],
    ]
    merged: list[tuple] = []
    for si, stream in enumerate([s0, s1, s2, s3, s4]):
        for wi, r in enumerate(stream):
            merged.append((r, si, wi))
    merged.sort(
        key=lambda t: (
            t[0][2], _ts_kind_order(t[0][0], t[0][3], t[0][1]), t[1], t[2],
        )
    )
    # assignWordPositions: wpos = prev wpos + prev wip, seq 1-based
    rows: list[list] = []
    wpos = 0
    for seq, (r, _si, _wi) in enumerate(merged, start=1):
        rows.append([r[0], r[1], r[2], r[3], wpos, seq])
        wpos += r[3]
    # matchOpenCloseTags: per-tag stack pairing; closes drop, opens take
    # wip = close.wpos - open.wpos; unmatched opens drop (inner join)
    opens = [r for r in rows if r[0] == _TS_OPEN]
    closes = [r for r in rows if r[0] == _TS_CLOSE]
    others = [r for r in rows if r[0] not in (_TS_OPEN, _TS_CLOSE)]
    bytag: dict[str, list] = {}
    for r in sorted(
        opens + closes,
        key=lambda r: (r[1], r[4], _ts_kind_order(r[0], r[3], r[1])),
    ):
        bytag.setdefault(r[1], []).append(r)
    open_wip: dict[int, int] = {}
    for rs in bytag.values():
        stack: list = []
        for r in rs:
            if r[0] == _TS_OPEN:
                stack.insert(0, r)
            elif stack:
                o = stack.pop(0)
                open_wip[o[5]] = r[4] - o[4]
    fixed = [
        [_TS_OPEN, r[1], r[2], open_wip[r[5]], r[4], r[5]]
        for r in opens
        if r[5] in open_wip
    ]
    final = sorted(
        [(r, 0, i) for i, r in enumerate(others)]
        + [(r, 1, i) for i, r in enumerate(fixed)],
        key=lambda t: (t[0][4], t[0][3], t[1], t[2]),
    )
    return [t[0] for t in final]


@lru_cache(maxsize=None)
def _ts_index_rows() -> tuple:
    """All word-index rows (kind, word20, doc, segment, wpos, wip,
    flags, original20, dpos) in BUILD key order."""
    docs, aliases = _ts_source_rows()
    out = []

    def add(kind, original, doc, wpos, wip, dpos):
        word = original.lower()
        flags = (2 if any(c.isupper() for c in original) else 0) + (
            1 if any(c.islower() for c in original) else 0
        )
        out.append(
            (
                kind, word.ljust(20), doc, 0, wpos, wip, flags,
                original.ljust(20), dpos,
            )
        )

    for src, sub, text in docs:
        docid = (src << 48) | sub
        for kind, original, dpos, wip, wpos, _seq in _ts_invert_doc(text):
            add(kind, original, docid, wpos, wip, dpos)
    for src, sub, word, wpos, wip in aliases:
        add(_TS_TEXT, word, (src << 48) | sub, wpos, wip, 0)
    out.sort(key=lambda r: (r[0], r[1], r[2], r[3], r[4], r[5]))
    return tuple(out)


def _ts_word_index(spark):
    rows = [
        r + (i + 1,) for i, r in enumerate(_ts_index_rows())
    ]
    return spark.createDataFrame(
        rows,
        "kind long, word string, doc long, segment long, wpos long, "
        "wip long, flags long, original string, dpos long, __ord__ long",
    ).coalesce(1)


TS_TEXTSOURCE_REC = TS_WORDINDEX_REC[:5]


def ts_members() -> dict:
    """setup/ts.ecl module surface: the kindType enum (ts.ecl:33),
    search limits (:23-31), the EXPORTed type aliases (:34-56), the
    docid composition helpers (:48-51) and the index records (:57-66)
    — everything the stepping framework imports via $.Setup.TS."""
    return {
        # type aliases (ts.ecl:34-56)
        "sourcetype": ("typealias", "unsigned2"),
        "wordcounttype": ("typealias", "unsigned8"),
        "segmenttype": ("typealias", "unsigned1"),
        "wordpostype": ("typealias", "unsigned8"),
        "docpostype": ("typealias", "unsigned8"),
        "documentid": ("typealias", "unsigned8"),
        "termtype": ("typealias", "unsigned1"),
        "distancetype": ("typealias", "integer8"),
        "indexwiptype": ("typealias", "unsigned1"),
        "wiptype": ("typealias", "unsigned8"),
        "stagetype": ("typealias", "unsigned1"),
        "datetype": ("typealias", "unsigned8"),
        "wordtype": ("typealias", "string20"),
        "wordflags": ("typealias", "unsigned1"),
        "wordidtype": ("typealias", "unsigned4"),
        "kindtype": ("typealias", "unsigned1"),
        # records (ts.ecl:57-66)
        "wordindexrecord": ("record", TS_WORDINDEX_REC),
        "textsourcerecord": ("record", TS_TEXTSOURCE_REC),
        # the index definition itself (ts.ecl:57): INDEX(i, name)
        # re-binds it to the built word-index fixture
        "textsearchindex": ("dataset", _ts_word_index, TS_WORDINDEX_REC),
        # docid composition (ts.ecl:48-51)
        "docid2source": (
            "func", [("x", "unsigned8")], "(x >> 48)", "unsigned2",
        ),
        "docid2doc": (
            "func", [("x", "unsigned8")],
            "(x & 0xFFFFFFFFFFFF)", "unsigned8",
        ),
        "createdocid": (
            "func", [("source", "unsigned2"), ("doc", "unsigned8")],
            "((source << 48) | doc)", "unsigned8",
        ),
        "docmatchessource": (
            "func", [("docid", "unsigned8"), ("source", "unsigned2")],
            "(docid BETWEEN (source << 48) AND"
            " (((source + 1) << 48) - 1))",
            "boolean",
        ),
        "unknownentry": ("const", 0, "integer"),
        "textentry": ("const", 1, "integer"),
        "opentagentry": ("const", 2, "integer"),
        "closetagentry": ("const", 3, "integer"),
        "openclosetagentry": ("const", 4, "integer"),
        "closeopentagentry": ("const", 5, "integer"),
        "maxterms": ("const", 50, "integer"),
        "maxstages": ("const", 50, "integer"),
        "maxproximity": ("const", 10, "integer"),
        "maxwildcard": ("const", 1000, "integer"),
        "maxmatchperdocument": ("const", 1000, "integer"),
        "maxfilenamelength": ("const", 255, "integer"),
        "maxactions": ("const", 255, "integer"),
        "maxtagnesting": ("const", 40, "integer"),
        "maxcolumnsperline": ("const", 10000, "integer"),
        "haslower": ("const", 1, "integer"),
        "hasupper": ("const", 2, "integer"),
    }


def textsearch_members() -> dict:
    """common/TextSearch.ecl surface used by the regress corpus: the
    word-index accessor (TextSearch.ecl getWordIndex wraps
    Setup.Files(...).getWordIndex(); arguments pick storage variants
    with identical logical content) and the batch-query executor
    (operators/tsquery.py — textsearch1-3)."""
    return {
        "getwordindex": ("dsfunc", _ts_word_index, TS_WORDINDEX_REC),
        "executebatchagainstwordindex": ("dsbatch", ts_batch_execute),
        "dobatchexecute": ("dsbatch", ts_batch_execute),
    }


@lru_cache(maxsize=None)
def _ts_wordtests() -> tuple:
    """The WordTests query battery, parsed at runtime from
    common/TextSearchQueries.ecl:31-369 (nothing vendored): every
    single-quoted literal in the dataset body, comment lines
    stripped."""
    with open(
        "/root/reference/testing/regress/ecl/common/TextSearchQueries.ecl"
    ) as f:
        text = f.read()
    m = re.search(
        r"WordTests := dataset\(\[(.*?)\]\s*,\s*TextSearch\."
        r"queryInputRecord\)",
        text,
        re.S,
    )
    body = re.sub(r"//[^\n]*", "", m.group(1))
    return tuple(re.findall(r"'([^']*)'", body))


def _ts_wordtests_df(spark):
    rows = [(q, i + 1) for i, q in enumerate(_ts_wordtests())]
    return spark.createDataFrame(
        rows, "query string, __ord__ long"
    ).coalesce(1)


def ts_batch_execute(spark, queries_df):
    """TextSearch.executeBatchAgainstWordIndex /
    project(q, doBatchExecute(wordIndex, LEFT, ...)) — one output row
    per query, computed executor-side (operators/tsquery.py). The
    useLocal/multiPart/internalFlags arguments pick execution variants
    with identical results (all four textsearch key files are
    byte-identical)."""
    from hpcc_platform_spark.operators import tsquery

    return tsquery.batch_execute_df(queries_df, _ts_index_rows())


def textsearchqueries_members() -> dict:
    """common/TextSearchQueries.ecl: the WordTests battery."""
    return {
        "wordtests": (
            "dataset", _ts_wordtests_df,
            [("query", "string", 2048, None)],
        ),
    }
