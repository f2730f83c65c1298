"""PIPE read/through/write (SURVEY.md §2.1): stream rows through an
external process per partition (TAKpiperead :919, TAKpipethrough :922,
TAKpipewrite :920; thorlcr/activities/piperead/).

Spark-first form: ``mapInPandas`` + subprocess with CSV framing — one
process per partition (matching the reference's one-per-node), Arrow
batches in/out, no driver involvement. The partition STREAMS through the
process: a writer thread feeds stdin batch by batch while the main thread
reads stdout incrementally, so a partition larger than memory never
materializes on either side of the pipe (the reference's own pumper-thread
design in thorlcr/activities/piperead/thprslave.cpp).
"""

from __future__ import annotations

import subprocess
import threading
from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

_CHUNK_ROWS = 10_000


def _coerce_chunk(chunk: pd.DataFrame, struct: StructType) -> pd.DataFrame:
    """Post-parse type coercion shared by both framings. Arrow refuses
    unsafe int/float -> decimal conversion (route declared decimals
    through Python Decimal) and won't parse temporal columns from text."""
    for f in struct.fields:
        t = f.dataType.typeName()
        if t == "decimal":
            chunk[f.name] = chunk[f.name].map(
                lambda v: None if pd.isna(v) else Decimal(str(v))
            )
        elif t in ("timestamp", "timestamp_ntz"):
            chunk[f.name] = pd.to_datetime(chunk[f.name])
        elif t == "date":
            chunk[f.name] = pd.to_datetime(chunk[f.name]).dt.date
    return chunk


def _xml_rows(pdf: pd.DataFrame, row_tag: str) -> bytes:
    """Serialize a pandas batch as reference-style XML rows:
    <Row><field>value</field>...</Row> per record, NULL fields omitted
    (the reference's OUTPUT(..., XML) convention)."""
    from xml.sax.saxutils import escape

    parts: list[str] = []
    cols = list(pdf.columns)
    for tup in pdf.itertuples(index=False):
        # General NULL test: pd.isna catches None/NaN/NaT/pd.NA (which
        # would otherwise serialize as literal 'NaT'/'<NA>' text); the
        # is_scalar guard keeps array/struct values out of pd.isna.
        fields = "".join(
            f"<{c}>{escape(str(v))}</{c}>"
            for c, v in zip(cols, tup)
            if not (v is None or (pd.api.types.is_scalar(v) and pd.isna(v)))
        )
        parts.append(f"<{row_tag}>{fields}</{row_tag}>")
    return ("".join(parts) + "\n").encode()


def _parse_xml_stream(
    stdout, struct: StructType, row_tag: str
) -> Iterator[pd.DataFrame]:
    """Incremental XML row parse over the process's stdout: iterparse fires
    per closed element, so a huge output never materializes; rows batch
    into _CHUNK_ROWS frames. Missing elements -> NULL."""
    import itertools
    import xml.etree.ElementTree as ET

    cols = struct.fieldNames()
    # A present-but-empty element is an empty STRING, not NULL (NULL
    # fields are omitted at write time); ElementTree reports both as
    # text=None, so restore '' for string-typed fields.
    str_cols = {f.name for f in struct.fields if f.dataType.typeName() == "string"}
    # iterparse needs one root element; the pipe emits bare rows, so wrap
    # the byte stream in a synthetic <__ds__> root without buffering it.
    wrapped = itertools.chain([b"<__ds__>"], iter(lambda: stdout.read(65536), b""), [b"</__ds__>"])

    class _Stream:
        def __init__(self, it):
            self._it = it

        def read(self, _n=-1):
            return next(self._it, b"")

    rows: list[dict] = []
    root = None
    for ev, elem in ET.iterparse(_Stream(wrapped), events=("start", "end")):
        if ev == "start":
            if root is None:
                root = elem
            continue
        if elem.tag != row_tag:
            continue
        rows.append(
            {c: None for c in cols}
            | {
                ch.tag: (
                    ch.text
                    if ch.text is not None
                    else ("" if ch.tag in str_cols else None)
                )
                for ch in elem
            }
        )
        # Drop processed rows from the synthetic root so the tree stays O(1).
        root.clear()
        if len(rows) >= _CHUNK_ROWS:
            yield pd.DataFrame(rows, columns=cols)
            rows = []
    if rows:
        yield pd.DataFrame(rows, columns=cols)


def pipe_through(
    df: DataFrame,
    command: list[str],
    output_schema: str,
    framing: str = "csv",
    row_tag: str = "Row",
) -> DataFrame:
    """PIPE(ds, command): feed each partition's rows to ``command``'s stdin,
    parse its stdout as rows of ``output_schema``.

    The subprocess spawns once per partition. ``framing`` selects the
    ser/de on BOTH sides of the pipe, matching the reference's CSV and XML
    helper pair (thorlcr/activities/piperead/thprslave.cpp; eclhelper.hpp
    ICsvToRowTransformer/IXmlToRowTransformer): ``'csv'`` (default) or
    ``'xml'`` — one ``<Row>...</Row>`` element per record (``row_tag``
    configurable), entity-escaped, NULL fields omitted on write and read
    back as NULL. ``output_schema`` is parsed with Spark's own DDL parser
    (driver-side), so nested/parameterized types — ``decimal(10,2)``,
    ``array<int>`` — resolve correctly; the old naive comma split broke on
    them.
    """
    if framing not in ("csv", "xml"):
        raise ValueError(f"pipe_through framing must be 'csv' or 'xml', got {framing!r}")
    struct = StructType.fromDDL(output_schema)
    out_cols = struct.fieldNames()
    # Numeric columns parsed from XML text need an explicit cast for Arrow.
    numeric_casts = {
        f.name: {"integer": "Int32", "long": "Int64", "short": "Int16",
                 "byte": "Int8", "double": "float64", "float": "float32"}[
            f.dataType.typeName()
        ]
        for f in struct.fields
        if f.dataType.typeName()
        in ("integer", "long", "short", "byte", "double", "float")
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            command, stdin=subprocess.PIPE, stdout=subprocess.PIPE
        )
        feed_error: list[BaseException] = []

        def feed() -> None:
            try:
                for pdf in batches:
                    if framing == "xml":
                        proc.stdin.write(_xml_rows(pdf, row_tag))
                    else:
                        proc.stdin.write(
                            pdf.to_csv(index=False, header=False).encode()
                        )
            except BaseException as e:  # surfaced after reader drains
                feed_error.append(e)
            finally:
                proc.stdin.close()

        writer = threading.Thread(target=feed, daemon=True)
        writer.start()
        try:
            if framing == "xml":
                for chunk in _parse_xml_stream(proc.stdout, struct, row_tag):
                    for c, dt in numeric_casts.items():
                        chunk[c] = pd.to_numeric(chunk[c]).astype(dt)
                    yield _coerce_chunk(chunk, struct)
            else:
                reader = pd.read_csv(
                    proc.stdout, header=None, names=out_cols, chunksize=_CHUNK_ROWS
                )
                for chunk in reader:
                    yield _coerce_chunk(chunk, struct)
        except pd.errors.EmptyDataError:
            pass  # empty partition / no output rows
        finally:
            writer.join()
            rc = proc.wait()
        if feed_error:
            raise feed_error[0]
        if rc != 0:
            raise RuntimeError(f"PIPE command {command!r} exited with {rc}")

    return df.mapInPandas(run, schema=output_schema)


def pipe_exec(
    df: DataFrame,
    command: str,
    out_schema: str,
    write_mode: str = "raw",
    read_mode: str = "raw",
    write_delim: str = "\n",
    read_delim: str = "\n",
    xml_read_path: str = "Row",
    xml_write_path: str = "Row",
    noroot_write: bool = False,
    repeat: bool = False,
    group: bool = False,
) -> DataFrame:
    """Front-door PIPE lowering with ASYMMETRIC framings (pipe.ecl's
    TYPE-framed lines, pipe2's csv/output(csv), pipe7's xml paths):
    one subprocess per partition (REPEAT: per row — TAKpipethrough's
    re-execute form), executor-side via mapInPandas, no driver data.
    ``raw`` framing writes a single string column delimiter-joined and
    splits stdout on the read delimiter (the mdstring TYPE pair)."""
    import csv as _csv
    import io
    import shlex
    import xml.etree.ElementTree as _ET

    struct0 = StructType.fromDDL(out_schema)
    out_cols = struct0.fieldNames()
    struct = struct0
    if group and repeat:
        # per-invocation GROUP key: each row's re-execution forms one
        # group (pipe6's REPEAT, GROUP — count(group) counts the rows
        # one subprocess emitted)
        from pyspark.sql.types import LongType, StructField

        struct = StructType(
            struct0.fields + [StructField("__pgrp__", LongType())]
        )
    in_cols = [c for c in df.columns if c != "__ord__"]
    argv = shlex.split(command)

    def _serialize(pdf: pd.DataFrame) -> bytes:
        if write_mode == "csv":
            buf = io.StringIO()
            w = _csv.writer(buf, lineterminator="\n")
            for row in pdf[in_cols].itertuples(index=False):
                w.writerow(list(row))
            return buf.getvalue().encode("utf-8")
        if write_mode == "xml":
            parts = []
            if not noroot_write:
                parts.append("<Dataset>\n")
            for row in pdf[in_cols].itertuples(index=False):
                cells = "".join(
                    f"<{c}>{_xml_esc(str(v))}</{c}>"
                    for c, v in zip(in_cols, row)
                )
                parts.append(f"<{xml_write_path}>{cells}</{xml_write_path}>\n")
            if not noroot_write:
                parts.append("</Dataset>\n")
            return "".join(parts).encode("utf-8")
        # raw: single string column, delimiter-terminated (TYPE store)
        return "".join(
            str(v) + write_delim for v in pdf[in_cols[0]]
        ).encode("utf-8")

    def _parse(out: bytes) -> pd.DataFrame:
        text = out.decode("utf-8", errors="replace")
        if read_mode == "csv":
            rows = [
                r for r in _csv.reader(io.StringIO(text))
            ]
            # asymmetric row widths: truncate long rows, pad short ones
            # with "" so ragged command output coerces to field defaults
            rows = [
                r[: len(out_cols)] + [""] * (len(out_cols) - len(r))
                for r in rows
                if r
            ]
        elif read_mode == "xml":
            rowtag = xml_read_path.rstrip("/").split("/")[-1]
            # tolerate a leading <?xml ...?> declaration (the reference's
            # streaming XML reader does)
            stripped = text.lstrip()
            if stripped.startswith("<?"):
                end = stripped.find("?>")
                if end != -1:
                    stripped = stripped[end + 2 :]
            wrapped = f"<__p__>{stripped}</__p__>"
            try:
                root = _ET.fromstring(wrapped)
            except _ET.ParseError as e:
                raise ValueError(
                    f"PIPE({argv!r}): cannot parse command XML output: {e}"
                ) from None
            rows = []
            for el in root.iter(rowtag):
                if len(el) == 0:
                    rows.append([el.text or ""])
                else:
                    byname = {c.tag: (c.text or "") for c in el}
                    rows.append(
                        [byname.get(c, el.text or "") for c in out_cols]
                    )
        else:
            parts = text.split(read_delim)
            if parts and parts[-1] == "":
                parts.pop()
            rows = [[p] for p in parts]
        pdf = pd.DataFrame(rows, columns=out_cols)
        return _coerce_chunk(pdf, struct0)

    def _xml_esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        pdf = pd.concat(chunks) if chunks else None
        if pdf is None or len(pdf) == 0:
            yield pd.DataFrame(columns=struct.fieldNames())
            return
        if repeat:
            outs = []
            for k in range(len(pdf)):
                proc = subprocess.run(
                    argv,
                    input=_serialize(pdf.iloc[k : k + 1]),
                    stdout=subprocess.PIPE,
                )
                chunk = _parse(proc.stdout)
                if group:
                    if "__ord__" in pdf.columns:
                        gid = int(pdf.iloc[k]["__ord__"])
                    else:
                        # partition-local k alone is NOT globally unique
                        # — rows in different partitions would silently
                        # merge groups; offset by the task's partition
                        # id (same 2^33 packing as the numbering ops)
                        from pyspark import TaskContext

                        ctx = TaskContext.get()
                        pid = ctx.partitionId() if ctx is not None else 0
                        gid = (pid << 33) + k
                    chunk = chunk.assign(__pgrp__=gid)
                outs.append(chunk)
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(columns=struct.fieldNames())
            )
            return
        proc = subprocess.run(
            argv, input=_serialize(pdf), stdout=subprocess.PIPE
        )
        yield _parse(proc.stdout)

    return df.mapInPandas(run, schema=struct)
