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


def pipe_through(
    df: DataFrame,
    command: list[str],
    output_schema: str,
) -> DataFrame:
    """PIPE(ds, command): feed each partition's rows as CSV to ``command``'s
    stdin, parse its stdout as CSV rows of ``output_schema``.

    The subprocess spawns once per partition. Framing is CSV (the
    reference's default; its XML framing would swap the ser/de here).
    ``output_schema`` is parsed with Spark's own DDL parser (driver-side),
    so nested/parameterized types — ``decimal(10,2)``, ``array<int>`` —
    resolve correctly; the old naive comma split broke on them.
    """
    struct = StructType.fromDDL(output_schema)
    out_cols = struct.fieldNames()
    # Arrow refuses unsafe int/float -> decimal conversion; route declared
    # decimal columns through Python Decimal after CSV parse.
    decimal_cols = [f.name for f in struct.fields if f.dataType.typeName() == "decimal"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proc = subprocess.Popen(
            command, stdin=subprocess.PIPE, stdout=subprocess.PIPE
        )
        feed_error: list[BaseException] = []

        def feed() -> None:
            try:
                for pdf in batches:
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
            reader = pd.read_csv(
                proc.stdout, header=None, names=out_cols, chunksize=_CHUNK_ROWS
            )
            for chunk in reader:
                for c in decimal_cols:
                    chunk[c] = chunk[c].map(
                        lambda v: None if pd.isna(v) else Decimal(str(v))
                    )
                yield chunk
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
