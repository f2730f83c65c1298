"""PIPE read/through/write (SURVEY.md §2.1): stream rows through an
external process per partition (TAKpiperead :919, TAKpipethrough :922,
TAKpipewrite :920; thorlcr/activities/piperead/).

Spark-first form: ``mapInPandas`` + subprocess with CSV framing — one
process per partition (matching the reference's one-per-node), Arrow
batches in/out, no driver involvement.
"""

from __future__ import annotations

import io
import subprocess
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def pipe_through(
    df: DataFrame,
    command: list[str],
    output_schema: str,
) -> DataFrame:
    """PIPE(ds, command): feed each partition's rows as CSV to ``command``'s
    stdin, parse its stdout as CSV rows of ``output_schema``.

    The subprocess spawns once per partition. Framing is CSV (the
    reference's default; its XML framing would swap the ser/de here).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = list(batches)
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        proc = subprocess.run(
            command,
            input=pdf.to_csv(index=False, header=False).encode(),
            stdout=subprocess.PIPE,
            check=True,
        )
        out_cols = [c.split()[0] for c in output_schema.split(",")]
        yield pd.read_csv(
            io.BytesIO(proc.stdout), header=None, names=out_cols
        )

    return df.mapInPandas(run, schema=output_schema)
