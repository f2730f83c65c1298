"""SOAPCALL / HTTPCALL (SURVEY.md §2.1): per-row or per-dataset calls to an
external service, responses parsed into rows.

Reference: TAKsoap_rowdataset :941-944, TAKhttp_rowdataset :1033;
common/thorhelper/thorsoapcall.cpp (WSCMode {SCrow, SCdataset}
thorsoapcall.hpp:66) with retry/timeout/throttling options.

Spark-first form: ``mapInPandas`` — each Arrow batch becomes one service
request (SCdataset) or one request per row (SCrow); executors fan the calls
out in parallel across partitions, which is exactly the reference's
one-client-per-node shape. The transport is injectable: production passes a
real HTTP callable (e.g. ``requests.post`` wrapper); tests and the query
registry pass a deterministic fake, so the dataflow (batching, retry,
schema, ordering) is exercised without the network.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# A transport takes a list of request dicts and returns a list of response
# dicts (same length/order for row-mode semantics).
Transport = Callable[[list[dict]], list[dict]]


def soapcall(
    df: DataFrame,
    transport: Transport,
    response_schema: str,
    batch_rows: int = 100,
    retries: int = 3,
    backoff_s: float = 0.0,
) -> DataFrame:
    """SOAPCALL(ds, service): call ``transport`` with batches of
    ``batch_rows`` request records; each response dict becomes one output
    row of ``response_schema``.

    Retry with (optional) exponential backoff per batch — the reference's
    RETRY/TIMEOUT options. Throttling = batch size × partition count; at
    scale, cap concurrency by coalescing the input to the number of
    permitted concurrent clients.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                reqs = chunk.to_dict("records")
                last_err: Exception | None = None
                for attempt in range(retries):
                    try:
                        resp = transport(reqs)
                        break
                    except Exception as e:  # noqa: BLE001 — retried, then re-raised
                        last_err = e
                        if backoff_s:
                            time.sleep(backoff_s * (2**attempt))
                else:
                    raise RuntimeError(
                        f"SOAPCALL failed after {retries} retries"
                    ) from last_err
                yield pd.DataFrame(resp)

    return df.mapInPandas(run, schema=response_schema)
