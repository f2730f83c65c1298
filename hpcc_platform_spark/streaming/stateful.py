"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming engine (SURVEY.md §2.13) — this is the
Spark-native superset: per-key state maintained across micro-batches with
timeout-based finalization. The running-aggregate shape mirrors ITERATE/
PROCESS (§2.2) lifted onto an unbounded stream: state = the RIGHT record,
each batch folds new rows into it.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    State is one (count, sum) pair per key — O(distinct keys), the
    streaming analogue of a partial aggregate that never finalizes. Emits
    the updated running totals for every key seen in each batch.
    """

    out_schema = f"{key_col} long, n_events long, total double"
    state_schema = "n long, s double"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "total": [round(s, 4)]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
