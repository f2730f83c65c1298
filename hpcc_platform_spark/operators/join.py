"""Join family (SURVEY.md §2.3).

Reference ground truth: join flags at rtl/include/eclhelper.hpp:1714-1746
(JFleftouter/JFrightouter/JFexclude → outer/only joins; ATMOST/LIMIT :1726,
1735; JFslidingmatch :1729 range conditions; JFsmart :1744). Physical
implementations the reference hand-rolls — global sort-merge
(thorlcr/activities/join/thjoinslave.cpp), hash-distributed
(thhashdistribslave.cpp), broadcast LOOKUP with in-memory failover
(thlookupjoinslave.cpp) — all collapse onto Catalyst's join selection + AQE:
SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin picked at plan or
runtime. We only encode *semantics* (match cardinality limits, only/exclude
forms); the physical strategy is Spark's.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ECL join-form → Spark how-string. LEFT ONLY (JFleftouter|JFexclude,
# eclhelper.hpp:1717) is Spark's left_anti; RIGHT ONLY mirrors it.
_HOW = {
    "inner": "inner",
    "left outer": "left",
    "right outer": "right",
    "full outer": "full",
    "left only": "left_anti",
    "left semi": "left_semi",
}


def join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """JOIN(l, r, cond[, form]) (TAKjoin :1042 / TAKhashjoin :1043).

    ``how`` accepts ECL forms ('left only', 'left outer', ...) or Spark names.
    'right only' is expressed by swapping sides to left_anti.
    """
    key = how.lower()
    if key == "right only":
        return right.join(left, on, "left_anti")
    return left.join(right, on, _HOW.get(key, key))


def lookup_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """JOIN(..., LOOKUP) (TAKlookupjoin :1044) — broadcast the RHS.

    The reference broadcasts the RHS to every node over a spanning tree
    (thlookupjoinslave.cpp:88-151 CBroadcaster) and hash-probes. Spark:
    ``broadcast()`` hint → BroadcastHashJoin (TorrentBroadcast). SMART join
    (TAKsmartjoin :1048), whose whole point is runtime failover to a
    partitioned join when the RHS doesn't fit, is Spark AQE's join demotion —
    use plain ``join`` with AQE on for that.
    """
    key = how.lower()
    if key == "right only":
        return right.join(F.broadcast(left), on, "left_anti")
    return left.join(F.broadcast(right), on, _HOW.get(key, key))


def all_join(
    left: DataFrame,
    right: DataFrame,
    cond: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """JOIN(..., ALL) (TAKalljoin :1047) — no equality portion, arbitrary
    theta condition against a broadcast RHS (BroadcastNestedLoopJoin).

    Only sane when the RHS is small — identical constraint to the reference
    (RHS is broadcast there too, Roxie ccdserver.cpp:19960).
    """
    if cond is None:
        return left.crossJoin(F.broadcast(right))
    return left.join(F.broadcast(right), cond, _HOW.get(how.lower(), how))


def self_join(
    df: DataFrame,
    on_keys: Sequence[str],
    cond: Column | None = None,
    how: str = "inner",
    left_alias: str = "l",
    right_alias: str = "r",
) -> DataFrame:
    """SELF JOIN (TAKselfjoin :1045) — join a dataset to itself.

    The reference sorts once and matches within key groups
    (thorlcr/activities/selfjoin/). Spark: alias both sides; the single
    shuffle-reuse is Catalyst's ReuseExchange. ``cond`` is an extra predicate
    over ``l``/``r`` aliases (e.g. exclude self-matches, JFnevermatchself).
    """
    lhs, rhs = df.alias(left_alias), df.alias(right_alias)
    eq = None
    for k in on_keys:
        c = F.col(f"{left_alias}.{k}") == F.col(f"{right_alias}.{k}")
        eq = c if eq is None else (eq & c)
    if cond is not None:
        eq = cond if eq is None else (eq & cond)
    return lhs.join(rhs, eq, _HOW.get(how.lower(), how))


def keyed_join(
    left: DataFrame,
    index: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """KEYED JOIN (TAKkeyedjoin :1046, IHThorKeyedJoinArg eclhelper.hpp:1870).

    The reference probes a B+tree index per LHS row, then optionally fetches
    the base file by fileposition (thkeyedjoinslave.cpp). Spark's model: the
    index IS a (sorted/partitioned) table — an equi-join, with dynamic
    partition pruning / broadcast standing in for per-row probes. The
    'fetch' step (TAKfetch :926) is a second join on the surrogate row id.
    """
    return join(left, index, on, how)


def join_atmost(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    atmost: int,
    keep_unmatched: bool = True,
) -> DataFrame:
    """JOIN(..., ATMOST(n)) (eclhelper.hpp:1726).

    ECL semantics: if a key group on the RHS yields more than n matches, the
    group is abandoned — the LHS row is treated as UNMATCHED (kept with
    nulls under LEFT OUTER, dropped under inner). Lowered to a window count
    on the RHS key + conditional join — no driver-side work.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys])
    rhs = (
        right.withColumn("__kc__", F.count(F.lit(1)).over(w))
        .where(F.col("__kc__") <= atmost)
        .drop("__kc__")
    )
    return left.join(rhs, list(keys), "left" if keep_unmatched else "inner")


def join_limit(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    limit: int,
    on_exceed: str = "skip",
) -> DataFrame:
    """JOIN(..., LIMIT(n[, SKIP])) (eclhelper.hpp:1735).

    LIMIT(n, SKIP): LHS rows whose match group exceeds n are dropped
    entirely. on_exceed='fail' aborts at EXECUTION time via an in-plan
    ``assert_true`` guard (the reference's default aborts the workunit) —
    one scan, and the guard can never disagree with the returned plan on
    nondeterministic input (the old eager pre-count scanned the RHS twice).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys])
    rhs = right.withColumn("__kc__", F.count(F.lit(1)).over(w))
    if on_exceed == "fail":
        guard = F.assert_true(
            F.col("__kc__") <= limit, F.lit(f"JOIN LIMIT({limit}) exceeded")
        )
        rhs = rhs.where(guard.isNull())  # assert_true is NULL when it passes
        return left.join(rhs.drop("__kc__"), list(keys), "inner")
    return left.join(
        rhs.where(F.col("__kc__") <= limit).drop("__kc__"), list(keys), "inner"
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    eq_keys: Sequence[str],
    cond: Column,
) -> DataFrame:
    """Sliding/range match (JFslidingmatch eclhelper.hpp:1729): equality
    prefix + bounded inequality tail.

    With an equality prefix this is an equi-join + residual filter (Catalyst
    evaluates the residual inside the join), so it shuffles only on the
    prefix. A pure range join (no prefix) should bucketize the range key
    first — see pipeline.similarity for that pattern.
    """
    lhs, rhs = left.alias("l"), right.alias("r")
    eq = None
    for k in eq_keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        eq = c if eq is None else (eq & c)
    full = cond if eq is None else (eq & cond)
    return lhs.join(rhs, full, "inner")


def smart_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """SMART join (TAKsmartjoin :1048): the reference tries an in-memory
    LOOKUP join and fails over to a distributed hash join when the RHS
    doesn't fit (thorlcr smart-join failover). Spark-first this is exactly
    AQE's runtime join selection: plan with NO hint and let adaptive
    execution pick BroadcastHashJoin when the built side's runtime size is
    under the threshold, SortMergeJoin otherwise — decided from true sizes
    after each stage, which is strictly better information than the
    reference's estimate-then-fail-over. Behavior pinned in
    tests/test_sources_plans.py (small RHS → runtime broadcast; large RHS
    → SMJ, same results either way)."""
    return left.join(right, list(on), _HOW.get(how.lower(), how.lower()))


def join_atmost_range(
    left: DataFrame,
    right: DataFrame,
    eq_pairs: Sequence[tuple[str, str]],
    range_cond: Column,
    atmost: int,
    left_id: str | Sequence[str],
    keep_unmatched: bool = True,
) -> DataFrame:
    """JOIN(..., ATMOST(eq, range, n)) — ATMOST with an equality prefix
    plus a bounded range tail (MJFhasrange eclhelper.hpp:2806; range form
    of ATMOST in the language reference).

    Unlike plain ATMOST (where the abandon-count is a property of the RHS
    key group alone, see join_atmost), the range tail makes the match
    count a property of each LHS ROW: the same RHS group can be under the
    limit for one LHS row and over it for another. Lowering: one
    equi-join shuffle on the prefix (``eq_pairs`` = (left_col, right_col)
    pairs; the two sides' column names must be disjoint) with the range
    predicate as an in-join residual, then a window count partitioned by
    ``left_id`` (a caller-guaranteed unique LHS key — the reference
    identifies LHS rows positionally in its stream) and a filter; groups
    over the limit are abandoned, their LHS rows re-attached unmatched
    when ``keep_unmatched`` (LEFT OUTER form).
    """
    ids = [left_id] if isinstance(left_id, str) else list(left_id)
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, overlap: {sorted(overlap)}")
    eq = None
    for lk, rk in eq_pairs:
        c = F.col(lk) == F.col(rk)
        eq = c if eq is None else (eq & c)
    pairs = left.join(right, eq & range_cond, "inner")
    w = Window.partitionBy(*[F.col(i) for i in ids])
    good = (
        pairs.withColumn("__mc__", F.count(F.lit(1)).over(w))
        .where(F.col("__mc__") <= atmost)
        .drop("__mc__")
    )
    if not keep_unmatched:
        return good
    matched = good.select(*ids).distinct()
    unmatched = left.join(matched, ids, "left_anti")
    rtypes = dict(right.dtypes)
    for c in right.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(rtypes[c]))
    return good.unionByName(unmatched.select(good.columns))


def lookup_join_keep(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    keep: int,
    order_by: Sequence[str | Column],
    how: str = "inner",
    on: str | Sequence[str] | Column | None = None,
) -> DataFrame:
    """JOIN(..., LOOKUP, MANY, KEEP(n)) (JFmanylookup eclhelper.hpp:1732
    + KEEP limit): at most n matches per LHS row.

    The reference keeps the first n rows in RHS hash-table arrival order
    — an order that is nondeterministic on a distributed ingest, which
    the language docs acknowledge ("any n"). We make the tie-order a
    declared contract instead: ``order_by`` ranks each RHS key group and
    the first n under that order survive. The rank runs BEFORE the
    broadcast, over the (small) RHS — so the broadcast ships only n rows
    per key and the probe side is untouched. ``keys`` are RHS columns;
    ``on`` is the join condition (defaults to ``keys`` when the LHS uses
    the same names).
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    rhs = (
        right.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= keep)
        .drop("__rn__")
    )
    return lookup_join(left, rhs, list(keys) if on is None else on, how)
