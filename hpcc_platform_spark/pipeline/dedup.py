"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB: every stage is a key-shuffle or map-only transform.
Signatures are computed with JVM-side hash functions (xxhash64/md5 — no
Python in the hot path); candidate generation is a band-bucket self-join
(shuffle on bucket id), never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by content hash: keep the lowest-id representative per
    hash, with the duplicate count. One shuffle on the 128-bit hash.

    min/count hash aggregate, not a row_number window: partial map-side
    aggregation means one (hash, min_id, count) triple per hash per map
    task crosses the exchange instead of every row, and no per-group sort
    is needed (guide §2.3 aggregate before you shuffle)."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
    return (
        hashed.groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "text_hash", "n_copies")
    )


def _shingles(text_col: str, k: int) -> F.Column:
    """k-word shingles as strings (whitespace tokens joined by a space)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: num_hashes permutations approximated
    by hash(shingle, seed_i); signature[i] = min over shingles.

    ``hash_mode='xxhash64'`` (default, fastest — signature array<long>) or
    ``'md5'`` (portable: md5(seed || ':' || shingle) hex strings, identical
    in any engine with md5 — signature array<string>, used by the
    oracle-checked query). All array lambdas — JVM-side, map-only.
    """
    sh = _shingles(text_col, shingle_k).alias("sh")
    base = df.select(F.col(id_col), sh)
    # ONE fold over the shingle array updating all num_hashes minima per
    # shingle (array accumulator) instead of num_hashes separate
    # array_min(transform(...)) traversals: min is order-insensitive so the
    # signatures are identical, but the expression tree is constant-size
    # (the per-permutation folds made plan analysis dominate at small
    # scale) and the shingles are traversed once per row. ``least`` skips
    # NULLs, so a NULL-seeded accumulator works for both hash modes;
    # _shingles always yields >= 1 element, so no NULL survives.
    # Literal seed arrays in ONE driver call (F.lit(list)) instead of one
    # py4j round trip per element; the xxhash64 seeds keep their original
    # IntegerType via an explicit cast — the hash covers the argument's
    # TYPE, so an inferred long would change every signature.
    if hash_mode == "md5":
        seeds = F.lit([f"{i}:" for i in range(num_hashes)])
        acc0 = F.array_repeat(F.lit(None).cast("string"), num_hashes)
        step = lambda s: lambda a, p: F.least(  # noqa: E731
            a, F.md5(F.concat(p, s).cast("binary"))
        )
    else:
        seeds = F.lit(list(range(num_hashes))).cast("array<int>")
        acc0 = F.array_repeat(F.lit(None).cast("long"), num_hashes)
        step = lambda s: lambda a, p: F.least(a, F.xxhash64(s, p))  # noqa: E731

    sig = F.aggregate(
        F.col("sh"), acc0, lambda acc, s: F.zip_with(acc, seeds, step(s))
    ).alias("signature")
    return base.select(F.col(id_col), sig)


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float | None = None,
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands of
    ``rows_per_band`` values, hash each band to a bucket, self-join on
    (band, bucket) to emit candidate pairs (id_a < id_b), then estimate
    Jaccard from full-signature agreement.

    Scale: the self-join shuffles on band-bucket — cardinality ~n·bands —
    and never materializes the n² pair space. Skewed buckets (boilerplate
    docs) are handled by AQE skew-join splitting.
    """
    exploded = sigs.select(
        F.col(id_col),
        F.col("signature"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("signature", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        ).cast("binary")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "signature", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    n_agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = pairs.withColumn(
        "jaccard_est", n_agree.cast("double") / F.size("sig_a")
    ).select("id_a", "id_b", "jaccard_est")
    if jaccard_threshold is not None:
        est = est.where(F.col("jaccard_est") >= jaccard_threshold)
    return est


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, sum ±1 per bit
    position, sign → bit. Near-dups differ in few bits (hamming distance).

    Pure array lambdas over the token list — map-only. Output (id, simhash).
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # Bind the hash array once: as a free expression it is inlined into
    # every one of the 64 bit-vote folds below, and interpreted HOF eval
    # re-tokenizes and re-hashes the document 64× per row.
    df = df.select(F.col(id_col), F.transform(words, lambda w: F.xxhash64(w)).alias("__h__"))
    hashes = F.col("__h__")

    # Bit 63's mask must be the signed-long representation: 1<<63
    # overflows Java long as an unsigned literal.
    masks = F.lit(
        [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]
    ).cast("array<long>")
    # ONE fold over the hash array updating all 64 vote counters per token
    # (array accumulator) instead of 64 separate folds: same per-bit ±1
    # integer sums in the same order, but a constant-size expression tree
    # (64 folds made analysis/optimization dominate at small scale) and a
    # single traversal of the hash array per row.
    bit_sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # Materialize the 64 votes once, then assemble the word with ONE fold
    # over (votes, masks): the previous 64-step bitwiseOR(when(...)) chain
    # built a depth-64 expression tree through 128 py4j calls — measured
    # 1.0+ s of pure driver-side query construction per run. OR order is
    # immaterial, so the fold is bit-identical.
    staged = df.select(F.col(id_col), bit_sums.alias("__bits__"))
    sim = F.aggregate(
        F.zip_with(
            F.col("__bits__"),
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return staged.select(F.col(id_col), sim.alias("simhash"))


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_len: int = 8,
    window: int = 4,
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer et al., SIGMOD'03):
    rolling hash = md5 of each character ``gram_len``-gram; keep the min
    hash of every ``window`` consecutive grams; distinct mins are the
    fingerprint set. Guarantees any shared substring of length
    gram_len+window-1 yields a shared fingerprint.

    Portable (md5) and map-only — array lambdas over substrings, no UDF,
    no shuffle; the fingerprint explode/self-join for matching is a key
    shuffle like every other dedup stage. Output: (id, fingerprint) rows.
    """
    txt = F.col(text_col)
    n_grams = F.greatest(F.length(txt) - (gram_len - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(txt.substr(i, F.lit(gram_len)).cast("binary")),
    )
    staged = df.select(F.col(id_col), grams.alias("__grams__"))
    n_windows = F.greatest(F.size("__grams__") - (window - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice("__grams__", i, window)),
        )
    )
    return staged.select(
        F.col(id_col), F.explode(fps).alias("fingerprint")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage after
    LSH): joins the shingle sets back onto (id_a, id_b) and computes
    |A∩B| / |A∪B| with array ops. Only candidates pay the exact cost."""
    sh = df.select(
        F.col(id_col), F.array_distinct(_shingles(text_col, n)).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidate_pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return joined.select(
        "id_a", "id_b", (inter / union).alias("jaccard")
    )


def simhash16_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Portable 16-bit SimHash: token hash = first 4 nibbles of md5, per-bit
    ±1 majority vote, sign → bit. Same construction as simhash64 but with
    an engine-portable hash so DuckDB can replicate it bit-for-bit (the
    oracle path); use simhash64 (xxhash64) in production — same shape,
    wider fingerprint, faster hash."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    hexdigits = "0123456789abcdef"

    hashes = F.transform(words, lambda w: F.md5(w.cast("binary")))
    staged = df.select(F.col(id_col), hashes.alias("__h__"))
    # ONE fold updating all 16 vote counters per token (see simhash64):
    # bit i lives in hex digit i div 4 (1-based substring pos p), nibble
    # mask 1 << (i mod 4) — identical ±1 integer sums to the original 16
    # separate folds, but a constant-size expression tree and one
    # traversal of the hash array per row.
    bitpos = F.array(
        *[
            F.struct(F.lit(i // 4 + 1).alias("p"), F.lit(1 << (i % 4)).alias("m"))
            for i in range(16)
        ]
    )
    votes = F.aggregate(
        F.col("__h__"),
        F.array_repeat(F.lit(0), 16),
        lambda acc, h: F.zip_with(
            acc,
            bitpos,
            lambda a, s: a
            + F.when(
                (F.instr(F.lit(hexdigits), F.substring(h, s["p"], F.lit(1))) - 1)
                .bitwiseAND(s["m"])
                != 0,
                1,
            ).otherwise(-1),
        ),
    )
    staged = staged.select(F.col(id_col), votes.alias("__votes__"))
    # One fold over (votes, bit values) instead of a 16-step `+ when(...)`
    # chain (see simhash64): disjoint powers of two, so addition order is
    # immaterial and the fold is value-identical.
    bitvals = F.lit([1 << i for i in range(16)]).cast("array<int>")
    fp = F.aggregate(
        F.zip_with(
            F.col("__votes__"),
            bitvals,
            lambda v, b: F.when(v > 0, b).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return staged.select(F.col(id_col), fp.cast("int").alias("simhash16"))


def _word_sets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.array_distinct(
            F.filter(F.split(text_col, r"\s+"), lambda w: w != "")
        ).alias("ws"),
    )


def containment_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame | None = None,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    all_pairs: bool = False,
) -> DataFrame:
    """Near-subset detection: containment C(A,B) = |A∩B| / |A| over word
    sets — catches quotes, boilerplate-wrapped copies, and excerpt
    relationships that symmetric Jaccard under-scores (a 100-word doc fully
    contained in a 10,000-word doc has Jaccard ≈ 0.01 but containment 1.0).

    Verification stage over ``candidate_pairs`` (id_a, id_b), same contract
    as ngram_jaccard_pairs: only candidates pay the exact set-intersection
    cost. Containment is asymmetric, so each candidate pair is scored in
    both orientations. When no candidates are given, they default to the
    MinHash/LSH band join (note: symmetric-Jaccard LSH under-recalls
    extreme small-in-large containment; use containment_pairs_exact for
    exhaustive recall). ``all_pairs=True`` is the quadratic escape hatch
    for small fixtures/tests only — never at scale."""
    sets_df = _word_sets(df, text_col, id_col)
    a = sets_df.select(F.col(id_col).alias("id_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col(id_col).alias("id_b"), F.col("ws").alias("ws_b"))
    if all_pairs:
        pairs = a.join(b, F.col("id_a") != F.col("id_b"))
    else:
        if candidate_pairs is None:
            sigs = minhash_signatures(df, text_col=text_col, id_col=id_col)
            candidate_pairs = minhash_lsh_candidates(sigs, id_col=id_col)
        cand = candidate_pairs.select("id_a", "id_b")
        both = cand.union(
            cand.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        ).dropDuplicates(["id_a", "id_b"])
        pairs = both.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    return (
        pairs.withColumn(
            "containment", inter / F.size("ws_a").cast("double")
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 4).alias("containment"))
    )


def containment_pairs_exact(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exhaustive containment without the n² cartesian: inverted-index
    self-join (the SSJoin/PPJoin family shape). Explode each document's
    distinct words, equi-join on the word, and count matches per (id_a,
    id_b) — the count IS |A∩B|, so no array intersection and no candidate
    recall loss.

    Scale: two key shuffles (on word, then on the pair), never a
    cartesian/BNLJ. Cost is Σ_w df(w)² — ultra-common tokens are the skew
    axis; AQE skew-join splits them, and a document-frequency cap (prefix
    filtering) is the standard next pruning step when a corpus-level stop
    list is acceptable."""
    sets_df = _word_sets(df, text_col, id_col).select(
        F.col(id_col), F.size("ws").alias("n"), F.col("ws")
    )
    tok_a = sets_df.select(
        F.col(id_col).alias("id_a"),
        F.col("n").alias("n_a"),
        F.explode("ws").alias("w"),
    )
    tok_b = sets_df.select(F.col(id_col).alias("id_b"), F.explode("ws").alias("w"))
    return (
        tok_a.join(tok_b, "w")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .withColumn(
            "containment", F.col("n_shared").cast("double") / F.col("n_a").cast("double")
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 4).alias("containment"))
    )


def dedup_clusters(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup cluster formation: connected components over candidate
    pairs, labeling every document with the MIN id of its component as the
    canonical representative — the final step that turns pairwise
    LSH/verification output into "keep doc X, drop its cluster".

    Min-label propagation: each round every vertex takes the smallest
    label among itself and its neighbors; converges in O(component
    diameter) rounds — near-dup clusters are shallow (a hub duplicate
    chains the rest), so a handful of rounds closes them. Each round is
    join + groupBy(min): key shuffles only, lineage truncated by an eager
    localCheckpoint per round (the GRAPH-loop discipline of
    operators/loop.py). For adversarially long chains at extreme scale,
    the large-star/small-star variant (log-round) drops in here without
    changing the contract.

    Output: (id, canonical_id) for every id that appears in any pair —
    unpaired docs are their own cluster and need no row.
    """
    a, b = F.col(id_col_a), F.col(id_col_b)
    sym = (
        # Symmetrize with ONE explode instead of a self-union: a union
        # embeds the (often expensive) upstream pair-pipeline plan TWICE
        # and Catalyst plans both copies — measured 0.61 s -> ~0.35 s of
        # pure planning on the LSH pipeline feeding semantic_dedup.
        pairs.select(
            F.explode(
                F.array(
                    F.struct(a.alias("src"), b.alias("dst")),
                    F.struct(b.alias("src"), a.alias("dst")),
                )
            ).alias("__e__")
        )
        .select("__e__.src", "__e__.dst")
        .distinct()
        # LAZY checkpoint: round 1's convergence count materializes it in
        # the same job, so rounds never re-execute the upstream pair
        # pipeline (LSH + verification) and no separate driver job is
        # spent on the materialization itself.
        .localCheckpoint(eager=False)
    )
    id_type = sym.schema["src"].dataType
    labels = None
    changed = 0
    for _ in range(max_iters):
        # Carry each vertex's own (previous) label through the min-fold so
        # convergence is a filter over the checkpointed result — no extra
        # join + shuffle pair per round just to detect "nothing changed".
        if labels is None:
            # Round 1 seeds straight from sym: the initial labels frame is
            # (id, id) for every distinct src, so joining it onto sym is
            # the identity — emit sym's own rows as the messages and the
            # (deduplicated-by-min) self rows as `own`, skipping a join
            # AND the distinct's extra shuffle.
            msgs = sym.select(
                F.col("dst").alias("id"),
                F.col("src").alias("comp"),
                F.lit(None).cast(id_type).alias("own"),
            )
            own_rows = sym.select(
                F.col("src").alias("id"),
                F.col("src").alias("comp"),
                F.col("src").alias("own"),
            )
        else:
            msgs = labels.join(sym, labels["id"] == sym["src"]).select(
                F.col("dst").alias("id"),
                "comp",
                F.lit(None).cast(id_type).alias("own"),
            )
            own_rows = labels.select("id", "comp", F.col("comp").alias("own"))
        new = (
            own_rows.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"), F.min("own").alias("own"))
            # lazy: the count below materializes the checkpoint in the
            # same driver job (one job per round instead of two)
            .localCheckpoint(eager=False)
        )
        changed = new.where(F.col("comp") != F.col("own")).count()
        labels = new.select("id", "comp")
        if changed == 0:
            break
    if labels is None:  # max_iters <= 0: the pre-loop identity labeling
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("comp"))
        )
    if changed != 0:
        # Exhausting max_iters mid-propagation would silently return
        # half-merged components — refuse instead (a chain's diameter
        # exceeded max_iters; raise it or use dedup_clusters_star).
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            "max_iters — raise it or use dedup_clusters_star (log-round)"
        )
    return labels.select(F.col("id"), F.col("comp").alias("canonical_id"))


def dedup_clusters_star(
    pairs: DataFrame,
    id_col_a: str = "id_a",
    id_col_b: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) ROUNDS regardless of component DIAMETER, the
    drop-in for adversarially long chains where ``dedup_clusters``'
    diameter-bound label propagation would need too many rounds.

    Large-star: every node connects its strictly-larger neighbors to the
    minimum of its neighborhood (+ itself). Small-star: every node
    connects its smaller-or-equal neighbors (and itself) to that minimum.
    Both are one groupBy(min) + one equi-join per round — key shuffles on
    the node id, never on the (possibly mega-component) label, so a
    30%-of-corpus component still spreads across reducers. At the fixed
    point the edge set IS the star (v -> component min).

    Same contract as ``dedup_clusters``: (id, canonical_id=component min)
    for every id appearing in any input pair.
    """
    a, b = F.col(id_col_a), F.col(id_col_b)
    # Materialize the projected pair list ONCE: nodes and edges otherwise
    # each re-execute the whole upstream candidate pipeline.
    pairs0 = (
        pairs.select(a.alias("src"), b.alias("dst"))
        .distinct()
        # lazy: round 1's fingerprint job materializes it; nodes (read
        # after the loop) then scans the cached blocks
        .localCheckpoint(eager=False)
    )
    nodes = (
        pairs0.select(F.col("src").alias("id"))
        .unionByName(pairs0.select(F.col("dst").alias("id")))
        .distinct()
    )
    edges = pairs0.where(F.col("src") != F.col("dst"))

    def _mins(sym: DataFrame) -> DataFrame:
        return (
            sym.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .withColumn("m", F.least("mn", F.col("src")))
            .select("src", "m")
        )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return (
            sym.join(_mins(sym), "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        j = oriented.join(_mins(oriented), "src")
        return (
            # one explode, not j ∪ j: the union form embeds the join
            # subtree twice in the plan and Catalyst plans both copies
            # every round (planning, not execution, dominates the round)
            j.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("dst").alias("src"), F.col("m").alias("dst")
                        ),
                        F.struct(
                            F.col("src").alias("src"), F.col("m").alias("dst")
                        ),
                    )
                ).alias("__e__")
            )
            .select("__e__.src", "__e__.dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    prev: tuple | None = None
    converged = False
    for _ in range(max_iters):
        # lazy checkpoint + fingerprint in ONE driver job per round: the
        # agg below materializes the checkpoint blocks the next round's
        # large_star reads — halves the round's job count vs eager+agg
        edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),  # overflow-free
        ).head()
        fp = (row["n"], row["h"])
        if fp == prev:  # fixed point (fingerprint equality; an extra
            converged = True  # round on a collision would be harmless)
            break
        prev = fp
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge in {max_iters} rounds; "
            "the alternation is O(log n) — this indicates a bug, not data"
        )
    labels = edges.groupBy("src").agg(F.min("dst").alias("canonical_id")).select(
        F.col("src").alias("id"), "canonical_id"
    )
    roots = nodes.join(labels, "id", "left_anti").select(
        "id", F.col("id").alias("canonical_id")
    )
    return labels.unionByName(roots)
