"""Wave scheduling: politeness budgets + per-host window rank + salted
skew-aware placement.

The reference throttles *time*: ``Concurrent(n)`` in-flight cap,
``PerSecond(n)`` token bucket, ``Delay(s)`` min gap between request
starts, with robots Crawl-delay auto-adopted (config.rs:88-102,
limiter.rs:19-57, crawler.rs:235-241). A batch wave instead throttles
*count*: politeness becomes data — a per-host ``budget`` column — and
the cutoff is a deterministic window rank (SURVEY.md §2 A24/A25,
§4). The equivalence is ``budget = floor(wave_period / delay)`` resp.
``rps x wave_period``, proven by the golden-trace tests.

Determinism: rank ordering is (priority DESC, last_fetch_ts ASC NULLS
FIRST, url ASC) — the url tiebreak makes crawl-order traces exact
(SURVEY.md §4). Skew: rank is computed on the *host* key first; the
salted repartition afterwards is pure placement and cannot split a
budget (SURVEY.md §7 risk 4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Throttle:
    """Engine throttle config (reference: Throttle enum,
    config.rs:88-96; default Concurrent(100), config.rs:98-102)."""

    kind: str = "CONCURRENT"  # CONCURRENT | PER_SECOND | DELAY
    value: float = 100.0

    def __post_init__(self):
        if self.kind == "DELAY" and not self.value > 0:
            # crawler.rs:238: Delay must be > 0
            raise ValueError("Throttle.DELAY requires value > 0")


def politeness_budget(
    crawl_delay: Column,
    wave_period: float,
    throttle: Throttle = Throttle(),
) -> Column:
    """Per-host fetch budget for one wave.

    Precedence mirrors crawler.rs:235-241: an explicit non-default
    throttle wins; otherwise a robots Crawl-delay forces Delay
    semantics; otherwise the default Concurrent cap applies (in batch,
    Concurrent(n) bounds in-flight work, which a wave satisfies by
    construction — so it maps to an n-per-host wave cap).
    """
    if throttle.kind == "PER_SECOND":
        explicit = F.lit(int(throttle.value * wave_period))
    elif throttle.kind == "DELAY":
        explicit = F.greatest(
            F.lit(1), F.floor(F.lit(wave_period / throttle.value))
        ).cast("int")
    else:  # CONCURRENT
        explicit = F.lit(int(throttle.value))

    from_delay = F.greatest(
        F.lit(1), F.floor(F.lit(wave_period) / crawl_delay)
    ).cast("int")

    if throttle.kind == "CONCURRENT":
        # default throttle yields to robots Crawl-delay when present
        return F.when(
            crawl_delay.isNotNull() & (crawl_delay > 0), from_delay
        ).otherwise(explicit)
    return explicit.cast("int")


SCHEDULE_ORDER = ("priority", "last_fetch_ts", "url")

# (column, ascending, nulls_first) for the per-host schedule order
# (priority DESC NULLS LAST, last_fetch_ts ASC NULLS FIRST, url ASC).
# The bucket comparator deliberately EXCLUDES host: order-consistent
# bucketing only needs within-host monotonicity, which this order
# gives for every host at once, and dropping the host string compare
# keeps the generated binary-search method under the JVM's ~8 KB
# DontCompileHugeMethods limit (measured: the host-including variant
# generated a 9.5 KB method that never JIT-compiled and evaluated at
# ~5 us/row — 10x the whole sort).
_ORDER_SPEC = (
    ("priority", False, False),
    ("last_fetch_ts", True, True),
    ("url", True, True),
)

_SAMPLE_SEED = 0x5157


def _common_prefix_len(a: Column, b: Column) -> Column:
    """Length of the common prefix of two strings (JVM aggregate over
    char positions; runs on ONE row per hot host)."""
    n = F.least(F.length(a), F.length(b))
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1) & (F.substring(a, i, 1) == F.substring(b, i, 1)),
            i,
        ).otherwise(acc),
    )


def _pos_cmp(col: Column, b, asc: bool, nulls_first: bool):
    """(strictly_after, strictly_before) boolean exprs comparing
    ``col`` against the literal ``b`` under one sort component's
    direction and null placement. Both exprs are never-NULL
    (three-valued-logic safe)."""
    if b is None:
        if nulls_first:
            return col.isNotNull(), F.lit(False)
        return F.lit(False), col.isNotNull()
    lb = F.lit(b)
    gt_base = (col > lb) if asc else (col < lb)
    lt_base = (col < lb) if asc else (col > lb)
    if nulls_first:
        # a NULL row sorts before any non-null bound
        return col.isNotNull() & gt_base, col.isNull() | lt_base
    # nulls last: a NULL row is strictly after any non-null bound
    return col.isNull() | gt_base, col.isNotNull() & lt_base


def _after_bound(bound: tuple) -> Column:
    """Row strictly after ``bound`` (a (priority, ts, url) tuple of
    Python literals) in the schedule order. A short-circuiting CASE
    chain of pure Catalyst comparisons against literals — whole-stage
    codegen, no higher-order functions (the r4 prototype's HOF
    boundary probe ran interpreted and was 10x too slow), each
    component tested at most twice, no repeated equality
    conjunctions. Generated-code SIZE is a first-order concern here:
    the probe must stay under the JVM's ~8 KB DontCompileHugeMethods
    limit or the whole projection runs un-JIT-compiled (measured at
    ~5 us/row — 10x the sort it feeds)."""
    expr = F.lit(False)
    for (name, asc, nf), b in reversed(list(zip(_ORDER_SPEC, bound))):
        gt, lt = _pos_cmp(F.col(name), b, asc, nf)
        expr = F.when(gt, F.lit(True)).when(lt, F.lit(False)).otherwise(expr)
    return expr


def _bucket_of(bounds: list) -> Column:
    """Bucket index = number of boundary tuples strictly before the
    row, via an unrolled binary search (depth log2 |bounds|) over
    literal boundaries. Order-consistent BY CONSTRUCTION — for every
    host at once: the comparator (priority, ts, url) is the per-host
    schedule order itself, so within any host the bucket is a
    monotone non-decreasing function of the row's position, and rows
    that tie on the full order tuple always share a bucket — the two
    properties per-bucket ranking + cumulative offsets need for
    exact global ranks."""
    def rec(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            _after_bound(bounds[mid]), rec(mid + 1, hi)
        ).otherwise(rec(lo, mid))

    return rec(0, len(bounds))


def _py_order_key(row) -> tuple:
    """Driver-side sort key for sampled (priority, ts, url) rows —
    the same order as _ORDER_SPEC/_after_bound."""
    p, ts, url = row[0], row[1], row[2]
    return (
        (1, 0) if p is None else (0, -p),
        (0, 0) if ts is None else (1, ts),
        (0, "") if url is None else (1, url),
    )


def sample_order_bounds(
    source: DataFrame,
    n_buckets: int,
    approx_count: int | None = None,
    samples_per_bucket: int = 64,
    max_samples: int = 65536,
) -> list:
    """Sample ``source`` and return up to ``n_buckets - 1`` sorted,
    deduplicated boundary tuples on the schedule order (the same
    sampling strategy Spark's RangePartitioner uses, so a hot host
    holding 10% of rows receives ~10% of the boundaries — skew-balance
    comes from the data itself, not from assumptions about key
    distributions).

    ``source`` may be ANY superset or proxy of the frontier with the
    order columns (e.g. the raw frontier table before the seen
    anti-join): boundaries only steer load balance, never results, so
    sampling the cheap pre-join scan avoids re-running upstream joins.
    ``approx_count`` (when the caller tracks frontier size, as the
    driver's flow counters do) skips the sizing count()."""
    n = approx_count if approx_count is not None else source.count()
    if n <= 0 or n_buckets <= 1:
        return []
    target = min(max_samples, n_buckets * samples_per_bucket)
    frac = min(1.0, 1.25 * target / n)
    rows = (
        source.select("priority", "last_fetch_ts", "url")
        .sample(False, frac, seed=_SAMPLE_SEED)
        .limit(4 * max_samples)
        .collect()
    )
    if len(rows) < 2:
        return []
    keyed = sorted(((_py_order_key(r), tuple(r)) for r in rows))
    n_b = min(n_buckets, max(1, len(keyed) // 2))
    bounds, last_key = [], None
    for i in range(1, n_b):
        k, row = keyed[i * len(keyed) // n_b]
        if k != last_key:
            bounds.append(row)
            last_key = k
    return bounds


def rank_frontier_distributed(
    base: DataFrame,
    bounds: list,
    host_col: str = "host",
    budget_col: str | None = None,
) -> DataFrame:
    """EXACT per-host row_number with NO serial per-host STRING sort
    (the r4 scaling diagnosis: a hot registered domain owning 10% of
    the frontier made the final window one ~17 s task at every
    parallelism level — an Amdahl serial term identical on any
    cluster size; BENCH.md r4).

    Two chained windows:

    1. ``_bkt`` = order-consistent bucket from the literal boundary
       binary search (codegen; within every host, bucket order
       refines the schedule order, and full-order ties share a
       bucket). ``_lr`` = row_number per (host, bucket): MANY
       parallel bounded sorts carry the expensive string ordering.
    2. rank = row_number per host ordered by (_bkt ASC, _lr ASC) —
       equal to the single-window rank because bucket order refines
       the true order and _lr is exact within each bucket. The hot
       host is still one task here, but its sort key is TWO INTS:
       the measured ~17 s hot-host string sort becomes a sub-second
       numeric sort, leaving only the single-reducer shuffle read as
       the residual serial term (bytes-bound, not compare-bound).

    Why not offsets-via-aggregation (rank = _lr + cumulative bucket
    counts, killing pass 2 entirely)? It needs the exchanged data
    consumed twice; Catalyst prunes each consumer's columns into its
    own copy of the exchange, so the upstream plan (the seen
    anti-join — the most expensive wave stage) runs twice (measured),
    and pinning one exchange via persist() costs more in columnar
    cache build than the pass it saves (also measured, BENCH.md r5).
    Two thin windows over one upstream run win on every shape tried.

    With ``budget_col`` set, pass-1 ranks > budget are dropped before
    the second shuffle (a row's global rank is >= its bucket rank):
    in the politeness shape (pending >> budget) pass 2 moves
    O(buckets x budget) rows per host, not the whole pending set.
    The final exact cutoff is rank <= budget.

    Empty ``bounds`` degrades to one bucket per host — pass 1 then
    equals the plain per-host window (correct; chosen only when the
    frontier is tiny)."""
    keyed = base.withColumn(
        "_bkt", _bucket_of(bounds) if bounds else F.lit(0)
    )
    w1 = Window.partitionBy(host_col, "_bkt").orderBy(*_order_cols())
    pre = keyed.withColumn("_lr", F.row_number().over(w1))
    if budget_col is not None:
        pre = pre.where(F.col("_lr") <= F.col(budget_col))
    w2 = Window.partitionBy(host_col).orderBy(
        F.asc("_bkt"), F.asc("_lr")
    )
    r = pre.withColumn("rank", F.row_number().over(w2))
    if budget_col is not None:
        r = r.where(F.col("rank") <= F.col(budget_col))
    return r.drop("_bkt", "_lr")


def _order_cols():
    return (
        F.desc_nulls_last("priority"),
        F.asc_nulls_first("last_fetch_ts"),
        F.asc("url"),
    )


def rank_frontier(frontier: DataFrame, host_col: str = "host") -> DataFrame:
    """Deterministic per-host rank (the core scheduling operator)."""
    w = Window.partitionBy(host_col).orderBy(*_order_cols())
    return frontier.withColumn("rank", F.row_number().over(w))


def schedule_wave(
    frontier: DataFrame,
    host_budgets: DataFrame,
    wave_period: float,
    throttle: Throttle = Throttle(),
    max_urls_per_wave: int | None = None,
    host_col: str = "host",
    pre_salt: int = 16,
    strategy: str = "distributed",
    n_buckets: int | None = None,
    boundary_source: DataFrame | None = None,
    approx_count: int | None = None,
) -> DataFrame:
    """Select this wave's URLs: rank per host, cut at the politeness
    budget, optionally cap the global wave size (the page_buffer /
    memory bound analogue, config.rs:53-55).

    host_budgets: (host, crawl_delay[, backoff_k]) — per-host; joined
    broadcast (host cardinality << frontier cardinality at any scale).
    An optional ``backoff_k`` column halves the host's budget k times
    (floored at 1) — the driver's adaptive error backoff: hosts that
    erred in recent waves get exponentially less of each wave.
    frontier must have (url, host, priority, last_fetch_ts).

    Skew (the north rule's hot registered domain): a naive per-host
    window makes a hot domain's rank ONE task — a serial sort that
    caps scaling at any cluster size (measured: 0.45 stage efficiency
    8->32 cores, BENCH.md r4). ``strategy`` picks the cure:

    - "distributed" (default): sample boundary tuples on the order
      key (from ``boundary_source`` if given — any cheap superset
      scan, e.g. the frontier table before the seen anti-join — else
      the frontier itself), then rank_frontier_distributed: one full
      shuffle, bounded parallel per-bucket sorts, broadcast offsets,
      and an exact pre-shuffle budget cut. Exact for any priority /
      timestamp / url values (tuple comparisons, no key coarsening).
    - "two_phase": the r2-r4 salted pre-rank (kept for A/B): exact,
      but its final window re-sorts each host in one task — the
      measured Amdahl term the distributed strategy removes.

    Both produce byte-identical schedules (golden tests pin it).
    """
    budget = politeness_budget(F.col("crawl_delay"), wave_period, throttle)
    has_backoff = "backoff_k" in host_budgets.columns
    dim_cols = [host_col, "crawl_delay"] + (["backoff_k"] if has_backoff else [])
    base = frontier.join(
        F.broadcast(host_budgets.select(*dim_cols)),
        host_col,
        "left",
    ).withColumn("_budget", budget)
    if has_backoff:
        # halve k times; expr because shiftright needs a literal count
        base = base.withColumn(
            "_budget",
            F.expr(
                "CAST(GREATEST(1, _budget DIV CAST(POW(2, "
                "COALESCE(backoff_k, 0)) AS INT)) AS INT)"
            ),
        ).drop("backoff_k")

    if strategy == "distributed":
        spark = frontier.sparkSession
        if n_buckets is None:
            sp = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
            n_buckets = max(8, min(512, 4 * sp))
        bounds = sample_order_bounds(
            boundary_source if boundary_source is not None else frontier,
            n_buckets,
            approx_count=approx_count,
        )
        picked = rank_frontier_distributed(
            base, bounds, host_col=host_col, budget_col="_budget"
        ).drop("crawl_delay", "_budget")
    else:
        salt = F.pmod(F.xxhash64(F.col("url")), F.lit(pre_salt))
        w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*_order_cols())
        pre = (
            base.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= F.col("_budget"))
            .drop("_r1")
        )
        w2 = Window.partitionBy(host_col).orderBy(*_order_cols())
        picked = (
            pre.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= F.col("_budget"))
            .drop("crawl_delay", "_budget")
        )
    if max_urls_per_wave is not None:
        # deterministic global cap: favor low rank (fair across
        # hosts), url tiebreak. orderBy+limit compiles to a
        # distributed TakeOrdered — never a single-partition window.
        picked = picked.orderBy(F.asc("rank"), F.asc("url")).limit(
            max_urls_per_wave
        )
    return picked


def salted_repartition(
    df: DataFrame,
    num_partitions: int,
    salt_buckets: int = 8,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Skew-aware placement: repartition on (host, salt) so a hot
    registered domain spreads over ``salt_buckets`` partitions instead
    of pinning one executor (north rule). Budgets are already
    enforced by rank, so salting is placement-only and cannot change
    which URLs run (SURVEY.md §7 risk 4)."""
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col(host_col), salt)
