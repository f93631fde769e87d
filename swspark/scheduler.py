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

# log-spaced percentile grid for the hot-host pre-prune (percentile
# literals must be foldable, so per-host targets snap UP to a grid
# point — at most 10^(1/6) ~ 1.47x over-keep)
_PRUNE_GRID = [10.0 ** (-6 + i / 6.0) for i in range(36)] + [1.0]


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


def _coarse_order_key(
    cp_col: Column,
    prio_col: str = "priority",
    ts_col: str = "last_fetch_ts",
    url_col: str = "url",
) -> Column:
    """53-bit coarsening of the schedule order (priority DESC NULLS
    LAST, last_fetch_ts ASC NULLS FIRST, url ASC): monotone
    NON-DECREASING along the true order, so for any row r the set
    {x : key(x) <= key(r)} is a superset of every row ordered before
    r — coarse ties only ever OVER-keep, never drop a winner.

    Layout: [7b inverted priority][14b ts bucket][32b url bytes].
    <= 2^53 so percentile_approx's internal double representation is
    EXACT (int64-wide keys round in the sketch and could round a
    threshold below its true rank). The url component takes the 4
    bytes at ``cp_col`` — the host's common url prefix length (from
    min/max urls; every url lexicographically between them shares that
    prefix) — because the leading scheme://host bytes are constant
    within the host and discriminate nothing."""
    p = F.col(prio_col)
    inv_p = F.when(p.isNull(), F.lit(127)).otherwise(
        F.lit(126) - F.least(F.greatest(p, F.lit(0)), F.lit(125))
    ).cast("long")
    ts = F.col(ts_col).cast("long")  # seconds; null (never fetched) first
    ts_b = F.when(ts.isNull(), F.lit(0)).otherwise(
        F.least(
            F.greatest((ts / F.lit(1 << 22)).cast("long") + 1, F.lit(1)),
            F.lit((1 << 14) - 1),
        )
    ).cast("long")

    def byte(i) -> Column:
        # codepoint of the char at cp+i, clamped to a byte — UTF-8
        # byte order is codepoint order, so clamping stays
        # monotone-coarse; past-the-end chars read as 0 (shorter
        # strings sort first, matching lexicographic order)
        return F.least(
            F.coalesce(
                F.ascii(F.substring(F.col(url_col), cp_col + i, 1)),
                F.lit(0),
            ),
            F.lit(255),
        ).cast("long")

    url_key = (
        byte(1) * F.lit(1 << 24) + byte(2) * F.lit(1 << 16)
        + byte(3) * F.lit(256) + byte(4)
    )
    return (inv_p * F.lit(1 << 14) + ts_b) * F.lit(1 << 32) + url_key


def preprune_hot_hosts(
    base: DataFrame,
    host_col: str = "host",
    hot_min_rows: int = 100_000,
    hot_factor: int = 64,
    accuracy: int = 10_000,
) -> DataFrame:
    """EXACT row cut ahead of the rank shuffle (the 10^10-frontier
    politeness shape: pending rows per host >> budget, so the window
    sorts orders of magnitude more rows than can ever be scheduled).

    Per hot host (pending > hot_min_rows and > hot_factor x budget),
    compute a coarse-key threshold whose true rank is PROVABLY >= the
    budget — approx_percentile's rank error is bounded by n/accuracy,
    so querying rank budget + 2n/accuracy + 1 over-estimates — and
    keep only rows at or under it. Kept rows per hot host ~
    1.47 x (budget + 3n/accuracy); everything about the subsequent
    two-phase rank is unchanged, and the golden-trace tests pin that
    the schedule is identical. Cold hosts (including the unbounded-
    budget stress shape, where n < hot_factor x budget never holds)
    pass through untouched.

    Cost: one map-side-combined count per host (tiny shuffle), one
    percentile sketch over hot hosts' rows only, two broadcast joins.
    The win: the (host, salt) window's sort input drops from
    O(|frontier|) to O(hosts x budget)."""
    counts = base.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("_budget").alias("_bmax"),
        F.min("url").alias("_umin"),
        F.max("url").alias("_umax"),
    )
    hot = counts.where(
        (F.col("_n") > F.lit(hot_min_rows))
        & (F.col("_n") > F.col("_bmax") * hot_factor)
    ).withColumn(
        # every url between _umin and _umax shares their common
        # prefix, so the key's url bytes start where urls of this
        # host actually differ (the scheme://host bytes never do)
        "_cp",
        _common_prefix_len(F.col("_umin"), F.col("_umax")),
    )
    keyed = base.join(
        F.broadcast(hot.select(host_col, "_cp")), host_col, "left"
    ).withColumn(
        "_ck",
        F.when(
            F.col("_cp").isNotNull(), _coarse_order_key(F.col("_cp"))
        ),
    )
    grid = F.array(*[F.lit(p) for p in _PRUNE_GRID])
    qs = keyed.where(F.col("_ck").isNotNull()).groupBy(host_col).agg(
        F.percentile_approx("_ck", grid, F.lit(accuracy)).alias("_qs")
    )
    thr = (
        qs.join(hot, host_col)
        .withColumn(
            "_tgt",
            (F.col("_bmax") + 2 * F.col("_n") / accuracy + 1) / F.col("_n"),
        )
        .withColumn(
            "_idx",
            F.least(
                F.size(F.filter(grid, lambda g: g < F.col("_tgt"))) + 1,
                F.lit(len(_PRUNE_GRID)),
            ),
        )
        .select(host_col, F.element_at("_qs", F.col("_idx")).alias("_thr"))
    )
    return (
        keyed.join(F.broadcast(thr), host_col, "left")
        .where(F.col("_thr").isNull() | (F.col("_ck") <= F.col("_thr")))
        .drop("_ck", "_cp", "_thr")
    )


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
    preprune: bool = False,
    preprune_hot_min_rows: int = 100_000,
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

    Skew: a naive per-host window makes a hot domain's rank a single
    task (one partition sorts the whole 10%-of-frontier host). The
    rank is therefore two-phase and exact:

      1. pre-rank within (host, salt) — ``pre_salt`` parallel tasks
         per host — and keep only local rank <= budget. Any row in
         the host's true top-``budget`` is necessarily within the
         top-``budget`` of its own salt bucket, so this drops no
         winner (top-k monotonicity).
      2. final rank over the survivors (<= pre_salt x budget rows per
         host — tiny) and cut at the budget.

    Both phases use the same deterministic ordering, so the result is
    identical to the single-window plan.
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

    if preprune:
        # hot-host pre-prune (r4): cut the rank's sort input to
        # ~budget-sized per host before the (host, salt) shuffle —
        # no-op unless a host's pending count dwarfs its budget.
        # DEFAULT OFF after measurement (BENCH.md r4): on a single
        # box the full-width shuffle is memory-bandwidth-efficient
        # and the threshold passes cost as much as the sort they
        # save (percentile variant measured 2x SLOWER at 100M).
        # The exact over-keep machinery is kept for network-bound
        # clusters, where a 10^10-row shuffle is the wire bottleneck
        # the threshold passes avoid.
        base = preprune_hot_hosts(
            base, host_col, hot_min_rows=preprune_hot_min_rows
        )
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
