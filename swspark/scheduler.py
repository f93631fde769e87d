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
