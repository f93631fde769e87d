"""robots.txt parsing + vectorized politeness checks.

The reference delegates to the ``texting_robots`` crate
(crawler.rs:228-247): build a Robot for the configured User-Agent,
exposing ``allowed(url)``, ``delay`` (Crawl-delay) and ``sitemaps``.
This module reimplements that surface as a pure-Python RFC 9309
subset parser applied per-host:

- group selection: longest user-agent token match, ``*`` fallback;
- path rules: ``*`` wildcard and ``$`` end anchor, longest-pattern
  (most-specific) wins, Allow wins ties (RFC 9309 §2.2.2);
- ``Crawl-delay`` (non-RFC, honored like texting_robots) and global
  ``Sitemap:`` lines (robots-seed mode, crawler.rs:347-365).

Unlike sws — where robots ``allowed`` is opt-in for scripts
(interop.rs:231-234) and never auto-applied — this engine applies it
during scheduling (north rule makes politeness first-class). Parsed
rules live in a small per-host table; the frontier joins it broadcast
and the match runs in a vectorized pandas UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from swspark import urlnorm


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts)
    return re.compile("^" + rx + ("$" if anchored else ""))


@dataclass
class RobotRules:
    """Parsed rules for one (host, user-agent) pair. Picklable —
    shipped to executors inside UDF closures/broadcasts."""

    # (is_allow, pattern_len, compiled) sorted by pattern_len desc
    rules: list[tuple[bool, int, re.Pattern]] = field(default_factory=list)
    crawl_delay: float | None = None
    sitemaps: list[str] = field(default_factory=list)
    # (is_allow, pattern) in the same precedence order — the
    # rules-as-data form shipped through DataFrames (no pickled dict)
    raw: list[tuple[bool, str]] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        if not path:
            path = "/"
        for is_allow, _plen, rx in self.rules:
            if rx.match(path):
                return is_allow
        return True  # no match -> allowed (RFC 9309 §2.2.2)


def parse_robots(body: str, user_agent: str = "SWSbot") -> RobotRules:
    """Parse a robots.txt for the given product token."""
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, str]], float | None]] = []
    sitemaps: list[str] = []

    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    cur_delay: float | None = None
    in_group_body = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_group_body = False

    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val or key == "disallow":
                # empty Disallow = allow everything (no rule)
                if val:
                    cur_rules.append((key, val))
        elif key == "crawl-delay":
            in_group_body = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "sitemap":
            sitemaps.append(val)
        else:
            in_group_body = True  # unknown directive: part of group body
    flush()

    # pick the group with the longest matching UA token; '*' fallback
    best: tuple[int, list[tuple[str, str]], float | None] | None = None
    star: tuple[list[tuple[str, str]], float | None] | None = None
    for agents, rules, delay in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = (rules, delay)
            elif a in ua:
                # one-directional: the robots product token must be a
                # substring of the configured UA (RFC 9309 §2.2.1 /
                # texting_robots). The reverse direction would let
                # 'User-agent: SWSbot-Special' capture plain SWSbot.
                if best is None or len(a) > best[0]:
                    best = (len(a), rules, delay)
    if best is not None:
        rules, delay = best[1], best[2]
    elif star is not None:
        rules, delay = star
    else:
        rules, delay = [], None

    compiled = [
        (key == "allow", len(pattern), _pattern_to_regex(pattern), pattern)
        for key, pattern in rules
    ]
    compiled.sort(key=lambda t: (-t[1], not t[0]))
    return RobotRules(
        rules=[(a, ln, rx) for a, ln, rx, _p in compiled],
        crawl_delay=delay,
        sitemaps=sitemaps,
        raw=[(a, p) for a, _ln, _rx, p in compiled],
    )


ROBOTS_RULES_TYPE = StructType(
    [
        StructField("crawl_delay", DoubleType()),
        StructField("sitemaps", ArrayType(StringType())),
        StructField(
            "rules",
            ArrayType(
                StructType(
                    [
                        StructField("allow", BooleanType()),
                        StructField("pattern", StringType()),
                    ]
                )
            ),
        ),
    ]
)


def build_robots_rules_table(
    robots: DataFrame, user_agent: str = "SWSbot"
) -> DataFrame:
    """Fully distributed robots layer: robots(host, body) ->
    (host, crawl_delay, sitemaps, rules) with rules kept AS DATA
    (precedence-ordered array of (allow, pattern) structs).

    Nothing is collected to the driver and nothing host-cardinality is
    pickled — at 10^7 hosts the rules stay a DataFrame the frontier
    joins by host (AQE broadcasts it while it fits, shuffle-joins it
    beyond that); matching runs in a vectorized pandas UDF over the
    joined rules column (make_rules_match_udf)."""

    @F.pandas_udf(ROBOTS_RULES_TYPE)
    def parse_udf(body: pd.Series) -> pd.DataFrame:
        delays, sms, rules = [], [], []
        for b in body:
            r = parse_robots(b or "", user_agent)
            delays.append(r.crawl_delay)
            sms.append(r.sitemaps)
            rules.append(
                [{"allow": a, "pattern": p} for a, p in r.raw]
            )
        return pd.DataFrame(
            {"crawl_delay": delays, "sitemaps": sms, "rules": rules}
        )

    return robots.select("host", parse_udf(F.col("body")).alias("m")).select(
        "host", "m.crawl_delay", "m.sitemaps", "m.rules"
    )


def compile_raw_rules(
    raw, crawl_delay: float | None = None
) -> RobotRules:
    """Rehydrate a matcher from the rules-as-data form (an array of
    {allow, pattern} structs, already precedence-ordered) — used to
    hand user hooks a ``robot()`` handle inside Arrow UDF batches
    (interop.rs:325-329)."""
    compiled = [
        (bool(r["allow"]), len(r["pattern"]), _pattern_to_regex(r["pattern"]))
        for r in (raw if raw is not None else [])
    ]
    return RobotRules(
        rules=compiled,
        crawl_delay=crawl_delay,
        raw=[(bool(r["allow"]), r["pattern"]) for r in (raw or [])],
    )


def make_rules_match_udf():
    """Vectorized (path, rules) -> allowed. Regexes are compiled once
    per distinct pattern per Arrow batch (patterns repeat heavily
    because a host's rules ride every row of that host)."""

    @F.pandas_udf("boolean")
    def allowed(path: pd.Series, rules: pd.Series) -> pd.Series:
        cache: dict[str, re.Pattern] = {}
        out = []
        for p, rl in zip(path, rules):
            if rl is None or len(rl) == 0:
                out.append(True)  # no robots.txt -> no restrictions
                continue
            p = p or "/"
            verdict = True  # no match -> allowed (RFC 9309 §2.2.2)
            for r in rl:  # already precedence-ordered
                pat = r["pattern"]
                rx = cache.get(pat)
                if rx is None:
                    rx = cache[pat] = _pattern_to_regex(pat)
                if rx.match(p):
                    verdict = bool(r["allow"])
                    break
            out.append(verdict)
        return pd.Series(out)

    return allowed


def robots_filter_distributed(
    df: DataFrame,
    rules_table: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Filter to robots-allowed rows via a by-host join against the
    rules-as-data table — the scale path (no driver collect)."""
    match = make_rules_match_udf()
    path = urlnorm.url_path_query(F.col(url_col))
    joined = df.join(
        rules_table.select(host_col, "rules"), host_col, "left"
    )
    return joined.where(match(path, F.col("rules"))).drop("rules")
