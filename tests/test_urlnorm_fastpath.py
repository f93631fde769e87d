"""Equivalence pin for the r6 canonicalize fast path.

canonicalize() dispatches plain absolute URLs through a string-slice
fast path (one gate regex instead of ~8 regex executions per row).
These tests prove the dispatch is invisible: for every URL — gated or
not, adversarial or random — the two-tier canonicalize returns exactly
what the pre-r6 general regex pipeline returns.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from swspark.urlnorm import _canonicalize_general, canonicalize

ADVERSARIAL = [
    # plain fast-path shapes
    "https://h0.example.test/p/123",
    "http://example.com",
    "HTTPS://UPPER.Example.COM/Path/Query?x=1&y=2",
    "ftp://files.example.org/a/b/c.txt",
    "https://h.test?x=1",            # query with no path
    "https://h.test/",
    "https://x.y/p?q=define.php?term=X",
    "a://b/c",
    "scheme+x-y.z://host/p",
    # general-path shapes (ports, userinfo, fragments, dots, malformed)
    "https://example.com:443/x",
    "http://example.com:80/x",
    "http://example.com:8080/x",
    "https://user:pw@example.com/x",
    "https://user@example.com:444/x",
    "https://example.com./x",
    "https://example.com.",
    "https://example.com/x#frag",
    "https://example.com#frag",
    "https://example.com/x#a#b",
    "  https://spaced.example.com/x  ",
    "https://h.test/p#",
    "mailto:someone@example.com",
    "no-scheme-at-all",
    "://missing.scheme/x",
    "https:///empty-host",
    "https://",
    "",
    "https://h.test/x\n",
    "https://h.test\n",
    "https://h:1:2@weird/x",
    "http://[::1]:8080/x",
    "http://[::1]/x",
    "1http://digit.scheme/x",
    "https://h.test/a b c",
    "https://h.test/%20%3f?#f",
    "https://h.test:0/x",
    "https://h.test:/x",
    "https://h.test:x/x",
    "HTTP://EX.COM:80/x",
    "hTtPs://Ex.Com:443/x",
]


def _random_urls(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alphabet = string.ascii_letters + string.digits + ":/?#@.%&=+-_~ "
    out = []
    for _ in range(n):
        if rng.random() < 0.5:
            # url-shaped
            scheme = rng.choice(["http", "https", "ftp", "HTTP", "a+b-c."])
            host = "".join(
                rng.choice(string.ascii_letters + string.digits + ".-@:")
                for _ in range(rng.randint(0, 12))
            )
            path = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 16))
            )
            out.append(f"{scheme}://{host}/{path}" if rng.random() < 0.7
                       else f"{scheme}://{host}{path}")
        else:
            out.append("".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 24))
            ))
    return out


def _assert_equivalent(spark, urls: list[str]) -> None:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = df.select(
        "url",
        canonicalize(F.col("url")).alias("two_tier"),
        _canonicalize_general(F.trim(F.col("url"))).alias("reference"),
    ).collect()
    diffs = [
        (r.url, r.two_tier, r.reference)
        for r in got
        if r.two_tier != r.reference
    ]
    assert not diffs, f"fast path diverges on {len(diffs)} urls: {diffs[:5]}"


def test_canonicalize_fastpath_adversarial(spark):
    _assert_equivalent(spark, ADVERSARIAL)


def test_canonicalize_fastpath_random_fuzz(spark):
    _assert_equivalent(spark, _random_urls(3000))
