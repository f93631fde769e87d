"""RFC 9309 subset parser tests (reference surface: texting_robots via
crawler.rs:228-247, interop.rs:231-234)."""

from swspark.robots import parse_robots

BODY = """
# fixture robots
User-agent: SWSbot
Crawl-delay: 1.5
Disallow: /private/
Allow: /private/ok/
Disallow: /*.json$
Sitemap: https://h.test/sitemap.xml

User-agent: *
Disallow: /admin/
Crawl-delay: 9
"""


def test_group_selection_specific_ua():
    r = parse_robots(BODY, "SWSbot/1.0")
    assert r.crawl_delay == 1.5
    assert r.sitemaps == ["https://h.test/sitemap.xml"]


def test_group_selection_star_fallback():
    r = parse_robots(BODY, "OtherBot")
    assert r.crawl_delay == 9
    assert not r.allowed("/admin/x")
    assert r.allowed("/private/x")  # star group has no /private rule


def test_longest_match_allow_wins():
    r = parse_robots(BODY, "SWSbot")
    assert not r.allowed("/private/secret.html")
    assert r.allowed("/private/ok/fine.html")  # longer Allow wins
    assert r.allowed("/public/x")


def test_wildcard_and_anchor():
    r = parse_robots(BODY, "SWSbot")
    assert not r.allowed("/api/data.json")
    assert r.allowed("/api/data.json5")  # $ anchor


def test_empty_and_missing():
    r = parse_robots("", "SWSbot")
    assert r.allowed("/anything")
    assert r.crawl_delay is None


def test_multiple_uas_one_group():
    body = "User-agent: A\nUser-agent: B\nDisallow: /x/"
    assert not parse_robots(body, "B").allowed("/x/y")
    assert parse_robots(body, "C").allowed("/x/y")


def test_fixture_robots_roundtrip():
    from swspark.fixtures import generate_corpus

    c = generate_corpus("tiny")
    for _, row in c.robots.iterrows():
        r = parse_robots(row.body, "SWSbot")
        assert r.crawl_delay == row.crawl_delay
        assert len(r.sitemaps) == 1
        assert not r.allowed("/private/x")
        assert r.allowed("/articles/000001")
        # star group (with /admin/) must NOT apply to SWSbot
        assert r.allowed("/admin/x")
