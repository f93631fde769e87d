"""Versioned extraction specs — the engine's stand-in for sws Lua
scripts (SURVEY.md §2 A31-A33).

A spec bundles the two user hooks the reference exposes:

- ``accept_url(url, sitemap_kind) -> bool``  (scrapable.rs:20,
  scraper.rs:208-227; sitemap_kind is "INDEX", "URLSET", or None for
  non-sitemap contexts, matching CrawlingContext:sitemap());
- ``scrap_page(html, url) -> (records, urls)`` — the flatMap UDTF
  surface (scraper.rs:193-206): 0..n string records (sendRecord,
  interop.rs:301-307) and 0..n discovered URLs (sendUrl,
  interop.rs:317-324).

The two built-in specs are line-by-line translations of the shipped
example scripts (examples/urbandict.lua, examples/fandom_mmh7.lua),
retargeted at the fixture hosts. Specs are plain Python and versioned
by name; at cluster scale the spec is broadcast with the UDF closure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from swspark.extract.dom import Html

Records = list[list[str]]
Urls = list[str]

# Locale-independent %B month names (chrono's Date parse is always
# English; interop.rs:204-222).
_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December",
        ]
    )
}
_MONTHS_BY_NUM = {v: k for k, v in _MONTHS.items()}


def parse_date(s: str, fmt: str) -> tuple[int, int, int]:
    """Minimal chrono-NaiveDate-compatible strptime for the specifiers
    the reference scripts use: %B %d %Y %m (interop.rs:204-222).
    Locale-independent by construction."""
    pat = re.escape(fmt)
    pat = pat.replace(r"%B", r"(?P<B>[A-Za-z]+)")
    pat = pat.replace(r"%d", r"(?P<d>\d{1,2})")
    pat = pat.replace(r"%m", r"(?P<m>\d{1,2})")
    pat = pat.replace(r"%Y", r"(?P<Y>\d{4})")
    m = re.fullmatch(pat, s.strip())
    if not m:
        raise ValueError(f"date {s!r} does not match format {fmt!r}")
    g = m.groupdict()
    month = _MONTHS[g["B"]] if g.get("B") else int(g.get("m") or 1)
    return int(g["Y"]), month, int(g.get("d") or 1)


def format_date(ymd: tuple[int, int, int], fmt: str) -> str:
    y, mo, d = ymd
    out = fmt.replace("%Y", f"{y:04d}").replace("%m", f"{mo:02d}")
    out = out.replace("%d", f"{d:02d}").replace("%B", _MONTHS_BY_NUM[mo])
    return out


def sws_date(s: str, in_fmt: str, out_fmt: str) -> str:
    """sws.Date(s, in_fmt):format(out_fmt) (interop.rs:204-222)."""
    return format_date(parse_date(s, in_fmt), out_fmt)


@dataclass(frozen=True)
class ExtractionSpec:
    name: str
    version: int
    accept_url: Callable[[str, str | None], bool]
    scrap_page: Callable[[Html, str], tuple[Records, Urls]]
    # Output field names, fixed arity (the reference's CSV is headerless
    # and variable-arity — writer.rs:9-12; we pin the schema instead).
    fields: tuple[str, ...] = field(default=())


# --------------------------------------------------------------------
# urbandict spec — translation of examples/urbandict.lua
# --------------------------------------------------------------------

_AFTER_CLOSING_A = re.compile(r".*</a>\s*(.*?)\\?\s*$", re.DOTALL)


def _urbandict_accept(url: str, sitemap_kind: str | None) -> bool:
    # urbandict.lua:5-11 — only follow term= pages out of urlsets.
    if sitemap_kind == "URLSET":
        return "term=" in url
    return True


def _first(it):
    for x in it:
        return x
    return None


def _squash_newlines(s: str) -> str:
    # :gsub("[\n\r]+", " ") — urbandict.lua:25-31
    return re.sub(r"[\n\r]+", " ", s)


def _urbandict_scrap(page: Html, url: str) -> tuple[Records, Urls]:
    records: Records = []
    # enumerate() is 1-based in the Lua surface.
    for def_index, d in enumerate(page.select("section .definition"), start=1):
        from swspark.extract.selectors import select

        word_el = _first(select(d, "h1 a.word")) or _first(select(d, "h2 a.word"))
        if word_el is None:
            continue  # goto continue — urbandict.lua:19-21
        word = word_el.inner_html()

        contributor = _first(select(d, ".contributor"))
        if contributor is None:
            continue
        m = _AFTER_CLOSING_A.match(contributor.inner_html())
        if not m:
            continue
        date = sws_date(m.group(1), "%B %d, %Y", "%Y-%m-%d")

        meaning_el = _first(select(d, ".meaning"))
        example_el = _first(select(d, ".example"))
        if meaning_el is None or example_el is None:
            continue
        meaning = _squash_newlines(meaning_el.inner_text())
        example = _squash_newlines(example_el.inner_text())

        records.append([word, str(def_index), date, meaning, example])
    return records, []


URBANDICT = ExtractionSpec(
    name="urbandict",
    version=1,
    accept_url=_urbandict_accept,
    scrap_page=_urbandict_scrap,
    fields=("word", "def_index", "date", "meaning", "example"),
)


# --------------------------------------------------------------------
# fandom spec — translation of examples/fandom_mmh7.lua
# --------------------------------------------------------------------

_CREATURE_CAT = re.compile(r"Heroes VII (.+?) creatures")


def _origin(url: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", url)
    return m.group(1) if m else ""


def _fandom_scrap(page: Html, url: str) -> tuple[Records, Urls]:
    from swspark.extract.selectors import select

    records: Records = []
    urls: Urls = []
    categories = _first(page.select("nav#articleCategories"))
    if categories is None:
        return records, urls
    for cat_el in select(categories, "li span a"):
        cat = cat_el.inner_text()
        if cat == "Heroes VII factions":
            # scrapFaction — fandom_mmh7.lua:23-28 (sendUrl discovery)
            for creature in page.select("div.tabber table td a:last-of-type"):
                href = creature.attr("href")
                if href is not None:
                    urls.append(_origin(url) + href)
        elif _CREATURE_CAT.match(cat):
            rec = _fandom_scrap_creature(page)
            if rec is not None:
                records.append(rec)
    return records, urls


def _fandom_scrap_creature(page: Html) -> list[str] | None:
    from swspark.extract.selectors import select

    title = _first(page.select("aside h2.pi-item.pi-title"))
    if title is None:
        return None
    creature = title.inner_text()

    row: dict[str, str] = {}
    for data in page.select("aside section.pi-group div.pi-data"):
        label_el = _first(select(data, "h3.pi-data-label"))
        value_el = _first(select(data, "div.pi-data-value"))
        if label_el is None or value_el is None:
            continue
        label = label_el.inner_text()
        value = value_el.inner_text()
        if label == "Upgraded":
            upgraded = _first(select(data, "div.pi-data-value img[alt=Yes]"))
            value = "true" if upgraded is not None else "false"
        row[label] = value.strip()

    for section in page.select("aside section.pi-group section.pi-item"):
        labels = [e.inner_text() for e in select(section, "section.pi-smart-group-head h3")]
        values = [
            e.inner_text().strip()
            for e in select(section, "section.pi-smart-group-body div.pi-smart-data-value")
        ]
        for lab, val in zip(labels, values):
            row[lab] = val

    required = ("Faction", "Tier/level", "Attack", "Defense", "Hit Points",
                "Damage", "Initiative")
    if any(k not in row for k in required):
        # Lua would raise on pushField(nil) → scrape error (SkipAndLog)
        return None
    return [
        row["Faction"],
        creature,
        row["Tier/level"],
        row.get("Upgraded", "N/A"),
        row.get("Size", "N/A"),
        row.get("Attack type", "N/A"),
        row.get("Range", "N/A"),
        row.get("Dwelling", "N/A"),
        row.get("Cost per unit", "N/A"),
        row.get("Growth", "N/A"),
        row["Attack"],
        row["Defense"],
        row["Hit Points"],
        row["Damage"],
        row["Initiative"],
        row.get("Speed", "N/A"),
        row.get("Morale", "N/A"),
        row.get("Destiny", "N/A"),
    ]


FANDOM = ExtractionSpec(
    name="fandom",
    version=1,
    accept_url=lambda url, kind: True,
    scrap_page=_fandom_scrap,
    fields=(
        "faction", "creature", "tier", "upgraded", "size", "attack_type",
        "range", "dwelling", "cost_per_unit", "growth", "attack", "defense",
        "hit_points", "damage", "initiative", "speed", "morale", "destiny",
    ),
)


# --------------------------------------------------------------------
# fulltext spec — whole-document inner_text (the byte-identity probe)
# --------------------------------------------------------------------


def _fulltext_scrap(page: Html, url: str) -> tuple[Records, Urls]:
    return [[page.root.inner_text()]], []


FULLTEXT = ExtractionSpec(
    name="fulltext",
    version=1,
    accept_url=lambda url, kind: True,
    scrap_page=_fulltext_scrap,
    fields=("text",),
)


SPECS: dict[str, ExtractionSpec] = {
    s.name: s for s in (URBANDICT, FANDOM, FULLTEXT)
}
