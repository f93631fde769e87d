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

# Locale-independent month/weekday names (chrono's Date parse/format
# is always English; interop.rs:204-222).
_MONTH_NAMES = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
_MONTHS = {m: i + 1 for i, m in enumerate(_MONTH_NAMES)}
_MONTHS_ABBR = {m[:3]: i + 1 for i, m in enumerate(_MONTH_NAMES)}
_MONTHS_BY_NUM = {v: k for k, v in _MONTHS.items()}
_WEEKDAY_NAMES = [
    "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
    "Saturday", "Sunday",
]

# chrono-NaiveDate strftime vocabulary (interop.rs:204-222 delegates
# the full chrono surface): date-bearing specifiers, week/ISO-week
# fields, plus parse-and-ignore time fields, as
# NaiveDate::parse_from_str does
_PARSE_TOKENS: dict[str, str] = {
    "Y": r"(-?\d{4})",
    "y": r"(\d{2})",
    "C": r"(\d{1,2})",  # century: year = 100*%C + %y
    "m": r"(\d{1,2})",
    "d": r"(\d{1,2})",
    "e": r"\s?(\d{1,2})",
    "B": r"([A-Za-z]+)",
    "b": r"([A-Za-z]+)",
    "h": r"([A-Za-z]+)",  # alias of %b
    "j": r"(\d{1,3})",
    "a": r"([A-Za-z]+)",
    "A": r"([A-Za-z]+)",
    # week-of-year + weekday numbers (resolvable date representations)
    "U": r"(\d{1,2})",  # Sunday-based week 00-53
    "W": r"(\d{1,2})",  # Monday-based week 00-53
    "u": r"(\d)",       # ISO weekday 1=Mon..7=Sun
    "w": r"(\d)",       # weekday 0=Sun..6=Sat
    "V": r"(\d{1,2})",  # ISO week 01-53
    "G": r"(-?\d{4})",  # ISO week-year
    "g": r"(\d{2})",    # ISO week-year mod 100
    # time-of-day: parsed then discarded (NaiveDate semantics)
    "H": r"(\d{1,2})",
    "M": r"(\d{1,2})",
    "S": r"(\d{1,2})",
}
# compound specifiers expand before tokenization, like chrono
_COMPOUND = {"D": "%m/%d/%y", "F": "%Y-%m-%d", "v": "%e-%b-%Y",
             "T": "%H:%M:%S", "R": "%H:%M", "x": "%m/%d/%y",
             "c": "%a %b %e %H:%M:%S %Y"}
# padding-override flags (chrono: %-d no pad, %0e zero pad, %_m space
# pad); parsing is width-flexible either way, formatting honors them
_PAD_FLAGS = {"-": None, "0": "0", "_": " "}


def _split_spec(fmt: str, i: int) -> tuple[str | None, str, int]:
    """At fmt[i]=='%', return (pad_flag, spec_letter, next_index)."""
    j = i + 1
    flag = None
    if j < len(fmt) and fmt[j] in _PAD_FLAGS:
        flag = fmt[j]
        j += 1
    if j >= len(fmt):
        raise ValueError(f"dangling %% in format {fmt!r}")
    return flag, fmt[j], j + 1


def _expand_fmt(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt) and fmt[i + 1] in _COMPOUND:
            out.append(_COMPOUND[fmt[i + 1]])
            i += 2
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


import functools


@functools.lru_cache(maxsize=256)
def _compile_date_fmt(fmt: str) -> tuple[re.Pattern, tuple[str, ...]]:
    fmt = _expand_fmt(fmt)
    pat_parts: list[str] = []
    groups: list[str] = []  # spec letter per capture group, in order
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            flag, spec, nxt = _split_spec(fmt, i)
            if spec == "%" and flag is None:
                pat_parts.append(re.escape("%"))
            elif spec in _PARSE_TOKENS:
                pat_parts.append(_PARSE_TOKENS[spec])
                groups.append(spec)
            else:
                raise ValueError(f"unsupported date specifier %{spec}")
            i = nxt
        else:
            pat_parts.append(re.escape(c))
            i += 1
    return re.compile("".join(pat_parts)), tuple(groups)


def _month_from_name(v: str) -> int:
    """chrono accepts the exact full name or the exact 3-letter
    abbreviation for ALL of %B/%b/%h when parsing (no 'Sept')."""
    t = v.title()
    if t in _MONTHS:
        return _MONTHS[t]
    if len(t) == 3 and t in _MONTHS_ABBR:
        return _MONTHS_ABBR[t]
    raise ValueError(f"unknown month name {v!r}")


def _weekday_from_name(v: str) -> int:
    """Monday=0..Sunday=6; %a and %A both accept full or abbreviated
    names when parsing, like chrono."""
    t = v.title()
    if t in _WEEKDAY_NAMES:
        return _WEEKDAY_NAMES.index(t)
    abbr = [w[:3] for w in _WEEKDAY_NAMES]
    if len(t) == 3 and t in abbr:
        return abbr.index(t)
    raise ValueError(f"unknown weekday {v!r}")


def _week_based_date(year: int, week: int, weekday_mon0: int, sunday_first: bool):
    """Resolve (%Y, %U-or-%W, weekday) the way strptime does: week 0 =
    days before the year's first Sunday (resp. Monday)."""
    import datetime as _dt

    jan1 = _dt.date(year, 1, 1)
    if sunday_first:
        wd = (weekday_mon0 + 1) % 7          # Sunday=0..Saturday=6
        jan1_wd = (jan1.weekday() + 1) % 7
    else:
        wd = weekday_mon0                     # Monday=0..Sunday=6
        jan1_wd = jan1.weekday()
    # first day in the year with the target weekday; anchor the week
    # arithmetic on ITS strftime week number (0 or 1)
    first = jan1 + _dt.timedelta(days=(wd - jan1_wd) % 7)
    fmt = "%U" if sunday_first else "%W"
    w_first = int(first.strftime(fmt))
    d = first + _dt.timedelta(weeks=week - w_first)
    if d.year != year or int(d.strftime(fmt)) != week:
        raise ValueError(f"week {week} out of range for {year}")
    return d


def parse_date(s: str, fmt: str) -> tuple[int, int, int]:
    """chrono-NaiveDate-compatible strptime (interop.rs:204-222):
    %Y %y %C %m %d %e %B %b %h %j %a %A %u %w %U %W %V %G %g
    %H %M %S %D %F %v %T %R %x %c %% and the %-/%0/%_ padding flags.
    Locale-independent by construction; like NaiveDate, time-of-day
    fields parse but don't affect the result, %y maps 00-68 -> 20xx /
    69-99 -> 19xx (unless %C supplies the century), and the date
    resolves from the most specific complete representation —
    (y,m,d) > (y,%j) > ISO (%G,%V,weekday) > (%Y,%U/%W,weekday) —
    with every supplied field validated against the result, chrono's
    Parsed::to_naive_date semantics. Compiled formats are LRU-cached
    (the scrape hot path reuses one format per spec)."""
    rx, groups = _compile_date_fmt(fmt)
    m = rx.fullmatch(s.strip())
    if not m:
        raise ValueError(f"date {s!r} does not match format {fmt!r}")

    vals = dict(zip(groups, m.groups()))  # last occurrence wins (chrono)
    year = month = day = None
    if "Y" in vals:
        year = int(vals["Y"])
    elif "y" in vals:
        yy = int(vals["y"])
        if "C" in vals:
            year = 100 * int(vals["C"]) + yy
        else:
            year = 2000 + yy if yy <= 68 else 1900 + yy
    if "B" in vals:
        month = _month_from_name(vals["B"])
    for k in ("b", "h"):
        if k in vals:
            month = _month_from_name(vals[k])
    if "m" in vals:
        month = int(vals["m"])
    if "d" in vals:
        day = int(vals["d"])
    if "e" in vals:
        day = int(vals["e"])

    # weekday from any numeric/name field (for week-based resolution)
    weekday = None  # Monday=0..Sunday=6
    if "A" in vals:
        weekday = _weekday_from_name(vals["A"])
    if "a" in vals:
        weekday = _weekday_from_name(vals["a"])
    if "u" in vals:
        u = int(vals["u"])
        if not 1 <= u <= 7:
            raise ValueError(f"ISO weekday {u} out of range 1-7")
        weekday = u - 1
    if "w" in vals:
        w = int(vals["w"])
        if not 0 <= w <= 6:
            raise ValueError(f"weekday {w} out of range 0-6")
        weekday = (w + 6) % 7

    iso_year = None
    if "G" in vals:
        iso_year = int(vals["G"])
    elif "g" in vals:
        gg = int(vals["g"])
        iso_year = 2000 + gg if gg <= 68 else 1900 + gg

    import datetime as _dt

    # resolution order = chrono Parsed::to_naive_date
    if year is not None and month is not None and day is not None:
        d = _dt.date(year, month, day)  # raises on impossible dates
    elif year is not None and "j" in vals:
        d = _dt.date(year, 1, 1) + _dt.timedelta(days=int(vals["j"]) - 1)
        if d.year != year:
            raise ValueError(f"ordinal {vals['j']} out of range for {year}")
    elif iso_year is not None and "V" in vals and weekday is not None:
        d = _dt.date.fromisocalendar(iso_year, int(vals["V"]), weekday + 1)
    elif year is not None and ("U" in vals or "W" in vals) and weekday is not None:
        sunday_first = "U" in vals
        week = int(vals["U" if sunday_first else "W"])
        d = _week_based_date(year, week, weekday, sunday_first)
    else:
        if year is None:
            raise ValueError(f"format {fmt!r} carries no year")
        raise ValueError(f"format {fmt!r} does not determine month/day")

    # validate EVERY supplied field against the resolved date
    checks = {
        "Y": lambda: d.year == int(vals["Y"]),
        "y": lambda: d.year % 100 == int(vals["y"]),
        "C": lambda: d.year // 100 == int(vals["C"]),
        "m": lambda: d.month == int(vals["m"]),
        "d": lambda: d.day == int(vals["d"]),
        "e": lambda: d.day == int(vals["e"]),
        "B": lambda: d.month == _month_from_name(vals["B"]),
        "b": lambda: d.month == _month_from_name(vals["b"]),
        "h": lambda: d.month == _month_from_name(vals["h"]),
        "j": lambda: d.timetuple().tm_yday == int(vals["j"]),
        "a": lambda: d.weekday() == _weekday_from_name(vals["a"]),
        "A": lambda: d.weekday() == _weekday_from_name(vals["A"]),
        "u": lambda: d.isoweekday() == int(vals["u"]),
        "w": lambda: (d.weekday() + 1) % 7 == int(vals["w"]),
        "U": lambda: int(d.strftime("%U")) == int(vals["U"]),
        "W": lambda: int(d.strftime("%W")) == int(vals["W"]),
        "V": lambda: d.isocalendar()[1] == int(vals["V"]),
        "G": lambda: d.isocalendar()[0] == int(vals["G"]),
        "g": lambda: d.isocalendar()[0] % 100 == int(vals["g"]),
    }
    for k in vals:
        chk = checks.get(k)
        if chk is not None and not chk():
            raise ValueError(f"field %{k}={vals[k]!r} inconsistent with {d}")
    return d.year, d.month, d.day


def format_date(ymd: tuple[int, int, int], fmt: str) -> str:
    """chrono NaiveDate::format — date-bearing specifiers (formatting
    a NaiveDate with time specifiers is an error in chrono too), plus
    the %-/%0/%_ padding-override flags."""
    import datetime as _dt

    y, mo, dd = ymd
    d = _dt.date(y, mo, dd)
    iso = d.isocalendar()
    fmt = _expand_fmt(fmt)
    # numeric specifiers: (value, default pad char, width)
    numeric: dict[str, tuple[int, str, int]] = {
        "Y": (y, "0", 4),
        "y": (y % 100, "0", 2),
        "C": (y // 100, "0", 2),
        "m": (mo, "0", 2),
        "d": (dd, "0", 2),
        "e": (dd, " ", 2),
        "j": (d.timetuple().tm_yday, "0", 3),
        "u": (d.isoweekday(), "0", 1),
        "w": ((d.weekday() + 1) % 7, "0", 1),
        "U": (int(d.strftime("%U")), "0", 2),
        "W": (int(d.strftime("%W")), "0", 2),
        "V": (iso[1], "0", 2),
        "G": (iso[0], "0", 4),
        "g": (iso[0] % 100, "0", 2),
    }
    out: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        flag, spec, nxt = _split_spec(fmt, i)
        if spec == "%" and flag is None:
            out.append("%")
        elif spec in numeric:
            val, pad, width = numeric[spec]
            pad = _PAD_FLAGS[flag] if flag is not None else pad
            s = str(val)
            if pad is not None and len(s) < width:
                s = pad * (width - len(s)) + s
            out.append(s)
        elif spec == "B":
            out.append(_MONTHS_BY_NUM[mo])
        elif spec in ("b", "h"):
            out.append(_MONTHS_BY_NUM[mo][:3])
        elif spec == "a":
            out.append(_WEEKDAY_NAMES[d.weekday()][:3])
        elif spec == "A":
            out.append(_WEEKDAY_NAMES[d.weekday()])
        else:
            raise ValueError(f"unsupported date format specifier %{spec}")
        i = nxt
    return "".join(out)


@functools.lru_cache(maxsize=65536)
def sws_date(s: str, in_fmt: str, out_fmt: str) -> str:
    """sws.Date(s, in_fmt):format(out_fmt) (interop.rs:204-222).
    Pure string->string, so memoized — corpus date strings repeat
    heavily (a few years of days across millions of pages)."""
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
    # Script-level crawler config (sws: `sws.seedSitemaps{...}` blocks
    # carry crawlerConfig; main.rs:120-150). Keys mirror CrawlConfig
    # fields (user_agent, wave_period, throttle, on_dl_error, ...).
    # Precedence: CLI flag > spec.config > engine default.
    config: dict | None = None


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
    from swspark.extract.selectors import select_first_multi

    records: Records = []
    # enumerate() is 1-based in the Lua surface.
    for def_index, d in enumerate(page.select("section .definition"), start=1):
        # one subtree walk for all five field selectors (r4 perf:
        # identical first-match semantics, pinned by golden tests)
        word_h1, word_h2, contributor, meaning_el, example_el = (
            select_first_multi(
                d, ("h1 a.word", "h2 a.word", ".contributor",
                    ".meaning", ".example"),
            )
        )
        word_el = word_h1 or word_h2
        if word_el is None:
            continue  # goto continue — urbandict.lua:19-21
        word = word_el.inner_html()

        if contributor is None:
            continue
        m = _AFTER_CLOSING_A.match(contributor.inner_html())
        if not m:
            continue
        date = sws_date(m.group(1), "%B %d, %Y", "%Y-%m-%d")

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


def load_spec_file(path: str) -> ExtractionSpec:
    """Load a user extraction spec from a Python file — the engine's
    `sws crawl -s my_script.lua` (scraper.rs:36-127, main.rs:105-154):
    arbitrary user scrape logic loaded at startup, no package edits.

    The file must define either ``SPEC`` (an ExtractionSpec) or a
    zero-arg ``get_spec()`` returning one. The module is deliberately
    NOT registered in sys.modules: cloudpickle then serializes its
    accept_url/scrap_page functions BY VALUE, so the broadcast UDF
    closure works on executors that never saw the file."""
    import importlib.util

    mspec = importlib.util.spec_from_file_location(
        f"_swspark_user_spec_{abs(hash(path))}", path
    )
    if mspec is None or mspec.loader is None:
        raise ValueError(f"cannot load spec file {path!r}")
    mod = importlib.util.module_from_spec(mspec)
    mspec.loader.exec_module(mod)
    obj = getattr(mod, "SPEC", None)
    if obj is None and hasattr(mod, "get_spec"):
        obj = mod.get_spec()
    if not isinstance(obj, ExtractionSpec):
        raise ValueError(
            f"{path!r} must define SPEC (ExtractionSpec) or get_spec()"
        )
    return obj
