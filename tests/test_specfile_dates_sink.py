"""User-loadable spec files (A33 / `sws crawl -s script.lua`), the
chrono-strftime date surface (interop.rs:204-222), and CSV sink parity
(writer.rs:9-38: flexible arity, escape-disables-doublequote, stdout).
"""

import csv
import glob
import io
import os
import subprocess
import sys
import textwrap

import pytest

from swspark.extract.specs import format_date, parse_date, sws_date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_PAGES = os.path.join(REPO, "data", "fixture_pages.parquet")


# --- chrono strftime surface (expected values per chrono docs) --------


def test_parse_date_reference_formats():
    # the shipped example scripts' format (urbandict.lua)
    assert parse_date("September 5, 2015", "%B %d, %Y") == (2015, 9, 5)
    assert sws_date("September 5, 2015", "%B %d, %Y", "%Y-%m-%d") == "2015-09-05"


def test_parse_date_abbrev_and_padded():
    assert parse_date("5 Sep 2015", "%e %b %Y") == (2015, 9, 5)
    assert parse_date(" 5-Sep-2015", "%v") == (2015, 9, 5)
    assert parse_date("05/09/2015", "%d/%m/%Y") == (2015, 9, 5)


def test_parse_date_two_digit_year_chrono_mapping():
    # chrono: %y maps to 1969-2068
    assert parse_date("09/05/68", "%D") == (2068, 9, 5)
    assert parse_date("09/05/69", "%D") == (1969, 9, 5)


def test_parse_date_time_fields_ignored_like_naivedate():
    # NaiveDate::parse_from_str("2015-09-05 23:56:04", "%Y-%m-%d %H:%M:%S")
    assert parse_date("2015-09-05 23:56:04", "%Y-%m-%d %H:%M:%S") == (2015, 9, 5)
    assert parse_date("2015-09-05 23:56", "%F %R") == (2015, 9, 5)


def test_parse_date_ordinal():
    assert parse_date("2015-248", "%Y-%j") == (2015, 9, 5)
    with pytest.raises(ValueError):
        parse_date("2015-999", "%Y-%j")


def test_parse_date_weekday_validated():
    assert parse_date("Sat Sep 05 2015", "%a %b %d %Y") == (2015, 9, 5)
    with pytest.raises(ValueError):
        parse_date("Sun Sep 05 2015", "%a %b %d %Y")  # Sep 5 2015 was a Sat


def test_parse_date_errors():
    with pytest.raises(ValueError):
        parse_date("2015-02-30", "%Y-%m-%d")  # impossible date
    with pytest.raises(ValueError):
        parse_date("09-05", "%m-%d")  # no year
    with pytest.raises(ValueError):
        parse_date("x", "%Q")  # unsupported specifier


def test_format_date_surface():
    d = (2015, 9, 5)
    assert format_date(d, "%Y-%m-%d") == "2015-09-05"
    assert format_date(d, "%e-%b-%Y") == " 5-Sep-2015"
    assert format_date(d, "%a %A %j") == "Sat Saturday 248"
    assert format_date(d, "%y") == "15"
    assert format_date(d, "%D") == "09/05/15"
    assert format_date(d, "100%%") == "100%"
    with pytest.raises(ValueError):
        format_date(d, "%H:%M")  # NaiveDate has no time-of-day


# --- user spec file via CLI + stdout sink ------------------------------

USER_SPEC = textwrap.dedent(
    """
    from swspark.extract.specs import ExtractionSpec

    def _scrap(page, url):
        # one flexible-shape record per page, plain Python user logic
        return [[url, str(len(page.root.inner_text()))]], []

    SPEC = ExtractionSpec(
        name="user_counts",
        version=1,
        accept_url=lambda url, kind: True,
        scrap_page=_scrap,
        fields=("page_url", "n_text_chars"),
    )
    """
)


def test_cli_scrap_with_spec_file_to_stdout(tmp_path):
    spec_path = tmp_path / "my_spec.py"
    spec_path.write_text(USER_SPEC)
    r = subprocess.run(
        [sys.executable, "-m", "swspark", "scrap",
         "--spec-file", str(spec_path),
         "--pages", FIXTURE_PAGES, "--cpus", "4"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = list(csv.reader(io.StringIO(r.stdout)))
    rows = [row for row in rows if row]
    import pandas as pd

    n_pages = len(pd.read_parquet(FIXTURE_PAGES))
    assert len(rows) == n_pages
    # url + page_url + n_text_chars, and the count is a number
    assert all(len(row) == 3 and row[2].isdigit() for row in rows)


# --- flexible-arity CSV + escape semantics ------------------------------


def test_write_csv_flexible_and_escape(spark, tmp_path):
    from swspark.sink import write_csv_flexible

    df = spark.createDataFrame(
        [(["a", 'va"l', "x,y"],), (["only-one"],), (["1", "2", "3", "4"],)],
        "fields array<string>",
    )
    out1 = str(tmp_path / "dq")
    write_csv_flexible(df, out1)  # default: double-quote escaping
    lines = set()
    for f in glob.glob(os.path.join(out1, "part-*")):
        with open(f) as fh:
            lines |= {ln.rstrip("\n") for ln in fh if ln.strip()}
    assert lines == {'a,"va""l","x,y"', "only-one", "1,2,3,4"}

    out2 = str(tmp_path / "esc")
    write_csv_flexible(df, out2, escape="\\")  # writer.rs:28-38
    lines = set()
    for f in glob.glob(os.path.join(out2, "part-*")):
        with open(f) as fh:
            lines |= {ln.rstrip("\n") for ln in fh if ln.strip()}
    # escape mode: the quote char is backslash-escaped, never doubled
    # (python leaves the field unquoted where rust-csv also quotes it;
    # escape-aware readers parse both to the same value)
    assert lines == {'a,va\\"l,"x,y"', "only-one", "1,2,3,4"}
    parsed = {tuple(r) for r in csv.reader(
        sorted(lines), doublequote=False, escapechar="\\")}
    assert ("a", 'va"l', "x,y") in parsed
