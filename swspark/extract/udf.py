"""Vectorized Arrow UDF wrapping an extraction spec.

The spec's ``scrap_page`` is the reference's flatMap UDTF
(scraper.rs:193-206): page -> 0..n records + 0..n discovered URLs.
Here it becomes one Arrow-batched pandas UDF

    (url, html) -> struct(records array<array<string>>,
                          urls    array<string>,
                          error   string)

followed by dataframe-level ``explode`` — the idiomatic Spark shape
for a one-to-many generator. Parse errors are captured per-row into
``error`` so the caller can apply the reference's per-stage error
policy (OnError::{Fail, SkipAndLog}, config.rs:81-86) as a filter,
never a task failure.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from swspark.extract.dom import Html
from swspark.extract.specs import SPECS, ExtractionSpec

EXTRACT_RESULT_TYPE = StructType(
    [
        StructField("records", ArrayType(ArrayType(StringType()))),
        StructField("urls", ArrayType(StringType())),
        StructField("error", StringType()),
    ]
)


def extraction_schema(spec: ExtractionSpec) -> StructType:
    """Fixed output schema for a spec's records (the reference's CSV
    is headerless/untyped — writer.rs:9-12; we pin names instead)."""
    return StructType([StructField(f, StringType()) for f in spec.fields])


def make_extract_udf(spec: ExtractionSpec | str):
    """Build the Arrow pandas UDF for a spec (broadcast via closure)."""
    if isinstance(spec, str):
        spec = SPECS[spec]
    scrap = spec.scrap_page

    @F.pandas_udf(EXTRACT_RESULT_TYPE)
    def extract(url: pd.Series, html: pd.Series) -> pd.DataFrame:
        records_out, urls_out, errors_out = [], [], []
        for u, h in zip(url, html):
            try:
                if h is None:
                    raise ValueError("null html")
                doc = Html.parse_document(h)
                recs, urls = scrap(doc, u)
                records_out.append(recs)
                urls_out.append(urls)
                errors_out.append(None)
            except Exception as exc:  # scrape error -> policy column
                records_out.append(None)
                urls_out.append(None)
                errors_out.append(f"{type(exc).__name__}: {exc}")
        return pd.DataFrame(
            {"records": records_out, "urls": urls_out, "error": errors_out}
        )

    return extract


def apply_extraction(df, spec: ExtractionSpec | str, url_col: str = "url",
                     html_col: str = "html"):
    """pages df -> (records_df, discovered_urls_df, errors_df).

    records_df: one row per sendRecord, columns = url + spec.fields
    (explode of the records array, field names pinned).
    discovered_urls_df: one row per sendUrl (url, discovered_url) —
    the feedback edge (interop.rs:317-324, CountedTx scrapable.rs:123-144).
    errors_df: (url, error) for the OnError policy.
    """
    if isinstance(spec, str):
        spec = SPECS[spec]
    udf = make_extract_udf(spec)
    base = df.withColumn("_ex", udf(F.col(url_col), F.col(html_col)))

    rec = base.select(url_col, F.explode("_ex.records").alias("_r"))
    rec = rec.select(
        url_col,
        *[F.col("_r").getItem(i).alias(name) for i, name in enumerate(spec.fields)],
    )
    urls = base.select(
        url_col, F.explode("_ex.urls").alias("discovered_url")
    )
    errs = base.select(url_col, F.col("_ex.error").alias("error")).where(
        F.col("error").isNotNull()
    )
    return rec, urls, errs
