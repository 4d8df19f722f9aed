"""Text column functions: slugify, URL validation, watermark text.

Pure ``pyspark.sql.functions`` expressions — JVM-side, whole-stage
codegen friendly, no Python in the hot path.

Reference parity:
  - slugify: new_document_actions.py:30 (``slugify(document.name)``)
  - URL validation: new_document_actions.py:79 (pydantic AnyHttpUrl)
  - watermark text: pdf_conversion.py:109 (generate_watermark_text)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scheme://host with a non-empty host; mirrors what pydantic's AnyHttpUrl
# accepts at the granularity the pipeline cares about (http/https only).
_HTTP_URL_RE = r"^https?://[^\s/$.?#][^\s]*$"


def slugify_col(name: Column) -> Column:
    """ASCII slug: lowercase, non-alphanumeric runs -> '-', trim dashes.

    Matches python-slugify behaviour for ASCII input (the reference calls
    ``slugify(document.name)``); non-ASCII letters are dropped rather than
    transliterated (documented divergence — transliteration tables are not
    expressible as a builtin; a Pandas-UDF variant can be swapped in where
    exact parity on non-ASCII names matters).

    DuckDB oracle equivalent:
        trim(regexp_replace(lower(x), '[^a-z0-9]+', '-', 'g'), '-')
    """
    slug = F.regexp_replace(F.lower(name), r"[^a-z0-9]+", "-")
    return F.regexp_replace(slug, r"^-+|-+$", "")


def valid_http_url(url: Column) -> Column:
    """Boolean: is this a plausible AnyHttpUrl (http/https, non-empty host)."""
    return url.isNotNull() & url.rlike(_HTTP_URL_RE)


def watermark_text_col(url: Column, date: Column) -> Column:
    """The provenance watermark text added to converted PDFs.

    ``date`` is a date/timestamp column; formatted as '01 January 2023'
    to match ``date.strftime('%d %B %Y')`` in the reference.
    """
    date_str = F.date_format(date, "dd MMMM yyyy")
    return F.concat(
        F.lit("Original publicly accessible source: "),
        url,
        F.lit(".\n\nThis PDF was created by Climate Policy Radar (climatepolicyradar.org) on "),
        date_str,
        F.lit(
            ".\n\nFor non-commercial use only. Reach out to us at "
            "support@climatepolicyradar.org if you have any enquiries."
        ),
    )
