"""Out-of-engine ingest shims producing DataFrames (SURVEY §2.1 S9/S10).

The reference fetches two non-tabular feeds and turns them into pandas frames:
a camera-archive HTML directory listing (rca_data_tools/qaqc/visual_data.py:
40-83 — BeautifulSoup over the rawdata index, one page per day) and the HITL
QA/QC log spreadsheet (rca_data_tools/qaqc/notes.py:52-63 — worksheets
transposed, ``Unnamed`` columns dropped, comma→dot cleanup). Both are ingest
steps, not queries: fetching stays outside the engine; this module turns
already-fetched payloads into well-typed DataFrames that the downstream
operators (A1/A2 pivot counts, P9 substring filters, top-1 note selection)
consume.

Scale shape: the camera corpus is many small pages (days × cameras), so the
parse distributes as an Arrow ``mapInPandas`` over a (page, html) DataFrame —
one task per batch of pages, no driver-side loop. The HITL sheet is a
config-sized dimension (like the S8 status lookup) and is built driver-side
by design.

Stdlib only: the runtime has neither bs4 nor humanfriendly, so the anchor-tag
walk is a regex over the listing markup and the size parser is a small
decimal/binary-unit table with the same semantics the reference relies on
(humanfriendly: decimal k=1000, binary KiB=1024; result reported in MiB).
"""

from __future__ import annotations

import datetime as dt
import math
import re

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# <a ... href="...CAM...">name</a> trailing-text — the listing rows the
# reference selects with soup.find_all("a", href=lambda h: "CAM" in h).
_ANCHOR_RE = re.compile(
    r"<a\b[^>]*href=\"(?P<href>[^\"]*CAM[^\"]*)\"[^>]*>(?P<name>.*?)</a>(?P<tail>[^<]*)",
    re.IGNORECASE | re.DOTALL,
)

_SIZE_UNITS_MB = {
    "": 1 / (1024 * 1024),
    "b": 1 / (1024 * 1024),
    "k": 1000 / (1024 * 1024),
    "kb": 1000 / (1024 * 1024),
    "kib": 1024 / (1024 * 1024),
    "m": 1000**2 / (1024 * 1024),
    "mb": 1000**2 / (1024 * 1024),
    "mib": 1.0,
    "g": 1000**3 / (1024 * 1024),
    "gb": 1000**3 / (1024 * 1024),
    "gib": 1024.0,
    "t": 1000**4 / (1024 * 1024),
    "tb": 1000**4 / (1024 * 1024),
    "tib": 1024.0 * 1024,
}

_SIZE_RE = re.compile(r"^\s*(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>[a-zA-Z]*)\s*$")


def parse_size_mb(size: str | None) -> float | None:
    """Human-readable size → MiB (reference: humanfriendly.parse_size then
    /(1024*1024), visual_data.py:28-29). Unparseable → None (the reference
    logs a warning and returns NaN)."""
    if size is None:
        return None
    m = _SIZE_RE.match(str(size))
    if not m:
        return None
    factor = _SIZE_UNITS_MB.get(m.group("unit").lower())
    if factor is None:
        return None
    return float(m.group("num")) * factor


def parse_camera_index(
    html: str, base_url: str, str_date: str, camhd_skip: tuple[str, ...] = ("mp4", "md5")
) -> list[dict]:
    """One day-page listing → image rows (visual_data.py:40-83).

    Mirrors the reference walk: every CAM-href anchor after the first (the
    parent-directory link), image name = anchor text, size = third
    whitespace-separated token of the trailing text; CAMHD archives drop
    mp4/md5 sidecar files."""
    is_camhd = "CAMHD" in base_url
    date_taken = dt.datetime.strptime(str_date, "%Y/%m/%d/")
    rows = []
    for match in list(_ANCHOR_RE.finditer(html or ""))[1:]:
        img_name = re.sub(r"\s+", " ", match.group("name")).strip()
        if is_camhd and any(ext in img_name for ext in camhd_skip):
            continue
        parts = match.group("tail").strip().split(None, 2)
        size = parts[2] if len(parts) == 3 else None
        rows.append(
            {
                "base_url": base_url,
                "img_name": img_name,
                "size": size,
                "date_taken": date_taken,
            }
        )
    return rows


CAMERA_INDEX_SCHEMA = (
    "base_url string, img_name string, size string, date_taken timestamp, "
    "size_mb double, image_status string"
)


def ingest_camera_index(
    spark: SparkSession, pages: DataFrame, img_size_cutoff_mb: float
) -> DataFrame:
    """S9: (base_url, str_date, html) page rows → typed image DataFrame.

    Distributed parse: one ``mapInPandas`` pass, each Arrow batch parsing its
    pages with the pure-Python walker above — the per-day pages are tiny but
    number in the thousands (days × cameras), which is exactly the shape that
    should fan out as tasks rather than loop on the driver. Output feeds the
    A1 group-count / A2 pivot queries.

    ``image_status`` follows the reference exactly: ``possibly_blank`` when
    the parsed size is below the per-camera cutoff, ``not_blank`` otherwise —
    including unparseable sizes (NaN compares False, visual_data.py:76-79).
    """

    def _parse(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                out.extend(parse_camera_index(r.html, r.base_url, r.str_date))
            frame = pd.DataFrame(
                out, columns=["base_url", "img_name", "size", "date_taken"]
            )
            if frame.empty:
                continue
            frame["size_mb"] = frame["size"].map(parse_size_mb)
            frame["image_status"] = [
                "possibly_blank" if (mb is not None and mb < img_size_cutoff_mb) else "not_blank"
                for mb in frame["size_mb"]
            ]
            yield frame

    return pages.mapInPandas(_parse, schema=CAMERA_INDEX_SCHEMA)


HITL_SCHEMA = "sheet string, field string, record_idx int, value string"


def ingest_hitl_sheets(spark: SparkSession, sheets: dict[str, list[dict]]) -> DataFrame:
    """S10: worksheet records → long-form notes DataFrame (notes.py:52-63).

    Replays read_logs' cleanup on each sheet's records: ``Unnamed`` columns
    dropped, frame transposed (fields become rows), comma→dot on every cell —
    then emitted long-form ``(sheet, field, record_idx, value)``, the layout
    the substring-filter (P9) and latest-note (top-1) queries consume.
    Sheets are a config-sized dimension (one spreadsheet, tens of columns),
    so driver-side construction is the right cost model, mirroring the S8
    status lookup."""
    rows = []
    for sheet, records in sheets.items():
        pdf = pd.DataFrame(records)
        for col in list(pdf.columns):
            if "Unnamed" in str(col):
                del pdf[col]
        for field, series in pdf.items():  # transpose: fields become rows
            for idx, value in enumerate(series):
                # Heterogeneous records (a key missing from some dicts) arrive
                # as pandas NaN, not None — both mean "absent", neither may
                # leak through as the literal string 'nan'.
                if value is None or (isinstance(value, float) and math.isnan(value)):
                    continue
                rows.append((sheet, str(field), idx, str(value).replace(",", ".")))
    return spark.createDataFrame(rows, HITL_SCHEMA)


STATUS_SCHEMA = "site string, status string"

#: The call-site fallback the reference uses when the status feed is down
#: or a site is missing from it (qaqc/dashboard.py:290-302 + call sites).
STATUS_UNAVAILABLE = "UNAVAILABLE"


def ingest_status_json(spark: SparkSession, url: str, timeout: float = 30.0) -> DataFrame:
    """S8 with the reference's degrade-to-empty contract
    (qaqc/dashboard.py:290-302 loadStatus): GET a JSON operational-status
    feed and return a typed (site, status) lookup dim — and on ANY failure
    (dead host, timeout, non-JSON body, unexpected shape) return an EMPTY
    frame of the same schema instead of raising, so a status-API outage can
    never kill a QA/QC run. Call sites overlay it as a left join whose
    misses coalesce to 'UNAVAILABLE' (status_overlay), reproducing the
    reference's fallback string.

    The feed is a config-sized dimension (one row per instrument), so a
    driver-side fetch + createDataFrame is the right cost model; the frame
    broadcasts into the job like every other config dim."""
    import json
    import urllib.request

    rows: list[tuple[str, str]] = []
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            parsed = json.loads(resp.read().decode("utf-8"))
        if isinstance(parsed, dict):
            rows = [(str(k), str(v)) for k, v in parsed.items()]
        elif isinstance(parsed, list):  # [{'referenceDesignator':…,'status':…}]
            for item in parsed:
                site = item.get("referenceDesignator") or item.get("site")
                if site is not None:
                    rows = rows + [(str(site), str(item.get("status")))]
    except Exception:
        rows = []  # degrade: empty, never raise (dashboard.py:290-302)
    return spark.createDataFrame(rows, STATUS_SCHEMA)


def status_overlay(df: DataFrame, status_dim: DataFrame, site_col: str = "site") -> DataFrame:
    """Overlay the operational status onto a per-site frame: broadcast left
    join on site, misses (including the whole-feed-down empty dim) coalesce
    to 'UNAVAILABLE' — the reference's call-site fallback."""
    from pyspark.sql import functions as F

    dim = status_dim.select(
        F.col("site").alias(site_col), F.col("status").alias("__status")
    )
    return (
        df.join(F.broadcast(dim), site_col, "left")
        .withColumn("status", F.coalesce(F.col("__status"), F.lit(STATUS_UNAVAILABLE)))
        .drop("__status")
    )
