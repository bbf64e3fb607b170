"""WebGetter analog — fetch pages for incoming URLs (SURVEY.md §2.1 row
10; reference `eslib/procs/WebGetter.py`, recalled semantics: per-host
politeness delay, response size caps, fetch errors become status rows
rather than failures, output is a page document per url).

Offline sandbox: the HTTP client is an injected seam, exactly the
pattern the multimodal decode path uses (operators/multimodal.py). The
deterministic fake client is SQL-expressible, so the driver oracle can
value-check the COMPLETE plumbing — url→host routing, the politeness
partitioning, the size cap, the page-row schema — and a networked
deployment swaps in `_fetch_real` (stdlib urllib) behind the same seam.

100 TB design notes:
  * URLs are hash-repartitioned on HOST and sorted by host within each
    partition, so every host's URLs reach exactly one task. Politeness
    (a minimum delay between consecutive hits to one host) then needs no
    cross-executor coordination: a per-task `{host: last_fetch_t}` dict
    is globally correct, because no other task ever touches that host.
  * Fetches run inside `mapInPandas` (Arrow batches in/out). The
    per-row loop over a batch is deliberate and correct here: HTTP I/O
    cannot be vectorized, the politeness clock is inherently
    sequential per host, and the loop body is network-dominated — this
    is the documented exception to the no-per-row-Python rule, same as
    the media decode seam.
  * The body is truncated to `max_bytes` BEFORE it enters the output
    row, so a hostile multi-GB response can never create a multi-GB
    Spark row or blow the Arrow batch.
  * A raising fetcher yields a `status=599, html=NULL` quarantine row
    (eslib's skip-and-log; SURVEY.md §4.1) — the task never fails.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, functions as F

FETCH_SCHEMA = ("url string, host string, status int, n_bytes long, "
                "html binary")
#: synthetic status for a fetcher that raised (network error, timeout…)
STATUS_FETCH_ERROR = 599

_HOST_RE = r"https?://([^/]+)"


def _fetch_fake(url: str) -> tuple[int, bytes]:
    """Deterministic offline 'fetch': the page body embeds its url.

    SQL twin (DuckDB / Spark SQL, all-ASCII so bytes == chars):
        '<html><body>fetched:' || url || '</body></html>'
    """
    return 200, f"<html><body>fetched:{url}</body></html>".encode()


def _fetch_real(url: str, timeout_s: float = 20.0) -> tuple[int, bytes]:
    """Online client for a networked deployment (stdlib only). Unreachable
    in this sandbox (no egress); the fake above is the tested default."""
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "eslib-spark"})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return resp.status, resp.read()


def _fetch_batches(batches: Iterator,
                   fetch: Callable[[str], tuple[int, bytes]],
                   max_bytes: int,
                   delay_s: float,
                   clock: Callable[[], float],
                   sleeper: Callable[[float], None]) -> Iterator:
    """The per-task fetch loop (one Python worker = one partition = a
    disjoint set of hosts). Pure pandas-in/pandas-out so the politeness
    clock is unit-testable without a Spark worker between the test and
    the injected `clock`/`sleeper`."""
    import pandas as pd

    last: dict[str, float] = {}  # host → last fetch time; correct because
    # this task owns every url of each host it sees (module docstring)
    for pdf in batches:
        out = {"url": [], "host": [], "status": [], "n_bytes": [],
               "html": []}
        for url, host in zip(pdf["url"], pdf["host"]):
            if delay_s > 0 and host in last:
                wait = delay_s - (clock() - last[host])
                if wait > 0:
                    sleeper(wait)
            try:
                status, body = fetch(url)
                body = body[:max_bytes]
            except Exception:
                status, body = STATUS_FETCH_ERROR, None
            if delay_s > 0:
                last[host] = clock()
            out["url"].append(url)
            out["host"].append(host)
            out["status"].append(status)
            out["n_bytes"].append(len(body) if body is not None else 0)
            out["html"].append(body)
        yield pd.DataFrame(out)


def fetch_pages(urls: DataFrame,
                fetcher: Optional[Callable[[str], tuple[int, bytes]]] = None,
                max_bytes: int = 1 << 20,
                delay_s: float = 0.0,
                n_partitions: Optional[int] = None,
                clock: Callable[[], float] = time.monotonic,
                sleeper: Callable[[float], None] = time.sleep) -> DataFrame:
    """urls(url string) → pages(url, host, status, n_bytes, html binary).

    `fetcher(url) -> (status, body_bytes)` is the seam; default is the
    deterministic offline fake. `delay_s` is the per-host politeness
    floor; `clock`/`sleeper` are injectable (note they execute inside the
    Python worker — observe them via `_fetch_batches` in unit tests).
    """
    fetch = fetcher or _fetch_fake
    spark = urls.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    routed = (urls
              .select("url", F.regexp_extract("url", _HOST_RE, 1).alias("host"))
              .repartition(n, "host")
              .sortWithinPartitions("host", "url"))

    def run(batches: Iterator) -> Iterator:
        yield from _fetch_batches(batches, fetch, max_bytes, delay_s,
                                  clock, sleeper)

    return routed.mapInPandas(run, FETCH_SCHEMA)
