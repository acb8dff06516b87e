"""HTTP ingestion helpers — the reference's second most-used source: an
HTTP task that fetches a page, extracts a "next page" context from the
response with jq, and loops until the context is exhausted
(``internal/pkg/pipeline/task/http/http.go:148-289``; exemplar fixture
``test/pipelines/next_page_context_test.yaml:17-40``).

Spark-first mapping: page FETCHING is inherently serial driver-side work
(each request depends on the previous response — the reference is a
single-process loop too); everything AFTER the fetch parallelizes. So
``paginate`` runs the fetch loop on the driver, accumulates page records,
and hands the union to Spark as a DataFrame in bounded slices. The
``fetch_fn`` is injected (requests/urllib/boto — anything callable), which
also keeps this testable in a network-less sandbox.

For many INDEPENDENT urls (fan-out rather than pagination),
``fetch_distributed`` maps a url column through the fetch function inside
``mapInPandas`` — that path IS distributed, one partition per executor.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def paginate(
    spark: SparkSession,
    fetch_fn: Callable[[Any], Any],
    records_fn: Callable[[Any], list[dict]],
    next_context_fn: Callable[[Any], Any],
    first_context: Any = None,
    max_pages: int = 100_000,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Follow a next-page-context pagination chain into one DataFrame.

    - ``fetch_fn(context)``        -> response object (page ``context`` is
      whatever the API uses: url, cursor token, offset, ...);
    - ``records_fn(response)``     -> list of dict records on that page
      (the reference's jq ``records`` expression);
    - ``next_context_fn(response)``-> context of the next page, or
      None/empty to stop (the reference's jq ``next_page_context``).

    ``max_pages`` guards against a cyclic cursor (the reference loops
    forever on one). Records convert via JSON so nested structures survive;
    pass ``schema`` to pin types (otherwise inferred from the data).
    """
    pages: list[str] = []
    ctx = first_context
    for _ in range(max_pages):
        resp = fetch_fn(ctx)
        pages.extend(json.dumps(r) for r in records_fn(resp))
        ctx = next_context_fn(resp)
        if ctx is None or ctx == "" or ctx == {}:
            break
    else:
        raise RuntimeError(
            f"pagination did not terminate within {max_pages} pages "
            "(cyclic next-page context?)"
        )
    if not pages and schema is None:
        # zero records + no schema would infer a zero-COLUMN frame that
        # crashes the first downstream column reference; force the caller
        # to say what empty looks like
        raise ValueError(
            "pagination returned no records and no schema was given; pass "
            "schema= so an empty result is an empty TYPED DataFrame"
        )
    raw = spark.createDataFrame(pages, T.StringType()).toDF("value")
    if schema is not None:
        from pyspark.sql import functions as F

        return raw.select(F.from_json("value", schema).alias("r")).select("r.*")
    return spark.read.json(raw.rdd.map(lambda r: r["value"]))


def fetch_distributed(
    df: DataFrame,
    fetch_fn: Callable[[str], dict],
    url_col: str = "url",
    out_schema: T.StructType | None = None,
) -> DataFrame:
    """Fan-out fetch of INDEPENDENT urls (no pagination chain): each
    partition's urls are fetched inside an Arrow-batched ``mapInPandas``
    kernel — the distributed counterpart of the reference's http fan-out.
    ``fetch_fn(url) -> dict`` must be picklable (top-level function)."""
    import pandas as pd

    schema = out_schema or T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("body", T.StringType()),
        ]
    )
    names = [f.name for f in schema.fields]

    custom_schema = out_schema is not None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url in pdf[url_col]:
                body = fetch_fn(url)
                if isinstance(body, dict):
                    rows.append(
                        {n: (url if n == "url" else body.get(n)) for n in names}
                    )
                elif custom_schema:
                    # a bare value can't be mapped onto caller-named
                    # columns; dropping it silently would be data loss
                    raise TypeError(
                        "fetch_fn returned a non-dict with a custom "
                        f"out_schema {names}; return a dict keyed by those "
                        "columns"
                    )
                else:
                    rows.append({"url": url, "body": body})
            yield pd.DataFrame(rows, columns=names)

    return df.mapInPandas(kernel, schema=schema)
