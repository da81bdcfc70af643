"""Custom stateful streaming operators (applyInPandasWithState).

``first_seen_urls`` — streaming crawl-frontier dedup: emit each url the
first time it appears on the stream, suppress repeats. This is the
continuous analogue of the batch vertex-dictionary build (SURVEY O4): a
crawler feeds discovered outlinks in; the operator emits only never-before-
seen urls as the next frontier.

State design for scale: state is keyed by a hash *shard* of the url (not
the raw url), so the number of state groups is bounded (``num_shards``) and
each group's state is a compact set of url-hash int64s — GroupState stays
small and the shuffle key is uniform even when one host dominates the
crawl. A 64-bit hash collision (~2^-64 per pair) wrongly suppresses a url;
acceptable for frontier dedup (the batch dictionary remains exact).

Timeout semantics: state never expires by default (a frontier is
monotone); pass ``ttl_minutes`` to forget shards idle longer than the TTL
(processing-time timeout) for bounded-state deployments where re-crawl of
long-unseen urls is acceptable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType([StructField("url", StringType())])
_STATE_SCHEMA = StructType([StructField("seen", ArrayType(LongType()))])


def first_seen_urls(
    urls: DataFrame,
    num_shards: int = 256,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen filter over a (url: string) stream.

    Returns a stream of urls never seen before within their shard's state.
    Use on ``stream_edges_from_csv(...).select(col("dst").alias("url"))``
    to produce the crawl frontier.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = (ttl_minutes or 0) * 60 * 1000

    def dedup(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            # explicit string dtype: an empty default-dtype frame would rely
            # on Arrow coercing float64 -> string (ADVICE r1)
            yield pd.DataFrame({"url": pd.Series([], dtype="object")})
            return
        seen = set(state.get[0]) if state.exists else set()
        out: list[str] = []
        for pdf in pdfs:
            for url, h in zip(pdf["url"], pdf["h"]):
                if h not in seen:
                    seen.add(h)
                    out.append(url)
        state.update((list(seen),))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"url": out})

    sharded = urls.select(
        "url",
        F.xxhash64("url").alias("h"),
        F.pmod(F.xxhash64("url"), F.lit(num_shards)).alias("shard"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        dedup,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
