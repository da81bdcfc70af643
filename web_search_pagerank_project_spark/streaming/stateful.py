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

TTL semantics (round 2, per ADVICE r1): state never expires by default (a
frontier is monotone). With ``ttl_minutes`` set, expiry is PER ENTRY — each
url-hash carries its last-seen processing time and is pruned individually
once idle longer than the TTL, so state is bounded by the stream's
TTL-window cardinality and there is no all-at-once cliff where a briefly
idle shard forgets (and re-emits) every url it ever saw. Every sighting
refreshes the entry (sliding TTL), matching "re-crawl urls unseen for T".
The shard-level processing-time timeout is kept purely as garbage
collection for fully idle shards — by the time it fires, every entry in
the shard is older than the TTL, so dropping the whole shard state equals
per-entry semantics exactly.
"""

from __future__ import annotations

import time
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
_STATE_SCHEMA = StructType(
    [
        StructField("seen", ArrayType(LongType())),
        StructField("seen_ts", ArrayType(LongType())),  # ms, per entry
    ]
)


def _prune_expired(hs, ts, cutoff_ms: int) -> dict[int, int]:
    """Per-entry TTL prune: keep entries last seen at/after the cutoff.
    Module-level so the expiry rule is unit-testable without a stream."""
    return {h: t for h, t in zip(hs, ts) if t >= cutoff_ms}


def first_seen_urls(
    urls: DataFrame,
    num_shards: int = 256,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming first-seen filter over a (url: string) stream.

    Returns a stream of urls never seen before within their shard's state
    (never seen within ``ttl_minutes``, when set). Use on
    ``stream_edges_from_csv(...).select(col("dst").alias("url"))`` to
    produce the crawl frontier.
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
            # fires only after the shard has been idle for a full TTL, so
            # every entry is expired under per-entry semantics too
            state.remove()
            # explicit string dtype: an empty default-dtype frame would rely
            # on Arrow coercing float64 -> string (ADVICE r1)
            yield pd.DataFrame({"url": pd.Series([], dtype="object")})
            return
        now_ms = int(time.time() * 1000)
        seen: dict[int, int] = {}
        if state.exists:
            hs, ts = state.get
            if ttl_minutes is not None:
                seen = _prune_expired(hs, ts, now_ms - ttl_ms)
            else:
                seen = dict(zip(hs, ts))
        out: list[str] = []
        for pdf in pdfs:
            for url, h in zip(pdf["url"], pdf["h"]):
                if h not in seen:
                    out.append(url)
                seen[h] = now_ms  # refresh on every sighting (sliding TTL)
        state.update((list(seen.keys()), list(seen.values())))
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
