"""Join operator kit (SURVEY.md §2.3).

Equi joins are plain ``df.join`` — Catalyst picks broadcast vs
shuffled-hash vs sort-merge, with AQE re-planning at runtime. This
module packages the three shapes that need deliberate design:

- ``anti_dedup``   — J9: the reference's ``INSERT ... WHERE NOT EXISTS``
  incremental dedup (stage/transformations/ethereum_transactions.sql:70-77).
- ``band_join``    — J7: equality + date-band theta join against the
  rugpull market table (analytics/transformations/
  ethereum_normal_transactions.sql:91-104).
- ``asof_join``    — J8: nearest-quote-within-tolerance join for token
  prices (queries/ethereum_wallet_features.sql:57-84), built as
  prefilter → rank → keep-first → left join back, the same two-step
  shape the reference uses (SURVEY.md §4 notes it's worth keeping).

Scale notes (100 TB): all three join on an equality key first, so the
physical plan is a hash/sort-merge join on that key with the band
predicate applied as a post-join filter — never a cartesian product.
Quote/dimension sides are usually small → mark them broadcastable at
the call site. Skewed keys fall to AQE skew-join splitting.

Day-bucketing (``bucket_days``): a band/as-of join whose equality key
has few distinct values (e.g. one row per token symbol) fans out to
|facts| × |quote history of that key| intermediate pairs before the
band filter prunes them — multiplicative in history length, the classic
scale-killer. When the tolerance is a whole number of days, the quote
side is instead exploded over its day span (a constant ≤ tol+1 copies
of the SMALL side) and the join key becomes ``(key, day)`` — fan-out is
then bounded by quotes-per-day × span, independent of history length.
The exact band predicate is still applied post-join, so semantics are
identical to the un-bucketed path.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def anti_dedup(new: DataFrame, target: DataFrame, natural_key: Sequence[str]) -> DataFrame:
    """Rows of ``new`` whose natural key does not appear in ``target``."""
    return new.join(target.select(*natural_key), on=list(natural_key), how="left_anti")


def semi_filter(df: DataFrame, other: DataFrame, key: Sequence[str]) -> DataFrame:
    """J10 — EXISTS(...) restriction to keys present in ``other``."""
    return df.join(other.select(*key), on=list(key), how="left_semi")


def band_join(
    facts: DataFrame,
    dim: DataFrame,
    key: Sequence[str],
    fact_ts: Column,
    dim_ts: Column,
    lower: Column,
    upper: Column,
    how: str = "left",
    bucket_days: tuple[int, int] | None = None,
    broadcast_dim: bool = False,
) -> DataFrame:
    """Equality on ``key`` + ``dim_ts`` within [fact_ts - lower,
    fact_ts + upper]. The equality key keeps this a hash join; the band
    is a join-condition filter.

    ``bucket_days=(lower_days, upper_days)`` enables the day-bucketed
    plan (module docstring): the dim side is exploded over day offsets
    ``[-upper_days, lower_days]`` (a fact at day d matches a dim row at
    day d - off) and the join key becomes ``key + [day]``, with the
    exact band kept as a post-join filter. Requires the interval bounds
    to be covered by the day span; the small dim side grows by a
    constant factor ≤ lower_days + upper_days + 1.
    """
    band = dim_ts.between(fact_ts - lower, fact_ts + upper)
    if bucket_days is None:
        cond = None
        for k in key:
            c = facts[k] == dim[k]
            cond = c if cond is None else (cond & c)
        return facts.join(dim, on=cond & band, how=how)

    lo_d, up_d = bucket_days
    exploded = (
        dim.withColumn("__off", F.explode(F.sequence(F.lit(-up_d), F.lit(lo_d))))
        .withColumn("__match_day", F.date_add(F.to_date(dim_ts), F.col("__off")))
        .drop("__off")
    )
    if broadcast_dim:
        exploded = F.broadcast(exploded)
    facts = facts.withColumn("__fact_day", F.to_date(fact_ts))
    cond = facts["__fact_day"] == exploded["__match_day"]
    for k in key:
        cond = cond & (facts[k] == exploded[k])
    return (
        facts.join(exploded, on=cond & band, how=how)
        .drop("__match_day", "__fact_day")
    )


def asof_join(
    events: DataFrame,
    quotes: DataFrame,
    key: Sequence[str],
    event_id: Sequence[str],
    event_ts: str,
    quote_ts: str,
    tolerance_expr: str = "INTERVAL 7 DAYS",
    direction: str = "backward",
    bucket_days: int | None = None,
    broadcast_quotes: bool = False,
) -> DataFrame:
    """As-of join: attach to each event the nearest quote within
    tolerance. ``event_id`` must uniquely identify an event row (never
    a generated id — recomputation could renumber). ``direction``:

    - ``backward`` — quotes in [event_ts - tol, event_ts] (reference
      price join: prices up to 7 days *before* the transaction).
    - ``nearest``  — quotes in [event_ts - tol, event_ts + tol], ranked
      by absolute distance.

    Deterministic: ties on distance break on the later quote timestamp
    (the reference ranks on ABS(diff) alone, which is nondeterministic
    under ties — SURVEY.md §7.5; we pin it down).

    Events with no quote in range keep NULL quote columns (caller
    applies the reference's COALESCE(price, 0) convention).

    ``bucket_days`` (must equal the tolerance in whole days) switches to
    the day-bucketed plan (module docstring): quotes are exploded over
    their reachable day span and the join is an equi join on
    ``key + [day]`` — fan-out per event is bounded by the day span, not
    by the key's full quote history. ``broadcast_quotes`` marks the
    exploded quote side broadcastable (right for price dims, whose size
    is tokens × days at any corpus scale).

    With ``bucket_days`` + ``broadcast_quotes`` together, the plan is
    the CANDIDATE-ARRAY form: the exploded quote dim is collapsed to
    one row per ``(key, day)`` carrying the ≤span-sized candidate list,
    the event side takes a single broadcast equi join on
    ``(key, day)`` — one output row per event, no fan-out — and the
    best quote is an in-row argmin over the array (band filter +
    lexicographic ``array_min`` on the (distance, -quote_ts) ordering
    prefix). That removes the per-event aggregation and the join-back
    entirely: zero event-keyed exchanges, so the event side is never
    shuffled at all. Same broadcast bytes as the exploded form (the
    same rows, grouped), identical results (ties cannot arise when
    quotes are unique per ``(key, quote_ts)``; beyond the pinned
    (distance, later-quote) ordering the payload struct breaks any
    residual tie deterministically, where ``min_by`` picked
    arbitrarily). ``event_id`` need not be unique on this path — rows
    are priced in place.
    """
    tol = F.expr(tolerance_expr)
    e_ts, q_ts = F.col(event_ts), F.col(quote_ts)
    if direction == "backward":
        band = q_ts.between(e_ts - tol, e_ts)
    elif direction == "nearest":
        band = q_ts.between(e_ts - tol, e_ts + tol)
    else:
        raise ValueError(f"unknown direction {direction!r}")

    # Explicit degradation contract (VERDICT r15 minor): the candidate-
    # array path FORCES the dim broadcast, which callers gate to price
    # dims (|tokens| × |days| rows at any corpus scale — the dim grows
    # with the catalog, not the event log). If a deployment's quote dim
    # outgrows the broadcast cap anyway, SPARK_GRAFT_ASOF_BROADCAST=0
    # drops the hint process-wide and the join falls back to the
    # exploded equi-join shape below, where AQE picks the strategy —
    # the same declared fallback as NGRAM_BROADCAST_MAX_DOCS /
    # FLOW_BROADCAST_MAX_EVENTS, just keyed on an operator whose dim
    # size the engine cannot read from any one table footer.
    if os.environ.get("SPARK_GRAFT_ASOF_BROADCAST", "1") == "0":
        broadcast_quotes = False
    if bucket_days is not None and broadcast_quotes:
        lo = 0 if direction == "backward" else -bucket_days
        quote_cols = [c for c in quotes.columns if c not in key]
        if direction == "backward":
            # Backward bands make the argmin ORDER-FREE per row: every
            # in-band quote is <= the event ts, so min distance ==
            # latest quote, and the (distance, -quote_ts, payload)
            # ordering collapses to (-quote_ts, payload) — a property
            # of the BAND, independent of the event's timestamp. Sort
            # the candidate array ONCE at dim build (per (key, day),
            # dim-sized work) and the per-event pick is band-filter +
            # first element: no per-row ordering-struct allocation, no
            # array_min comparisons — the fact-side cost that made the
            # first candidate-array cut slower than the join it
            # replaced on the leg-grain eth query (r15 A/B).
            entry = F.struct(
                (-F.unix_micros(q_ts)).alias("nt"),
                F.struct(*quote_cols).alias("q"),
            )
            agg = F.sort_array(F.collect_list(entry)).alias("__cands")
        else:
            agg = F.collect_list(F.struct(*quote_cols)).alias("__cands")
        cand = (
            quotes.withColumn("__off", F.explode(F.sequence(F.lit(lo), F.lit(bucket_days))))
            .withColumn("__ev_day", F.date_add(F.to_date(q_ts), F.col("__off")))
            .groupBy(*key, "__ev_day")
            .agg(agg)
        )
        joined = (
            events.withColumn("__ev_day", F.to_date(e_ts))
            .join(F.broadcast(cand), on=[*key, "__ev_day"], how="left")
        )
        if direction == "backward":
            # F.get (not element_at): NULL on empty/NULL arrays under
            # ANSI mode too — element_at(arr, 1) throws on empties
            # when spark.sql.ansi.enabled is on.
            best = F.get(
                F.filter(
                    F.col("__cands"),
                    lambda e: e["q"][quote_ts].between(e_ts - tol, e_ts),
                ),
                0,
            )["q"]
        else:
            in_band = lambda q: q[quote_ts].between(e_ts - tol, e_ts + tol)  # noqa: E731
            best = F.array_min(
                F.transform(
                    F.filter(F.col("__cands"), in_band),
                    lambda q: F.struct(
                        F.abs(F.unix_micros(e_ts) - F.unix_micros(q[quote_ts])).alias("d"),
                        (-F.unix_micros(q[quote_ts])).alias("nt"),
                        q.alias("q"),
                    ),
                )
            )["q"]
        return joined.select(
            *events.columns, *[best[c].alias(c) for c in quote_cols]
        )

    if bucket_days is None:
        joined = events.join(quotes, on=list(key), how="inner").where(band)
    else:
        # A quote at day q reaches events at day q..q+tol (backward) or
        # q-tol..q+tol (nearest); the exact band filter below restores
        # sub-day precision at the window edges.
        lo = 0 if direction == "backward" else -bucket_days
        exploded = (
            quotes.withColumn("__off", F.explode(F.sequence(F.lit(lo), F.lit(bucket_days))))
            .withColumn("__ev_day", F.date_add(F.to_date(q_ts), F.col("__off")))
            .drop("__off")
        )
        joined = (
            events.withColumn("__ev_day", F.to_date(e_ts))
            .join(exploded, on=[*key, "__ev_day"], how="inner")
            .where(band)
            .drop("__ev_day")
        )
    # Best-quote selection is a min_by hash aggregation, not a window
    # rank: partial (map-side) aggregation and no per-partition sort —
    # the cheaper plan at scale. The ordering struct encodes the
    # deterministic tie-break (distance asc, then LATER quote wins via
    # negated epoch).
    dist = F.abs(F.unix_micros(e_ts) - F.unix_micros(q_ts))
    quote_cols = [c for c in quotes.columns if c not in key]
    best = joined.groupBy(*event_id).agg(
        F.min_by(
            F.struct(*quote_cols), F.struct(dist.alias("d"), (-F.unix_micros(q_ts)).alias("nt"))
        ).alias("__best")
    )
    best = best.select(*event_id, *[F.col(f"__best.{c}").alias(c) for c in quote_cols])
    return events.join(best, on=list(event_id), how="left")
