"""Distributed sketches (engine extension; SURVEY.md §7.4 names
"novel sketches" as the custom-operator tier).

``hll_register_sums`` is a HyperLogLog distinct-count sketch built so
the estimate is bit-identical across engines — unusual for an
approximate algorithm, and the property that lets an APPROXIMATE
operator carry an EXACT DuckDB oracle (the same trick the MinHash/LSH
family uses):

- the hash is md5 (not engine-private xxhash), so register assignment
  is reproducible anywhere;
- the leading-zero rank is computed on hex nibbles with string/CASE
  arithmetic (no log2/libm, whose last-ulp rounding differs between
  libm builds);
- registers are combined as the INTEGER sum of 2^(CAP − ρ_j) — the
  harmonic mean's denominator scaled by 2^CAP — so the only floating
  point in the whole sketch is one final correctly-rounded IEEE
  division, which every engine rounds identically.

Scale shape: one shuffle on the 2-hex-char register id (256 groups,
uniform by construction), map-side partial MAX, then a single-row
reduction. At 100 TB this is the textbook distributed-HLL plan:
registers merge associatively, so partial sketches from any number of
partitions/batches combine losslessly (the standard streaming /
cross-partition union property).

Bias note: this emits the RAW HLL estimate (α·m²/Σ2^−ρ). The small-
range linear-counting correction needs ln(m/V); ln is deliberately
omitted to keep the oracle exact — callers needing small-range
accuracy use the emitted ``zero_registers`` count driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256  # 2^8 registers — register id = first 2 md5 hex chars
_RANK_CAP = 48  # ρ capped so 2^(CAP-ρ) stays an exact BIGINT
# α_256 · m² · 2^CAP as one double literal (division by the integer
# register sum is then the sketch's only floating-point operation).
HLL_ALPHA_M2 = 0.7213 / (1.0 + 1.079 / HLL_M) * HLL_M * HLL_M
HLL_NUMERATOR = HLL_ALPHA_M2 * float(2**_RANK_CAP)

# Leading-zero-bit count of one hex nibble (0 handled by the prefix
# scan below, so '0' never reaches these cases).
_NIBBLE_CLZ = (
    "CASE WHEN {d} = '1' THEN 3 "
    "WHEN {d} IN ('2','3') THEN 2 "
    "WHEN {d} IN ('4','5','6','7') THEN 1 "
    "ELSE 0 END"
)


def hll_rank_expr(hash_col: str) -> str:
    """SQL for the HLL rank ρ over the hex tail of an md5 digest: the
    number of leading zero BITS of the bitstream after the 2-char
    register prefix, plus one — computed as 4·(zero nibbles) +
    clz(first nonzero nibble) + 1, pure string/CASE arithmetic that
    parses identically on Spark and DuckDB."""
    tail = f"substr({hash_col}, 3, 12)"
    zeros = f"length(regexp_extract({tail}, '^(0*)', 1))"
    first = f"substr({tail}, {zeros} + 1, 1)"
    clz = _NIBBLE_CLZ.format(d=first)
    # all-zero tail (probability 16^-12): rank caps at the max
    return (
        f"CAST(least(CASE WHEN {zeros} = 12 THEN {4 * 12 + 1} "
        f"ELSE 4 * {zeros} + ({clz}) + 1 END, {_RANK_CAP}) AS INT)"
    )


def hll_registers(df: DataFrame, key: Column, group_cols: list[str]) -> DataFrame:
    """The sketch accumulator: per (group, register) max rank — the
    mergeable representation. ``hll_merge`` unions accumulators from
    any partitioning of the input losslessly (max is associative,
    commutative and idempotent), which is what makes the sketch
    streamable and cross-batch combinable."""
    hashed = df.select(
        *group_cols,
        F.md5(key.cast("string")).alias("__h"),
    ).select(
        *group_cols,
        F.expr("substr(__h, 1, 2)").alias("__reg"),
        F.expr(hll_rank_expr("__h")).alias("__rho"),
    )
    return hashed.groupBy(*group_cols, "__reg").agg(F.max("__rho").alias("__max_rho"))


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Combine two register accumulators: per-register MAX. Exactly the
    sketch of the unioned inputs (tests/test_operators.py pins the
    identity sketch(b1 ∪ b2) == merge(sketch(b1), sketch(b2)))."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__max_rho").alias("__max_rho"))
    )


def hll_finalize(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers → (register_sum, zero_registers, hll_estimate): the
    BIGINT Σ 2^(CAP−ρ_j) over all m registers (absent registers
    contribute ρ=0) and the one-division raw estimate."""
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RANK_CAP} - __max_rho)")).alias(
            "__observed_sum"
        ),
        F.count(F.lit(1)).alias("__observed_regs"),
    )
    full_sum = (
        F.col("__observed_sum")
        + (F.lit(HLL_M) - F.col("__observed_regs")) * F.lit(2**_RANK_CAP).cast("bigint")
    ).cast("bigint")
    return per_group.select(
        *group_cols,
        full_sum.alias("register_sum"),
        (F.lit(HLL_M) - F.col("__observed_regs")).cast("bigint").alias("zero_registers"),
        (F.lit(HLL_NUMERATOR) / full_sum.cast("double")).alias("hll_estimate"),
    )


def hll_register_sums(df: DataFrame, key: Column, group_cols: list[str]) -> DataFrame:
    """Per ``group_cols`` group: the HLL register-sum accumulator and
    raw estimate for COUNT(DISTINCT key) — ``hll_registers`` piped into
    ``hll_finalize``."""
    return hll_finalize(hll_registers(df, key, group_cols), group_cols)


# --------------------------------------------------------------------------
# Count-min sketch: fixed-size frequency summary. Same determinism
# recipe as the HLL above — md5-derived counter indices and pure
# integer counts, so estimates are bit-identical cross-engine and the
# overestimate guarantee (est >= true count, error bounded by the
# collision mass in the lightest row) is exactly replayable.
CMS_D = 4  # hash rows
CMS_W = 256  # counters per row — index = first 2 hex chars of md5

_CMS_IDX = "CAST(conv(substr(md5(concat(CAST({j} AS STRING), ':', {k})), 1, 2), 16, 10) AS INT)"


def cms_counters(df: DataFrame, key: Column, d: int = CMS_D) -> DataFrame:
    """Build the (row, counter) -> count sketch table: <= d*w rows no
    matter the input size. One explode (constant x d) + one shuffle on
    the (row, counter) key with map-side partial sums — the textbook
    distributed CMS build. Counters merge by plain SUM, so partial
    sketches from any partitioning/batching combine losslessly."""
    rows = df.select(key.cast("string").alias("__k"))
    ex = rows.select(
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("__j"), "__k"
    )
    return (
        ex.select("__j", F.expr(_CMS_IDX.format(j="__j", k="__k")).alias("__c"))
        .groupBy("__j", "__c")
        .agg(F.count(F.lit(1)).alias("__n"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, d: int = CMS_D
) -> DataFrame:
    """Frequency estimates for a candidate key set: min over the d
    counters each key hashes to. The sketch is <= d*w rows, so the join
    is a broadcast against the (possibly huge) candidate side — probing
    costs one map-side join, no shuffle of the big side."""
    probes = keys.select(
        F.col(key_col), F.col(key_col).cast("string").alias("__k")
    ).select(
        key_col,
        "__k",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("__j"),
    )
    probes = probes.select(
        key_col, "__j", F.expr(_CMS_IDX.format(j="__j", k="__k")).alias("__c")
    )
    joined = probes.join(F.broadcast(sketch), ["__j", "__c"], "left").withColumn(
        "__n", F.coalesce(F.col("__n"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("__n").alias("cms_estimate"))


# --------------------------------------------------------------------------
# Bloom filter: membership summary as ONE 64-bit word (k=4 md5-derived
# bit positions). Deterministic for the same reason as above; the
# classic join-pruning pattern — build on the small side, broadcast the
# word, filter the big side map-side before an expensive join — with
# the no-false-negative guarantee replayable cross-engine.
BLOOM_K = 4
# 63 bits, not 64: position 63 would need 1 << 63, which overflows a
# SIGNED 64-bit word — Spark's shiftleft wraps silently to the sign
# bit while DuckDB raises, so the one-word bloom uses the 63 positive
# bit positions and stays portable.
BLOOM_M = 63

_BLOOM_POS = (
    "CAST(conv(substr(md5(concat(CAST({j} AS STRING), ':', {k})), 1, 2), 16, 10) AS INT)"
    f" % {BLOOM_M}"
)


def bloom_build(df: DataFrame, key: Column, k: int = BLOOM_K) -> DataFrame:
    """Aggregate the member set to a single-row, single-BIGINT bloom
    word: explode k positions per member, OR the shifted bits. bit_or
    is associative/commutative, so the build is one shuffle-free
    partial agg + a 1-row reduction, and words from separate batches
    merge with a further bit_or."""
    rows = df.select(key.cast("string").alias("__k"))
    ex = rows.select(
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("__j"), "__k"
    )
    word = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {_BLOOM_POS.format(j='__j', k='__k')})"
    )
    return ex.select(word.alias("__w")).agg(
        F.expr("bit_or(__w)").alias("bloom_word")
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, key_col: str, k: int = BLOOM_K
) -> DataFrame:
    """Membership test: key is a (possible) member iff ALL k of its
    bits are set. The bloom side is one row — Catalyst broadcasts the
    cross join — so probing is map-side only."""
    ex = probes.select(
        F.col(key_col), F.col(key_col).cast("string").alias("__k")
    ).select(
        key_col,
        "__k",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("__j"),
    )
    masked = ex.crossJoin(F.broadcast(bloom)).select(
        key_col,
        (
            F.expr(
                f"bloom_word & shiftleft(CAST(1 AS BIGINT), {_BLOOM_POS.format(j='__j', k='__k')})"
            )
            != 0
        ).alias("__bit_set"),
    )
    return masked.groupBy(key_col).agg(
        F.min("__bit_set").alias("bloom_member")
    )
