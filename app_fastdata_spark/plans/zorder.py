"""Z-order (Morton-curve) data clustering for multi-dimensional scan
pruning.

The reference partitions each table on ONE column (PARTITION TABLE …
ON COLUMN src, db/ddl.sql:73), so predicates on any OTHER column scan
every partition. At lake scale the standard fix is space-filling-curve
layout: interleave the bits of two (or more) filter columns into one
Z-value, cluster the files by that value, and every query that boxes
EITHER dimension touches only the files whose Z-range intersects the
box. Delta/Iceberg expose this as OPTIMIZE ZORDER BY; plain Spark gets
the same effect with a computed z-cell partition column + a lexical
sort within partitions — which is what this module implements.

Two layers:
- `events_zorder_key` — the Z-value computation itself as a registered
  query with a full DuckDB oracle (the bit-interleave is emitted as an
  unrolled expression from ONE generator for both dialects, so the
  arithmetic is cross-engine exact by construction).
- `write_zordered` / `zcells_for_box` — the layout writer (coarse
  z-cell directory partitions + fine z-key sort within files) and the
  query-side cell enumerator that turns a 2-D box predicate into a
  z-cell IN-list Spark prunes with PartitionFilters (gated in
  tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

ZBITS = 16  # bits per dimension → 32-bit z-key
ZCELL_SHIFT = 24  # keep top 4 bits of each dim → 256 directory cells


def _interleave_sql(x: str, y: str, dialect: str, bits: int = ZBITS) -> str:
    """Unrolled bit-interleave expression: bit i of x → bit 2i, bit i of
    y → bit 2i+1. One generator, two dialects — the arithmetic is
    identical so the oracle matches bit-for-bit. Disjoint bits make
    `+` equivalent to `|`."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:  # duckdb — every term fully parenthesized: SQL's << binds
            # LOOSER than +, so a bare `a << 0 + b << 1` chain would
            # parse as `a << (0 + b) << 1` and overflow
            terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
            terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# The two clustered dimensions for events: user bucket × epoch-second
# bucket (both mod 2^ZBITS → non-negative, NULL-propagating).
_ZX_SPARK = f"cast(user_id % {1 << ZBITS} as bigint)"
_ZY_SPARK = f"cast((unix_micros(ts) div 1000000) % {1 << ZBITS} as bigint)"
_ZX_DUCK = f"(user_id % {1 << ZBITS})"
_ZY_DUCK = f"((epoch_us(ts) // 1000000) % {1 << ZBITS})"


def zorder_key_col() -> F.Column:
    return F.expr(_interleave_sql(_ZX_SPARK, _ZY_SPARK, "spark")).alias("zkey")


def events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event Z-value over (user bucket, second bucket). Plan: scan →
    one codegen projection (the unrolled shift/mask sum) — zero
    shuffles; at 100 TB this column is computed once at write time."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", zorder_key_col())


register(
    "events_zorder_key",
    sql=f"""
    SELECT event_id,
           {_interleave_sql(_ZX_DUCK, _ZY_DUCK, "duckdb")} AS zkey
    FROM events
    """,
)(events_zorder_key)


def write_zordered(df: DataFrame, path: str) -> None:
    """Persist events Z-clustered: coarse z-cell (top bits of the
    z-key) as a directory partition column — partition pruning handles
    the coarse box — and the full z-key sorted within files so parquet
    row-group min/max stats prune the fine remainder. The sort leads
    with the partition column (house rule: the dynamic-partition
    writer's own re-sort is unstable)."""
    out = df.withColumn("zkey", zorder_key_col()).withColumn(
        "zcell", F.shiftright("zkey", ZCELL_SHIFT)
    )
    (
        out.repartition("zcell")
        .sortWithinPartitions("zcell", "zkey")
        .write.mode("overwrite")
        .partitionBy("zcell")
        .parquet(path)
    )


def zcells_for_box(
    user_lo: int, user_hi: int, sec_lo: int, sec_hi: int
) -> list[int]:
    """Enumerate the coarse z-cells a (user-bucket, second-bucket) box
    intersects: project the box to the coarse grid (top 4 bits of each
    dim) and interleave the coarse coordinates. ≤256 cells total so
    plain enumeration is exact and cheap — no litmax/bigmin machinery
    needed at this cell granularity. The returned IN-list is a partition
    filter: Spark prunes every non-listed cell directory at planning
    time."""
    coarse_bits = 2 * ZBITS - ZCELL_SHIFT  # bits surviving the shift
    dim_bits = coarse_bits // 2
    lo_shift = ZBITS - dim_bits

    def interleave(cx: int, cy: int) -> int:
        z = 0
        for i in range(dim_bits):
            z |= ((cx >> i) & 1) << (2 * i)
            z |= ((cy >> i) & 1) << (2 * i + 1)
        return z

    cells = set()
    for cx in range(user_lo >> lo_shift, (user_hi >> lo_shift) + 1):
        for cy in range(sec_lo >> lo_shift, (sec_hi >> lo_shift) + 1):
            cells.add(interleave(cx, cy))
    return sorted(cells)
