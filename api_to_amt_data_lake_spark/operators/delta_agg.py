"""Incremental aggregate maintenance from a change data feed.

`amt/incremental_gold.py` refreshes a view by RECOMPUTING the changed
keys; for a pure grouped SUM/COUNT that is still O(touched groups'
rows). This operator goes one step further — the Delta/Materialize
"maintain, don't recompute" shape: each CDF row decomposes into ±
contributions (insert → +x at its group; delete → −x at its OLD group;
update → −x_old at the old group and +x_new at the new group, which
also handles rows MOVING between groups), the contributions aggregate
to one delta row per touched group, and one outer join folds the
deltas into the state. Cost is O(|changes| + |touched groups|) —
unchanged groups are never read, the property that makes an hourly
refresh of a 10^12-row aggregate affordable.

Only mergeable aggregates fold this way (sum/count here; min/max need
the per-group recompute path on deletes). Groups whose row count
reaches zero are dropped, so fold(state, changes) is EXACTLY the
from-scratch aggregate of the new version (parity-tested under
insert+update+delete+group-move in tests/test_round9_ops.py, and
oracle-pinned by conformance q99zy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_sums(df: DataFrame, group_cols: list[str],
                 sum_cols: list[str]) -> DataFrame:
    """The from-scratch aggregate this fold maintains:
    (groups…, n_rows, sum_{c}…)."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols])


def fold_grouped_sums(
    state: DataFrame | None,
    changes: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Fold CDF rows (from `sources.incremental.frame_changes(...,
    include_old=True)`: _change_type + new columns + _old_{c}) into a
    `grouped_sums` state. `state=None` starts from empty (a full CDF
    of inserts rebuilds the aggregate)."""
    new_side = changes.filter(F.col("_change_type") != "delete").select(
        *[F.col(c).alias(c) for c in group_cols],
        F.lit(1).alias("_dn"),
        *[F.col(c).alias(f"_dx_{c}") for c in sum_cols])
    old_side = changes.filter(F.col("_change_type") != "insert").select(
        *[F.col(f"_old_{c}").alias(c) for c in group_cols],
        F.lit(-1).alias("_dn"),
        *[(-F.col(f"_old_{c}")).alias(f"_dx_{c}") for c in sum_cols])
    deltas = (
        new_side.unionAll(old_side)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(F.sum("_dn").alias("_dn"),
             *[F.sum(f"_dx_{c}").alias(f"_dx_{c}") for c in sum_cols])
    )
    if state is None:
        folded = deltas.select(
            *group_cols, F.col("_dn").alias("n_rows"),
            *[F.col(f"_dx_{c}").alias(f"sum_{c}") for c in sum_cols])
    else:
        folded = state.join(deltas, group_cols, "full_outer").select(
            *group_cols,
            (F.coalesce(F.col("n_rows"), F.lit(0))
             + F.coalesce(F.col("_dn"), F.lit(0))).alias("n_rows"),
            *[(F.coalesce(F.col(f"sum_{c}"), F.lit(0))
               + F.coalesce(F.col(f"_dx_{c}"), F.lit(0)))
              .alias(f"sum_{c}") for c in sum_cols])
    return folded.filter(F.col("n_rows") > 0)


def signed_changes(changes: DataFrame, cols: list[str],
                   sign_col: str = "_sgn") -> DataFrame:
    """Decompose a CDF (from `sources.incremental.frame_changes(...,
    include_old=True)`) into SIGNED image rows — the delete+insert
    decomposition that generalizes IVM beyond insert-only deltas:
    every non-delete row contributes its NEW image at +1, every
    non-insert row its OLD image (the `_old_{c}` columns) at −1; an
    update contributes both. Σ(signed images) ≡ A_new − A_old as a
    signed multiset over `cols`."""
    new_side = changes.filter(F.col("_change_type") != "delete").select(
        *[F.col(c) for c in cols], F.lit(1).alias(sign_col))
    old_side = changes.filter(F.col("_change_type") != "insert").select(
        *[F.col(f"_old_{c}").alias(c) for c in cols],
        F.lit(-1).alias(sign_col))
    return new_side.unionAll(old_side)


def delta_join_signed(
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    on: list[str],
    sign_col: str = "_sgn",
) -> DataFrame:
    """Signed inner-join delta under arbitrary CDC (the general form of
    `delta_join_increment`, which handles the insert-only case): with
    dA = A_new − A_old and dB = B_new − B_old as SIGNED multisets
    (`signed_changes`),

        A'⋈B' − A⋈B  =  dA⋈B  +  A⋈dB  +  dA⋈dB,

    where a joined row's sign is the PRODUCT of its inputs' signs (the
    bilinear expansion of (A+dA)⋈(B+dB)). The returned frame carries
    one `sign_col`; folding it into a downstream aggregate state
    (`fold_grouped_sums_signed`) maintains Agg(A ⋈ B) under inserts,
    updates, AND deletes on either side — cost tracks the deltas'
    match fan-out, never |A|·|B|. Both base sides must carry
    `sign_col` = +1 semantics implicitly (they are unsigned); the
    delta sides carry theirs explicitly."""
    a_sgn, b_sgn = f"{sign_col}_a", f"{sign_col}_b"

    def _prod(df, sa, sb):
        return df.withColumn(sign_col, (F.col(sa) * F.col(sb))
                             .cast("int")).drop(sa, sb)

    # Operand order puts the DELTA on the build (right) side of every
    # term: the base probes then plan as broadcast-hash joins when the
    # delta is small (its localCheckpoint/CDC-feed stats are accurate),
    # so NO term exchanges a base side — the only shuffled data is
    # delta-sized (plan-pinned in tests/test_round11_ops.py). On a
    # single node the win is invisible (shuffle ≈ memcpy; the 10M smoke
    # reads scan-bound either way) — on a cluster the avoided exchanges
    # are 2 × |base| rows of network per refresh, which is the term
    # that matters at 100 TB. With the delta on the LEFT, Spark planned
    # the first term as a sort-merge join shuffling the full base.
    # unionByName makes the operand swap invisible.
    t1 = b_old.withColumn(b_sgn, F.lit(1)).join(
        d_a.withColumnRenamed(sign_col, a_sgn), on)
    t2 = a_old.withColumn(a_sgn, F.lit(1)).join(
        d_b.withColumnRenamed(sign_col, b_sgn), on)
    t3 = d_a.withColumnRenamed(sign_col, a_sgn).join(
        d_b.withColumnRenamed(sign_col, b_sgn), on)
    return (_prod(t1, a_sgn, b_sgn)
            .unionByName(_prod(t2, a_sgn, b_sgn))
            .unionByName(_prod(t3, a_sgn, b_sgn)))


def fold_grouped_sums_signed(
    state: DataFrame | None,
    signed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    sign_col: str = "_sgn",
) -> DataFrame:
    """Fold SIGNED contribution rows (from `signed_changes` or
    `delta_join_signed`) into a `grouped_sums` state: each row adds
    sign × 1 to its group's n_rows and sign × value to each sum.
    `state=None` starts from empty. Same contract as
    `fold_grouped_sums` (groups at zero rows drop out; the fold of a
    full +1 feed rebuilds the aggregate) — the two differ only in the
    input encoding: CDF rows with old images vs pre-signed images."""
    deltas = (
        signed.groupBy(*[F.col(c) for c in group_cols])
        .agg(F.sum(sign_col).alias("_dn"),
             *[F.sum(F.col(sign_col) * F.col(c)).alias(f"_dx_{c}")
               for c in sum_cols])
    )
    if state is None:
        folded = deltas.select(
            *group_cols, F.col("_dn").alias("n_rows"),
            *[F.col(f"_dx_{c}").alias(f"sum_{c}") for c in sum_cols])
    else:
        folded = state.join(deltas, group_cols, "full_outer").select(
            *group_cols,
            (F.coalesce(F.col("n_rows"), F.lit(0))
             + F.coalesce(F.col("_dn"), F.lit(0))).alias("n_rows"),
            *[(F.coalesce(F.col(f"sum_{c}"), F.lit(0))
               + F.coalesce(F.col(f"_dx_{c}"), F.lit(0)))
              .alias(f"sum_{c}") for c in sum_cols])
    return folded.filter(F.col("n_rows") > 0)


def delta_join_increment(
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental INNER-join maintenance for insert-only deltas — the
    join half of the "maintain, don't recompute" story (this module's
    docstring): with A' = A ∪ dA and B' = B ∪ dB,

        A' ⋈ B'  =  (A ⋈ B)  ∪  Δ,
        Δ        =  dA ⋈ B  ∪  A ⋈ dB  ∪  dA ⋈ dB,

    and this returns Δ — the rows the maintained materialization
    appends. Cost tracks |dA|·|matches| + |dB|·|matches|, never
    |A|·|B|: the old sides are probed on the join key only where a
    delta key lands (at 100 TB both base probes are one shuffle join
    each against a typically broadcast-sized delta; unchanged keys
    never produce work). Deletes/updates need the CDF ± decomposition
    (`fold_grouped_sums`) downstream of the join instead — insert-only
    is the append-log case (event streams, crawl shards), stated here
    so the contract is explicit.

    Exactness (q99zzl oracle + parity test): the three terms are
    disjoint by provenance (old×new, new×old, new×new), so
    (A ⋈ B) ∪ Δ is EXACTLY A' ⋈ B' as a bag — no dedup is applied or
    needed, duplicates in the inputs flow through with join
    multiplicity like any inner join."""
    return (
        d_a.join(b_old, on)
        .unionByName(a_old.join(d_b, on))
        .unionByName(d_a.join(d_b, on))
    )
