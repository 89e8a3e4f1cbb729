"""MERGE writer — Delta Lake when available, generic rewrite fallback otherwise.

Reference parity: ``io/writers/delta_merge_writer.py:28-210`` (full
MergeOptions semantics: delete/update/insert predicates + column sets,
insert-only mode). On clusters with delta-spark installed this is a real
``DeltaTable.merge`` (low-shuffle, file-pruned by the merge predicate). In
environments without Delta (this container) the same semantics run as a
full-outer-join rewrite + atomic overwrite — correct, but O(target) IO; the
Delta path is the 100 TB path.

Predicates reference the aliases ``current`` (target) and ``new`` (source),
exactly as in the reference.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_engine_spark.core.definitions import MergeOptions
from lakehouse_engine_spark.core.exec_env import ExecEnv


def merge(
    spark: SparkSession,
    df: DataFrame,
    merge_opts: MergeOptions,
    location: Optional[str] = None,
    db_table: Optional[str] = None,
    data_format: str = "delta",
) -> None:
    """Merge ``df`` (alias ``new``) into the target (alias ``current``)."""
    if ExecEnv.delta_available() and data_format == "delta":
        _merge_delta(spark, df, merge_opts, location, db_table)
    else:
        _merge_rewrite(spark, df, merge_opts, location, db_table, data_format)


def _target_exists(spark: SparkSession, location: Optional[str], db_table: Optional[str]) -> bool:
    # A real existence check, not a read wrapped in a bare except: the
    # "missing" branch OVERWRITES the target as a first load, so treating
    # a corrupt table or a transient FS error as "missing" would destroy
    # the target. Only a genuinely absent path/table means first load.
    if db_table:
        return spark.catalog.tableExists(db_table)
    from lakehouse_engine_spark.utils.fs_utils import path_exists

    return path_exists(spark, location)


def _merge_delta(spark, df, opts: MergeOptions, location, db_table) -> None:
    """Native Delta merge (used on real deployments)."""
    from delta.tables import DeltaTable

    if not _target_exists(spark, location, db_table):
        writer = df.write.format("delta").mode("overwrite")
        writer.saveAsTable(db_table) if db_table else writer.save(location)
        return
    tgt = (
        DeltaTable.forName(spark, db_table) if db_table else DeltaTable.forPath(spark, location)
    )
    builder = tgt.alias("current").merge(df.alias("new"), opts.merge_predicate)
    if not opts.insert_only:
        if opts.delete_predicate:
            builder = builder.whenMatchedDelete(condition=opts.delete_predicate)
        if opts.update_column_set:
            builder = builder.whenMatchedUpdate(
                condition=opts.update_predicate, set=opts.update_column_set
            )
        else:
            builder = builder.whenMatchedUpdateAll(condition=opts.update_predicate)
    if opts.insert_column_set:
        builder = builder.whenNotMatchedInsert(
            condition=opts.insert_predicate, values=opts.insert_column_set
        )
    else:
        builder = builder.whenNotMatchedInsertAll(condition=opts.insert_predicate)
    builder.execute()


def _merge_rewrite(spark, df, opts: MergeOptions, location, db_table, data_format) -> None:
    """Join-based merge for non-Delta targets.

    Packs each side into a struct column named after its merge alias so the
    user's ``current.x = new.y`` predicates evaluate unchanged as struct-field
    accesses.
    """
    fmt = data_format if data_format != "delta" else "parquet"
    if not _target_exists(spark, location, db_table):
        writer = df.write.format(fmt).mode("overwrite")
        writer.saveAsTable(db_table) if db_table else writer.save(location)
        return

    target = spark.read.table(db_table) if db_table else spark.read.format(fmt).load(location)
    cols = target.columns
    cur = target.select(F.struct(*target.columns).alias("current"))
    new = df.select(F.struct(*df.columns).alias("new"))
    joined = cur.join(new, on=F.expr(opts.merge_predicate), how="full_outer")

    target_only = joined.filter(F.col("new").isNull()).select("current.*")
    matched = joined.filter(F.col("current").isNotNull() & F.col("new").isNotNull())
    source_only = joined.filter(F.col("current").isNull())

    if opts.insert_only:
        kept_matched = matched.select("current.*")
    else:
        if opts.delete_predicate:
            matched = matched.filter(~F.expr(opts.delete_predicate))
        upd_cond = F.expr(opts.update_predicate) if opts.update_predicate else F.lit(True)
        to_update = matched.filter(upd_cond)
        untouched = matched.filter(~upd_cond) if opts.update_predicate else matched.limit(0)
        if opts.update_column_set:
            upd_cols = [
                F.expr(opts.update_column_set[c]).alias(c)
                if c in opts.update_column_set
                else F.col(f"current.{c}").alias(c)
                for c in cols
            ]
        else:
            upd_cols = [F.col(f"new.{c}").alias(c) for c in cols]
        kept_matched = to_update.select(*upd_cols).unionByName(untouched.select("current.*"))

    if opts.insert_predicate:
        source_only = source_only.filter(F.expr(opts.insert_predicate))
    if opts.insert_column_set:
        ins_cols = [
            F.expr(opts.insert_column_set[c]).alias(c)
            if c in opts.insert_column_set
            else F.lit(None).cast(dict(target.dtypes)[c]).alias(c)
            for c in cols
        ]
    else:
        ins_cols = [F.col(f"new.{c}").alias(c) for c in cols]
    inserts = source_only.select(*ins_cols)

    result = target_only.unionByName(kept_matched).unionByName(inserts)
    # Materialize before overwriting the table we read from.
    result = result.localCheckpoint(eager=True)
    writer = result.write.format(fmt).mode("overwrite")
    writer.saveAsTable(db_table) if db_table else writer.save(location)
