package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse maintenance without a table format: merge semantics as
  * copy-on-write DataFrame algebra. The reference's `to_sql` load
  * can only append or replace; a production star schema needs upsert
  * and slowly-changing-dimension history. On a lake these are
  * rewrite-the-affected-partitions operations — pair with
  * StarSchemaSink.partitionBy so a merge only rewrites partitions
  * containing touched keys.
  */
object Merge {

  /** Upsert: rows in `updates` replace same-key rows in `current`;
    * unmatched update rows append. One anti-join + union — the
    * at-scale cost is rewriting partitions that contain updated
    * keys, nothing else.
    */
  def upsert(current: DataFrame, updates: DataFrame, key: String): DataFrame =
    current.join(updates.select(key), Seq(key), "left_anti")
      .unionByName(updates)

  /** SCD Type-2 merge: `current` carries (key, attrs..., valid_from,
    * valid_to with null = open). For each update row whose attrs
    * differ from the key's open version (or whose key is new), the
    * open version is closed at `batchTs` and a new open version is
    * inserted. Unchanged keys pass through untouched, so re-running
    * the same batch is a no-op (idempotent under replay).
    */
  def scd2(current: DataFrame, updates: DataFrame, key: String,
      batchTs: Timestamp): DataFrame = {
    val attrs = updates.columns.filterNot(_ == key).toSeq
    // xxhash64, not the 32-bit murmur `hash`: a 32-bit collision
    // between old and new attrs silently skips a close/insert —
    // ~2^-32 per updated key is a real event at warehouse scale
    val uh = updates.withColumn("_h", xxhash64(attrs.map(col): _*))
    val open = current.filter(col("valid_to").isNull)
      .withColumn("_h", xxhash64(attrs.map(col): _*))
    val history = current.filter(col("valid_to").isNotNull)

    // keys whose open version differs, plus brand-new keys
    val changed = uh.as("u")
      .join(open.select(col(key), col("_h").as("_oh")), Seq(key), "left")
      .filter(col("_oh").isNull || col("_h") =!= col("_oh"))
      .select(col(key))

    val closing = open.join(changed, Seq(key), "left_semi")
      .withColumn("valid_to", lit(batchTs))
      .drop("_h")
    val untouched = open.join(changed, Seq(key), "left_anti").drop("_h")
    val inserts = updates.join(changed, Seq(key), "left_semi")
      .withColumn("valid_from", lit(batchTs))
      .withColumn("valid_to", lit(null).cast("timestamp"))

    history
      .unionByName(closing)
      .unionByName(untouched)
      .unionByName(inserts)
  }

  /** Gate: the [[scd2]] merge driven by real data and checked by an
    * oracle that re-derives the expected versioned state from the
    * source directly. Current = each customer's 1995 max order value
    * (cents) valid from 1995-12-31; updates = the 1996 values; merge
    * at 1996-12-31; read back AS OF 1997-06-30. Changed/new keys must
    * surface the 1996 version (valid_from 1996-12-31), unchanged and
    * 95-only keys the untouched 1995 version — the close / insert /
    * pass-through triple in one query. Attrs are integer cents, so
    * the changed-detection equality is exact on both engines.
    */
  def scd2AsOf(spark: org.apache.spark.sql.SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    def yearSlice(yr: Int): DataFrame =
      graft.Tables.orders(spark, dir)
        .filter(year($"o_orderdate") === yr && $"o_custkey" <= 200)
        .groupBy($"o_custkey".as("custkey"))
        .agg(max(round($"o_totalprice" * 100).cast("long")).as("max_cents"))
    val t95 = Timestamp.valueOf("1995-12-31 00:00:00")
    val t96 = Timestamp.valueOf("1996-12-31 00:00:00")
    val asof = Timestamp.valueOf("1997-06-30 00:00:00")
    val current = yearSlice(1995)
      .withColumn("valid_from", lit(t95))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    scd2(current, yearSlice(1996), "custkey", t96)
      .filter($"valid_from" <= lit(asof) &&
        ($"valid_to".isNull || $"valid_to" > lit(asof)))
      .select($"custkey", $"max_cents", $"valid_from")
      .orderBy($"custkey")
  }

  val scd2AsOfSql: String =
    """WITH a95 AS (
         SELECT o_custkey AS custkey,
                max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
         FROM orders
         WHERE year(o_orderdate) = 1995 AND o_custkey <= 200
         GROUP BY 1),
       a96 AS (
         SELECT o_custkey AS custkey,
                max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
         FROM orders
         WHERE year(o_orderdate) = 1996 AND o_custkey <= 200
         GROUP BY 1)
       SELECT coalesce(a95.custkey, a96.custkey) AS custkey,
              CASE WHEN a96.custkey IS NOT NULL
                    AND (a95.custkey IS NULL
                         OR a95.max_cents <> a96.max_cents)
                   THEN a96.max_cents ELSE a95.max_cents END AS max_cents,
              CASE WHEN a96.custkey IS NOT NULL
                    AND (a95.custkey IS NULL
                         OR a95.max_cents <> a96.max_cents)
                   THEN TIMESTAMP '1996-12-31'
                   ELSE TIMESTAMP '1995-12-31' END AS valid_from
       FROM a95 FULL OUTER JOIN a96 ON a95.custkey = a96.custkey
       ORDER BY custkey"""
}
