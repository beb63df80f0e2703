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
}
