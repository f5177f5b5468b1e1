package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply — folding a stream of keyed I/U/D change
  * records into a base snapshot (the Delta/Iceberg MERGE-from-CDC
  * pattern, and the core of any warehouse replication pipeline).
  *
  * Semantics: per key, changes order by `seqCol` (a change-log position —
  * MUST be unique per key, the CDC contract; ties would make "last"
  * meaningless) and only the LAST change matters: op `D` deletes the
  * key, anything else upserts the change row's payload. Keys without
  * changes pass through from the base.
  *
  * Scale shape: the change log reduces FIRST (one shuffle of the
  * changes, which are delta-sized — the base, typically 1000× larger,
  * is never windowed), then one co-partitioned outer join applies the
  * reduced deltas to the base. At 100 TB this is the difference between
  * windowing a petabyte and windowing a day's changes.
  */
object Cdc {

  /** Apply `changes` (payload columns = base columns + `opCol` +
    * `seqCol`) to `base`. Returns the new snapshot with base's schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String, seqCol: String,
                   deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs key columns")
    val payload = base.columns.toSeq
    require(payload.forall(changes.columns.contains),
      s"changes must carry every base column; missing ${payload.filterNot(changes.columns.contains)}")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keyCols.map(col) ++
        Seq(col(opCol).as("__op")) ++
        payload.filterNot(keyCols.contains).map(c => col(c).as(s"__new_$c")): _*)
    base.join(last, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(payload.map { c =>
        if (keyCols.contains(c)) col(c)
        else when(col("__op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
