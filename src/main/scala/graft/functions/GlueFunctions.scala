package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column functions mirroring the reference's JVM function surface
  * (`glue-jobs/awsglue/functions.py:16-30`), built from codegen'd Spark
  * built-ins — no UDFs, no codegen breaks.
  */
object GlueFunctions {

  /** Replace the element at 0-based index `idx` in an array column
    * (`functions.py:16-19`): slice-before ++ [replacement] ++ slice-after.
    * Out-of-range index leaves the array unchanged (slice semantics). */
  def replaceArrayElement(src: Column, replacement: Column, idx: Int): Column = {
    require(idx >= 0, "replaceArrayElement index must be >= 0")
    when(size(src) > lit(idx),
      concat(
        slice(src, 1, idx),
        array(replacement),
        slice(src, idx + 2, Int.MaxValue - idx - 2)))
      .otherwise(src)
  }

  /** Build a struct column from named columns (`functions.py:21-26`). */
  def namedStruct(cols: (String, Column)*): Column =
    struct(cols.map { case (n, c) => c.as(n) }: _*)

  /** Explode an array with element index, aliased `(index, val)`
    * (`functions.py:28-30`) — exactly Spark's `posexplode` generator. */
  def explodeWithIndex(c: Column): Column = posexplode(c).as(Seq("index", "val"))
}
