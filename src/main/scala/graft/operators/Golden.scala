package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record construction (survivorship) — the step after entity
  * resolution: duplicate records of one real-world entity merge into a
  * single best record, each field taken from the LATEST row where that
  * field is non-null ("most recent non-null wins", the standard MDM
  * survivorship rule).
  *
  * Mechanism: per field, `max(struct(seq, value))` over the non-null
  * rows — struct ordering compares seq first, so the aggregate IS
  * arg-max-by-seq, it ignores null values by construction (the `when`
  * leaves them out), and it is partial-aggregatable (map-side combine;
  * no window, no sort). `seqCol` must totally order rows within a
  * cluster — pass a (ts, id) struct if timestamps tie.
  *
  * Scale shape: ONE hash aggregation on the cluster key with map-side
  * partials of struct maxima. Nothing else moves.
  */
object Golden {

  /** One row per cluster: `clusterCol` + each of `cols` resolved by
    * latest-non-null (null only when the field is null in EVERY row). */
  def goldenRecords(df: DataFrame, clusterCol: String, seqCol: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "goldenRecords needs at least one field")
    val aggs = cols.map(c =>
      max(when(col(c).isNotNull, struct(col(seqCol).as("s"), col(c).as("v"))))
        .getField("v").as(c))
    df.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }
}
