package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The estimator backs repartition decisions (Dedup.ensureParallelism,
  * Sources minPartitions floor) — these pin that it (a) never executes the
  * plan and (b) lands in the right ballpark for each leaf kind. */
class PartitionsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("single small parquet file estimates as few partitions") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val est = Partitions.estimateInputPartitions(df)
    assert(est >= 1 && est <= 4, s"got $est")
    // matches the decision the old .rdd probe made: scatter before compute
    assert(est * 2 < 32, "a single-file table must look under-parallel vs 32 slots")
  }

  test("larger multi-row-group file estimates higher than nation-sized file") {
    val small = Partitions.estimateInputPartitions(
      spark.read.parquet(s"$sf/nation.parquet"))
    val big = Partitions.estimateInputPartitions(
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet"))
    assert(big >= small)
  }

  test("driver-local relations estimate min(rows, defaultParallelism)") {
    val tiny = Seq(1, 2).toDF("x")
    assert(Partitions.estimateInputPartitions(tiny) == 2)
    val wide = spark.range(0, 1000).toDF()
    assert(Partitions.estimateInputPartitions(wide) <= spark.sparkContext.defaultParallelism)
  }

  test("shuffle-introducing plans report session shuffle partitions without executing") {
    val agg = spark.read.parquet(s"$sf/orders.parquet").groupBy("o_orderstatus").count()
    assert(Partitions.estimateInputPartitions(agg) ==
      spark.sessionState.conf.numShufflePartitions)
    val rep = spark.read.parquet(s"$sf/nation.parquet").repartition(7)
    assert(Partitions.estimateInputPartitions(rep) ==
      spark.sessionState.conf.numShufflePartitions)
  }

  test("RDD-backed plans report the RDD's partition count") {
    val rdd = spark.sparkContext.parallelize(Seq(1, 2, 3, 4, 5, 6), 3)
    val df = rdd.toDF("x")
    assert(Partitions.estimateInputPartitions(df) == 3)
  }

  test("planPartitions: explicit repartition/coalesce counts are exact") {
    val base = spark.read.parquet(s"$sf/nation.parquet")
    assert(Partitions.planPartitions(base.repartition(7)) == 7)
    assert(Partitions.planPartitions(base.repartition(7).coalesce(3)) == 3)
    // coalesce can only shrink: asking for more than exist keeps the child count
    assert(Partitions.planPartitions(base.repartition(2).coalesce(100)) == 2)
    assert(Partitions.planPartitions(base.repartition(5, col("n_regionkey"))) == 5)
    // matches what execution actually produces for the explicit cases
    assert(base.repartition(7).rdd.getNumPartitions == 7)
    assert(base.repartition(7).coalesce(3).rdd.getNumPartitions == 3)
  }

  test("planPartitions: shuffle ops report session shuffle partitions, scans the split count") {
    val agg = spark.read.parquet(s"$sf/orders.parquet").groupBy("o_orderstatus").count()
    assert(Partitions.planPartitions(agg) == spark.sessionState.conf.numShufflePartitions)
    val scan = spark.read.parquet(s"$sf/documents.parquet")
    assert(Partitions.planPartitions(scan) == Partitions.estimateInputPartitions(scan))
  }

  test("planPartitions backs DynFrame.getNumPartitions and runs ZERO jobs") {
    import graft.frame.DynFrame
    val fr = DynFrame(
      spark.read.parquet(s"$sf/lineitem.parquet").repartition(9), "p")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(fr.getNumPartitions == 9)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "getNumPartitions launched Spark jobs")
  }

  test("estimation does not run jobs") {
    // build the frames first — spark.read.parquet itself may run a footer
    // job; the claim under test is about the ESTIMATOR
    val file = spark.read.parquet(s"$sf/lineitem.parquet")
    val local = Seq(1).toDF("x")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Partitions.estimateInputPartitions(file)
    Partitions.estimateInputPartitions(local)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "estimator launched Spark jobs")
  }
}
