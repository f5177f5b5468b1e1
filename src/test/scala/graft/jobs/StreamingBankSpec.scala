package graft.jobs

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class StreamingBankSpec extends SparkSpec {

  test("streamingDim runs the scd2 transform per micro-batch, incrementally") {
    val base = java.nio.file.Files.createTempDirectory("sbank").toString
    val rawDir = s"$base/raw"; new java.io.File(rawDir).mkdirs()
    val schema = StructType(Seq(
      StructField("cust_id", StringType), StructField("cust_nm", StringType)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$rawDir/batch1.csv"), "cust_id,cust_nm\n1,alice\n2,bob\n")

    val q = BankJobs.streamingDim(spark, rawDir, "scd2",
      s"$base/golden", s"$base/ckpt", schema, asOf = Some("2024-08-07 00:00:00"))
    try {
      q.processAllAvailable()
      val out1 = spark.read.parquet(s"$base/golden")
      assert(out1.count() == 2)
      assert(out1.columns.contains("is_active"))
      // a second file arrives -> only the new rows are processed/appended
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$rawDir/batch2.csv"), "cust_id,cust_nm\n3,carol\n")
      q.processAllAvailable()
      val out2 = spark.read.parquet(s"$base/golden")
      assert(out2.count() == 3)
      assert(out2.filter(col("cust_id") === "3").count() == 1)
    } finally q.stop()
  }
}
