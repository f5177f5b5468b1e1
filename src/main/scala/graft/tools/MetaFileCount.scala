package graft.tools
import org.apache.spark.sql.SparkSession
object MetaFileCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = "/tmp/metatest_root"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val v = graft.sources.VersionedPool.publishMeta(spark, root,
      Seq("b00001"), Seq("sketch_k" -> 64.0), None, "doc_id",
      org.apache.spark.sql.types.LongType,
      Some((1 to 40).map(i => ("grain", s"k$i", i.toDouble)).toDF("kind", "key", "num")))
    println("PUBLISHED v" + v)
    println("NFILES " + new java.io.File(s"$root/meta/v=00001").listFiles()
      .count(_.getName.endsWith(".parquet")))
    spark.stop()
  }
}
