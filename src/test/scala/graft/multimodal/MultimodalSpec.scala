package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, Array[Byte](1, 2, 3, 4), Row("jpeg", 4000, 3000, null)),
      Row(2L, Array[Byte](9, 9), Row("png", 800, 600, null)),
      Row(3L, null, Row("jpeg", 10, 10, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      Multimodal.MediaSchema.copy()) // media_id, payload, meta
  }

  test("decodeImages appends dims; null payload yields null dims") {
    val out = Multimodal.decodeImages(mediaDf)
    assert(out.columns.takeRight(3).toSeq == Seq("dec_width", "dec_height", "dec_channels"))
    val byId = out.select("media_id", "dec_width").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(byId(1L).isDefined && byId(3L).isEmpty)
    // deterministic: same payload, same decode
    val out2 = Multimodal.decodeImages(mediaDf)
    assert(out.orderBy("media_id").collect().toSeq == out2.orderBy("media_id").collect().toSeq)
  }

  test("extractFeatures produces fixed-dim float vectors ready for ANN") {
    val out = Multimodal.extractFeatures(mediaDf, dim = 16)
    val vecs = out.filter(col("payload").isNotNull)
      .select("embedding").as[Seq[Float]].collect()
    assert(vecs.forall(_.length == 16))
    assert(vecs.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
    // distinct payloads -> distinct embeddings
    assert(vecs.toSet.size == 2)
  }

  test("mapInBatches delivers fixed-size batches per partition") {
    val df = spark.range(0, 100, 1, 2).toDF("id")
    // emit one row per batch carrying its size (closures run on executors,
    // so sizes must travel through the data)
    val out = Multimodal.mapInBatches(df,
      StructType(Seq(StructField("n", IntegerType))), batchSize = 16) { batch =>
      Iterator.single(Row(batch.size))
    }
    val observed = out.as[Int].collect().toSeq
    assert(observed.sum == 100)
    assert(observed.max <= 16)
    assert(observed.count(_ == 16) == 6) // two partitions of 50 -> 3 full batches each
  }

  test("resizeMeta preserves aspect ratio within the target box") {
    val out = Multimodal.resizeMeta(mediaDf, 1000, 1000)
    val dims = out.select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(dims(1L) == (1000, 750))  // 4000x3000 scaled by 1/4
    assert(dims(2L) == (800, 600))   // already inside the box: untouched
  }

  test("sampleFrames explodes one row per sampled frame index") {
    val vid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null, Row("mp4", 1920, 1080, 2000L)))),
      Multimodal.MediaSchema)
    val out = Multimodal.sampleFrames(vid, fps = 2.0, maxFrames = 3)
    // 2 fps over 2000ms -> 0, 500, 1000, 1500 capped at 3 frames
    assert(out.select("frame_ms").as[Long].collect().toSeq == Seq(0L, 500L, 1000L))
  }
}
