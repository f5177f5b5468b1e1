package graft.restructure

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class RestructureSpec extends SparkSpec {
  import spark.implicits._

  test("unnest flattens nested structs to dotted columns") {
    val df = spark.sql(
      "select 1 as id, named_struct('a', 10, 'g', named_struct('b', 'x')) as s")
    val out = Restructure.unnest(df)
    assert(out.columns.toSeq == Seq("id", "s.a", "s.g.b"))
    val r = out.collect()(0)
    assert(r.getInt(1) == 10 && r.getString(2) == "x")
  }

  test("unnest leaves arrays in place") {
    val df = spark.sql("select 1 as id, array(1,2) as xs")
    assert(Restructure.unnest(df).schema("xs").dataType.isInstanceOf[ArrayType])
  }

  test("relationalize pivots arrays into child tables with joinkeys") {
    val df = spark.sql(
      """select * from values
        | (10, array(named_struct('v', 'a'), named_struct('v', 'b'))),
        | (20, array(named_struct('v', 'c')))
        | as t(pk, items)""".stripMargin)
    val frames = Restructure.relationalize(df, "root", idCol = Some("pk"))
    assert(frames.keySet == Set("root", "root.items"))
    val child = frames("root.items").orderBy("id", "index")
      .select("id", "index", "v").as[(Int, Int, String)].collect().toSeq
    assert(child == Seq((10, 0, "a"), (10, 1, "b"), (20, 0, "c")))
    // parent's array column replaced by the joinkey
    val parent = frames("root")
    assert(parent.select(col("items")).as[Int].collect().sorted.toSeq == Seq(10, 20))
  }

  test("relationalizeStaged round-trips every table through the staging path") {
    val df = spark.sql(
      """select * from values
        | (10, array(named_struct('v', 'a'), named_struct('v', 'b')))
        | as t(pk, items)""".stripMargin)
    val staging = java.nio.file.Files.createTempDirectory("relstage").toString
    val frames = Restructure.relationalizeStaged(df, "root", staging, idCol = Some("pk"))
    assert(frames.keySet == Set("root", "root.items"))
    assert(new java.io.File(s"$staging/root_items").exists())
    val child = frames("root.items").orderBy("index")
      .select("id", "index", "v").as[(Int, Int, String)].collect().toSeq
    assert(child == Seq((10, 0, "a"), (10, 1, "b")))
  }

  test("relationalize without idCol uses deterministic content hash") {
    val df = spark.sql("select * from values (1, array(5,6)) as t(pk, xs)")
    val f1 = Restructure.relationalize(df, "r")("r.xs").select("index", "val").as[(Int, Int)].collect().toSet
    val f2 = Restructure.relationalize(df.repartition(3), "r")("r.xs")
      .select("index", "val").as[(Int, Int)].collect().toSet
    assert(f1 == f2 && f1 == Set((0, 5), (1, 6)))
  }

  test("relationalize recurses through arrays nested inside child structs") {
    val df = spark.sql(
      """select * from values
        | (1, array(named_struct('tag', 'x', 'nums', array(7, 8))))
        | as t(pk, items)""".stripMargin)
    val frames = Restructure.relationalize(df, "root", idCol = Some("pk"))
    assert(frames.keySet == Set("root", "root.items", "root.items.nums"))
    val grandchild = frames("root.items.nums").orderBy("index")
      .select("index", "val").as[(Int, Int)].collect().toSeq
    assert(grandchild == Seq((0, 7), (1, 8)))
    // child's nums column was replaced by its joinkey, linking to grandchild
    val childKeys = frames("root.items").select("nums").as[Long].collect()
    val gcIds = frames("root.items.nums").select("id").as[Long].collect().distinct
    assert(childKeys.toSet == gcIds.toSet)
  }

  test("unbox parses embedded JSON with and without schema") {
    val df = Seq((1L, """{"k": 7, "s": "hi"}""")).toDF("id", "payload")
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    val out = Restructure.unbox(df, "payload", "json", Some(schema))
    assert(out.select("payload.k").as[Long].collect().toSeq == Seq(7L))
    val inferred = Restructure.unbox(df, "payload", "json", None)
    assert(inferred.select("payload.s").as[String].collect().toSeq == Seq("hi"))
  }

  test("unbox parses embedded CSV") {
    val df = Seq((1L, "7|hi")).toDF("id", "payload")
    val schema = StructType(Seq(StructField("k", LongType), StructField("s", StringType)))
    val out = Restructure.unbox(df, "payload", "csv", Some(schema), separator = "|")
    assert(out.select("payload.s").as[String].collect().toSeq == Seq("hi"))
  }

  test("unnestDdbJson strips DynamoDB type tags") {
    val df = spark.sql(
      """select named_struct('S', 'hello', 'N', cast(null as string)) as name,
        |       named_struct('N', '42', 'S', cast(null as string)) as qty""".stripMargin)
    val out = Restructure.unnestDdbJson(df)
    val r = out.collect()(0)
    assert(r.getString(0) == "hello" && r.getString(1) == "42")
  }

  test("unnestDdbJson recurses through M (map) and L (list) tags") {
    val df = spark.sql(
      """select named_struct('M', named_struct(
        |         'city', named_struct('S', 'hanoi'),
        |         'zip',  named_struct('N', '10000'))) as addr,
        |       named_struct('L', array(
        |         named_struct('S', 'a'), named_struct('S', 'b'))) as tags""".stripMargin)
    val out = Restructure.unnestDdbJson(df)
    val r = out.collect()(0)
    val addr = r.getStruct(0)
    assert(addr.getString(0) == "hanoi" && addr.getString(1) == "10000")
    assert(r.getSeq[String](1) == Seq("a", "b"))
  }

  test("unnest generateArrayKeys emits joinkeys that join relationalize's child tables") {
    val df = spark.sql(
      """select * from values
        | (10, named_struct('n', 'a'), array(1, 2)),
        | (20, named_struct('n', 'b'), array(3))
        | as t(pk, s, xs)""".stripMargin)
    val out = Restructure.unnest(df, generateArrayKeys = true)
    assert(out.columns.toSeq == Seq("pk", "s.n", "xs.joinkey"))
    // joinkey joins to the child table relationalize pivots from the same frame
    val child = Restructure.relationalize(df, "root")("root.xs")
    val joined = out.join(child, out("`xs.joinkey`") === child("id"))
      .select(col("pk"), col("val")).as[(Int, Int)].collect().toSet
    assert(joined == Set((10, 1), (10, 2), (20, 3)))
    // without the flag the array is left in place (default behavior pinned)
    assert(Restructure.unnest(df).schema("xs").dataType.isInstanceOf[ArrayType])
  }

  // ------------------------------------------------------------- unbox avro

  private val avroSchemaJson =
    """{"type":"record","name":"rec","fields":[
      | {"name":"a","type":"long"},
      | {"name":"b","type":["null","string"],"default":null},
      | {"name":"tags","type":{"type":"array","items":"string"}},
      | {"name":"meta","type":{"type":"map","values":"double"}},
      | {"name":"inner","type":{"type":"record","name":"in","fields":[
      |   {"name":"x","type":"int"}]}}]}""".stripMargin

  private def avroBytes(a: Long, b: Option[String], tags: Seq[String],
                        meta: Map[String, Double], x: Int): Array[Byte] = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    import scala.jdk.CollectionConverters._
    val schema = new Schema.Parser().parse(avroSchemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("a", a)
    rec.put("b", b.orNull)
    rec.put("tags", tags.asJava)
    rec.put("meta", meta.map { case (k, v) => k -> Double.box(v) }.asJava)
    val inner = new GenericData.Record(schema.getField("inner").schema())
    inner.put("x", x)
    rec.put("inner", inner)
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("unbox avro round-trips records, nullable unions, arrays, maps, nested structs") {
    val rows = Seq(
      (1L, avroBytes(7L, Some("hi"), Seq("t1", "t2"), Map("k" -> 1.5), 42)),
      (2L, avroBytes(8L, None, Nil, Map.empty, -1)),
      (3L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("id", "payload")
    val out = Restructure.unbox(df, "payload", "avro",
      avroSchema = Some(avroSchemaJson)).orderBy("id")
    val t = out.schema("payload").dataType.asInstanceOf[StructType]
    assert(t.fieldNames.toSeq == Seq("a", "b", "tags", "meta", "inner"))
    assert(t("a").dataType == LongType && t("b").dataType == StringType)
    val r = out.collect()
    val p1 = r(0).getStruct(1)
    assert(p1.getLong(0) == 7L && p1.getString(1) == "hi")
    assert(p1.getSeq[String](2) == Seq("t1", "t2"))
    assert(p1.getMap[String, Double](3) == Map("k" -> 1.5))
    assert(p1.getStruct(4).getInt(0) == 42)
    val p2 = r(1).getStruct(1)
    assert(p2.getLong(0) == 8L && p2.isNullAt(1) && p2.getSeq[String](2).isEmpty)
    assert(r(2).isNullAt(1)) // null payload stays null
  }

  test("unbox avro accepts base64 string columns and nulls undecodable payloads") {
    val good = java.util.Base64.getEncoder.encodeToString(
      avroBytes(9L, Some("ok"), Seq("z"), Map.empty, 1))
    val df = Seq((1L, good), (2L, "AA"), (3L, null.asInstanceOf[String]))
      .toDF("id", "payload")
    val out = Restructure.unbox(df, "payload", "avro",
      avroSchema = Some(avroSchemaJson)).orderBy("id").collect()
    assert(out(0).getStruct(1).getLong(0) == 9L)
    // "AA" = a single zero byte: truncated record → decode error → NULL
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("box->unbox avro round-trips 300 randomized rows (unicode, empties, nulls, extremes)") {
    import org.apache.spark.sql.Row
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ascii_x", "tiếng việt", "日本語テキスト", "emoji 🙂🚀", "tab\tnl\n", "")
    def randStr() = alphabets(rnd.nextInt(alphabets.length)) + rnd.nextInt(1000)
    val rows = (0 until 300).map { i =>
      Row(
        i.toLong,
        Row(
          rnd.nextLong(),
          if (rnd.nextBoolean()) randStr() else null,
          Seq.fill(rnd.nextInt(4))(randStr()),
          (0 until rnd.nextInt(3)).map(j => randStr() -> rnd.nextDouble()).toMap,
          Row(Seq(Int.MinValue, Int.MaxValue, 0, -1)(rnd.nextInt(4)))))
    }
    val inner = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", MapType(StringType, DoubleType)),
      StructField("inner", StructType(Seq(StructField("x", IntegerType))))))
    val schema = StructType(Seq(StructField("id", LongType), StructField("payload", inner)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val boxed = AvroCodec.boxAvro(df, "payload", avroSchemaJson)
    assert(boxed.schema("payload").dataType == BinaryType)
    val back = Restructure.unbox(boxed, "payload", "avro", avroSchema = Some(avroSchemaJson))
    val got = back.orderBy("id").collect().map(r => (r.getLong(0), r.getStruct(1)))
    val exp = rows.sortBy(_.getLong(0)).map(r => (r.getLong(0), r.getStruct(1)))
    got.zip(exp).foreach { case ((gi, gp), (ei, ep)) =>
      assert(gi == ei)
      assert(gp.getLong(0) == ep.getLong(0) && gp.getAs[String](1) == ep.getAs[String](1))
      assert(gp.getSeq[String](2) == ep.getSeq[String](2))
      assert(gp.getMap[String, Double](3).toMap == ep.getMap[String, Double](3).toMap)
      assert(gp.getStruct(4).getInt(0) == ep.getStruct(4).getInt(0))
    }
  }

  test("boxAvro matches struct fields to the writer schema by name, not position") {
    // struct declared in a DIFFERENT order than the avro schema; both
    // fields are strings so positional matching would silently swap them
    val schema = """{"type":"record","name":"r","fields":[
      | {"name":"first","type":"string"},{"name":"second","type":"string"}]}""".stripMargin
    val df = Seq((1L, "B-value", "A-value")).toDF("id", "second", "first")
      .select(col("id"), struct(col("second"), col("first")).as("payload"))
    val boxed = AvroCodec.boxAvro(df, "payload", schema)
    val back = Restructure.unbox(boxed, "payload", "avro", avroSchema = Some(schema))
      .select("payload.first", "payload.second").as[(String, String)].collect()(0)
    assert(back == (("A-value", "B-value")))
  }

  test("unbox avro rejects ambiguous multi-branch unions") {
    val bad = """{"type":"record","name":"r","fields":[
      | {"name":"u","type":["int","string"]}]}""".stripMargin
    val df = Seq((1L, Array[Byte](0))).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      Restructure.unbox(df, "payload", "avro", avroSchema = Some(bad))
    }
  }
}
