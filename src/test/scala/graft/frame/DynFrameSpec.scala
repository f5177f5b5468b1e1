package graft.frame

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.types._

class DynFrameSpec extends SparkSpec {
  import spark.implicits._

  private def people = DynFrame(Seq(
    (1L, "ann", 30, 10.5), (2L, "bob", 20, 20.0), (3L, "cat", 25, 5.25)
  ).toDF("id", "name", "age", "score"), "people")

  test("selectFields keeps listed fields") {
    assert(people.selectFields(Seq("id", "name")).toDF.columns.toSeq == Seq("id", "name"))
  }

  test("dropFields drops top-level and nested fields") {
    val nested = DynFrame(Seq((1L, ("x", 2.0))).toDF("id", "s")
      .select(col("id"), col("s").as("s")), "n")
    assert(people.dropFields(Seq("score")).toDF.columns.toSeq == Seq("id", "name", "age"))
    val df = Seq((1L, "a", 1.0)).toDF("id", "f1", "f2")
      .select(col("id"), struct(col("f1"), col("f2")).as("s"))
    val dropped = DynFrame(df, "x").dropFields(Seq("s.f2")).toDF
    assert(dropped.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("f1"))
  }

  test("renameField renames top-level and nested") {
    assert(people.renameField("name", "nm").toDF.columns.contains("nm"))
    val df = Seq((1L, "a")).toDF("id", "f1").select(col("id"), struct(col("f1")).as("s"))
    val renamed = DynFrame(df, "x").renameField("s.f1", "g1").toDF
    assert(renamed.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("g1"))
  }

  test("applyMapping projects, renames, and casts in one op") {
    val out = people.applyMapping(Seq(
      ("id", "long", "pid", "string"),
      ("score", "double", "points", "int"))).toDF
    assert(out.schema.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("pid", StringType), ("points", IntegerType)))
    assert(out.orderBy("pid").collect().map(_.getInt(1)).toSeq == Seq(10, 20, 5))
  }

  test("splitFields returns selected and rest") {
    val (sel, rest) = people.splitFields(Seq("id"))
    assert(sel.toDF.columns.toSeq == Seq("id"))
    assert(rest.toDF.columns.toSeq == Seq("name", "age", "score"))
  }

  test("splitRows partitions by comparator map") {
    val (m, u) = people.splitRows(Map("age" -> Map(">" -> 21)))
    assert(m.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(u.toDF.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("union with conflicting column types produces a choice, resolveChoice collapses it") {
    val a = DynFrame(Seq((1L, "x")).toDF("k", "v"), "a")
    val b = DynFrame(Seq(("2", "y")).toDF("k", "v"), "b") // k is string here
    val u = a.union(b)
    val gs = u.glueSchema
    assert(gs.fieldMap("k").dataType.isInstanceOf[GChoiceType])
    val cast = u.resolveChoice(Seq("k" -> "cast:long")).toDF
    assert(cast.schema("k").dataType == LongType)
    assert(cast.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // project: keeps only the named branch
    val proj = u.resolveChoice(Seq("k" -> "project:string")).toDF
    assert(proj.schema("k").dataType == StringType)
    assert(proj.select("k").na.drop().as[String].collect().sorted.toSeq == Seq("2"))
    // make_cols: one column per branch
    val cols = u.resolveChoice(Seq("k" -> "make_cols")).toDF
    assert(cols.columns.toSet == Set("v", "k_long", "k_string"))
    // make_struct: identity on the encoding
    assert(u.resolveChoice(Seq("k" -> "make_struct")).toDF.schema("k").dataType.isInstanceOf[StructType])
  }

  test("union with a NESTED type conflict produces a nested choice; dotted resolveChoice collapses it") {
    val a = DynFrame(spark.sql("select 1 as id, named_struct('x', 5L, 'y', 'p') as s"), "a")
    val b = DynFrame(spark.sql("select 2 as id, named_struct('x', '7', 'y', 'q') as s"), "b")
    val u = a.union(b)
    // nested field x became a choice (struct of branches) inside s
    val sType = u.glueSchema.fieldMap("s").dataType.asInstanceOf[GStructType]
    assert(sType.fieldMap("x").dataType.isInstanceOf[GChoiceType])
    val resolved = u.resolveChoice(Seq("s.x" -> "cast:long")).toDF
    assert(resolved.schema("s").dataType.asInstanceOf[StructType]("x").dataType == LongType)
    val rows = resolved.select(col("id"), col("s.x"), col("s.y"))
      .as[(Int, Long, String)].collect().toSet
    assert(rows == Set((1, 5L, "p"), (2, 7L, "q")))
  }

  test("union aligns conflicting types inside ARRAYS of structs") {
    val a = DynFrame(spark.sql("select 1 as id, array(named_struct('v', 1L)) as xs"), "a")
    val b = DynFrame(spark.sql("select 2 as id, array(named_struct('v', 'two')) as xs"), "b")
    val u = a.union(b).toDF
    // element field v is a choice struct; project both branches
    val vals = u.select(col("id"), col("xs")(0).getField("v").getField("long").as("l"),
        col("xs")(0).getField("v").getField("string").as("st"))
      .as[(Int, Option[Long], Option[String])].collect().toSet
    assert(vals == Set((1, Some(1L), None), (2, None, Some("two"))))
  }

  test("union aligns missing columns as nulls") {
    val a = DynFrame(Seq((1L, "x")).toDF("k", "v"), "a")
    val b = DynFrame(Seq(Tuple1(2L)).toDF("k"), "b")
    val u = a.union(b).toDF
    assert(u.count() == 2)
    assert(u.filter(col("v").isNull).count() == 1)
  }

  test("mergeDynamicFrame: stage overwrites matching PKs, source rows retained") {
    val source = DynFrame(Seq((1L, "old"), (2L, "keep")).toDF("k", "v"), "src")
    val stage = DynFrame(Seq((1L, "new"), (3L, "ins")).toDF("k", "v"), "stg")
    val out = source.mergeDynamicFrame(stage, Seq("k")).toDF
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
  }

  test("subtract is EXCEPT") {
    val a = DynFrame(Seq(1L, 2L, 3L).toDF("x"), "a")
    val b = DynFrame(Seq(2L).toDF("x"), "b")
    assert(a.subtract(b).toDF.as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("dropNullFields removes NullType columns incl. inside structs") {
    val df = spark.sql("select 1 as a, null as b, named_struct('x', 1, 'y', null) as s")
    val out = DynFrame(df, "x").dropNullFields().toDF
    assert(out.columns.toSet == Set("a", "s"))
    assert(out.schema("s").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("x"))
  }

  test("filterRows drops data-shape errors silently, records others") {
    val f = people.filterRows({ r =>
      val id = r.getAs[Long]("id")
      if (id == 2L) throw new RuntimeException("boom")
      if (id == 3L) throw new IllegalArgumentException("shape")
      true
    }, "t")
    assert(f.toDF.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(f.stageErrorsCount() == 1) // only the RuntimeException
    val errs = f.errorsAsDynamicFrame().toDF.collect()
    assert(errs.length == 1 && errs(0).getAs[String]("errorMessage").contains("boom"))
  }

  test("mapRows transforms with error capture; thresholds enforce on action") {
    val schema = StructType(Seq(StructField("id2", LongType)))
    val m = people.mapRows({ r =>
      val id = r.getAs[Long]("id")
      if (id == 2L) None else Some(Row(id * 10))
    }, schema, "m")
    assert(m.toDF.as[Long].collect().sorted.toSeq == Seq(10L, 30L))
    assert(m.errorsCount() == 1)
    val strict = m.withThresholds(stage = 0)
    intercept[IllegalArgumentException](strict.count())
  }

  test("spigot writes a sample and passes the frame through") {
    val dir = java.nio.file.Files.createTempDirectory("spigot").toString
    val out = people.spigot(s"$dir/sample", topk = Some(2))
    assert(out.toDF.count() == 3)
    assert(spark.read.json(s"$dir/sample").count() == 2)
  }

  test("resolveChoiceAll applies one action to every choice column") {
    val a = DynFrame(Seq((1L, 10L)).toDF("k", "v"), "a")
    val b = DynFrame(Seq(("2", "20")).toDF("k", "v"), "b")
    val resolved = a.union(b).resolveChoiceAll("cast:long").toDF
    assert(resolved.schema("k").dataType == LongType)
    assert(resolved.schema("v").dataType == LongType)
    assert(resolved.orderBy("k").as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("resolveChoiceMatchCatalog casts choices to the catalog schema") {
    val a = DynFrame(Seq((1L, "x")).toDF("k", "v"), "a")
    val b = DynFrame(Seq(("2", "y")).toDF("k", "v"), "b")
    val catalogSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    val out = a.union(b).resolveChoiceMatchCatalog(catalogSchema).toDF
    assert(out.schema("k").dataType == StringType)
    assert(out.select("k").as[String].collect().sorted.toSeq == Seq("1", "2"))
  }

  test("withEnumCheck nullifies or raises on out-of-set values") {
    val f = DynFrame(Seq("RGB", "BB", "XX").toDF("t"), "e")
    val nulled = f.withEnumCheck("t", Set("RGB", "BB")).toDF
    assert(nulled.filter(col("t").isNull).count() == 1)
    val strict = f.withEnumCheck("t", Set("RGB", "BB"), onViolation = "error")
    intercept[Exception](strict.toDF.collect())
  }

  test("mapPartitionsRows and mapPartitionsWithIndexRows") {
    val schema = StructType(Seq(StructField("n", LongType)))
    val doubled = people.mapPartitionsRows(
      it => it.map(r => Row(r.getAs[Long]("id") * 2)), schema)
    assert(doubled.toDF.as[Long].collect().sorted.toSeq == Seq(2L, 4L, 6L))
    val withIdx = people.repartition(2).mapPartitionsWithIndexRows(
      (i, it) => it.map(_ => Row(i.toLong)), schema)
    assert(withIdx.toDF.as[Long].collect().toSet.subsetOf(Set(0L, 1L)))
  }

  test("collection ops") {
    val c: DynFrame.Collection = Map("a" -> people)
    val mapped = DynFrame.mapCollection(c)(f => f.selectFields(Seq("id")))
    assert(DynFrame.select(mapped, "a").toDF.columns.toSeq == Seq("id"))
  }

  test("fromRdd builds a frame from an RDD with the given schema") {
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val rdd = spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(2L, null)), 2)
    val f = DynFrame.fromRdd(spark, rdd, schema, "rdd_src")
    assert(f.toDF.schema == schema)
    assert(f.toDF.as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (2L, None)))
    // frame ops compose on an RDD-sourced frame
    assert(f.selectFields(Seq("id")).toDF.columns.toSeq == Seq("id"))
  }
}
