package graft.restructure

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The distinctive Glue nested-data operators (SURVEY.md §2.8), implemented
  * as schema-recursive rewrites over built-in Spark operators — no Catalyst
  * extension needed; every emitted plan stays inside whole-stage codegen.
  */
object Restructure {

  // ------------------------------------------------------------------ unnest

  /** Flatten all nested structs to top-level columns with dotted names
    * (`dynamicframe.py:310-322`, `transforms/unnest_frame.py:15-32`).
    * Arrays are left in place (relationalize is the operator that pivots
    * them out). Pure projection — zero shuffle at any scale. */
  def unnest(df: DataFrame): DataFrame = {
    def expand(prefix: String, dt: DataType): Seq[Column] = dt match {
      case s: StructType =>
        s.fields.toIndexedSeq.flatMap(f => expand(s"$prefix.${f.name}", f.dataType))
      case _ => Seq(col(prefix).as(prefix))
    }
    val cols = df.schema.fields.toIndexedSeq.flatMap {
      case StructField(n, s: StructType, _, _) => s.fields.toIndexedSeq.flatMap(f => expand(s"$n.${f.name}", f.dataType))
      case StructField(n, _, _, _)             => Seq(col(n))
    }
    df.select(cols: _*)
  }

  /** [[unnest]] with the reference's array-joinkey generation
    * (`dynamicframe.py:311-313` "also generates joinkeys for array
    * objects"): each array column is replaced by a `<name>.joinkey` column
    * carrying the SAME deterministic content-hash key [[relationalize]]
    * synthesizes as its root id — so the joinkeys of an unnested parent
    * join directly to the `(id, index, val…)` child tables relationalize
    * pivots out of the same frame. Still a pure projection — no shuffle. */
  def unnest(df: DataFrame, generateArrayKeys: Boolean): DataFrame = {
    val flat = unnest(df)
    if (!generateArrayKeys) return flat
    val arrayCols = flat.schema.fields.filter(_.dataType.isInstanceOf[ArrayType])
    if (arrayCols.isEmpty) return flat
    val key = xxhash64(flat.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
    val cols = flat.schema.fields.toIndexedSeq.map { f =>
      if (f.dataType.isInstanceOf[ArrayType]) key.as(s"${f.name}.joinkey")
      else col(s"`${f.name}`")
    }
    flat.select(cols: _*)
  }

  // --------------------------------------------------------- relationalize

  /** Decompose a nested frame into a collection of flat tables
    * (`dynamicframe.py:324-345`, `transforms/relationalize.py:16-47`):
    * structs are unnested in place; each array column is pivoted into a
    * child table `(joinkey id, index, val…)` and replaced in the parent by
    * the joinkey.
    *
    * Key stability: the reference generates synthetic joinkeys. At 100 TB,
    * `monotonically_increasing_id` is partition-dependent and breaks
    * determinism across re-runs, so the caller may supply a natural key
    * column (`idCol`); when absent we fall back to a content hash
    * (`xxhash64` over the parent row), which is deterministic for distinct
    * parents regardless of partitioning. */
  def relationalize(df: DataFrame, rootName: String, idCol: Option[String] = None): Map[String, DataFrame] = {
    val flat = unnest(df)
    val arrayCols = flat.schema.fields.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    if (arrayCols.isEmpty) return Map(rootName -> flat)

    val withId = idCol match {
      case Some(k) => flat.withColumn(s"$rootName._id", col(k))
      case None    => flat.withColumn(s"$rootName._id",
        xxhash64(flat.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
    }

    val children = arrayCols.flatMap { ac =>
      val childName = s"$rootName.$ac"
      val elemType = flat.schema(ac).dataType.asInstanceOf[ArrayType].elementType
      val exploded = withId
        .select(col(s"`$rootName._id`").as("id"), posexplode(col(s"`$ac`")).as(Seq("index", "val")))
      val child = elemType match {
        case _: StructType => unnest(exploded.select(col("id"), col("index"), col("val.*")))
        case _             => exploded
      }
      // recurse: arrays still nested inside the child (arrays-of-structs-
      // of-arrays) pivot into grandchild tables; the child's joinkey is
      // its (id, index) pair hashed — deterministic given a deterministic
      // root id.
      if (child.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]))
        relationalize(child, childName)
      else Map(childName -> child)
    }.toMap

    val parent = arrayCols
      .foldLeft(withId) { (d, ac) => d.withColumn(ac, col(s"`$rootName._id`")) }
    Map(rootName -> parent) ++ children
  }

  /** [[relationalize]] with the reference's staging round-trip
    * (`transforms/relationalize.py:42-46`): every produced table is
    * written to `$stagingPath/<table>` as parquet and read back, so the
    * returned frames are materialized cuts (reused downstream without
    * recomputing the explode chain) rather than live lineage — the shape
    * the reference gets from its mandatory TempDir staging. */
  def relationalizeStaged(df: DataFrame, rootName: String, stagingPath: String,
                          idCol: Option[String] = None): Map[String, DataFrame] = {
    val spark = df.sparkSession
    relationalize(df, rootName, idCol).map { case (name, frame) =>
      val dest = s"$stagingPath/${name.replace('.', '_')}"
      frame.write.mode("overwrite").parquet(dest)
      name -> spark.read.parquet(dest)
    }
  }

  // ------------------------------------------------------------------ unbox

  /** Parse a string/binary column containing embedded JSON, CSV, or avro
    * into structured data (`dynamicframe.py:162-185`,
    * `transforms/unbox.py:15-35`). When no schema is given for JSON, one
    * inference pass samples the column; avro requires the writer schema as
    * its JSON string (`avroSchema`) and decodes via [[AvroCodec]]. */
  def unbox(df: DataFrame, path: String, format: String,
            schema: Option[DataType] = None,
            separator: String = ",", withHeader: Boolean = false,
            avroSchema: Option[String] = None): DataFrame = format match {
    case "json" =>
      val s = schema.getOrElse {
        // Inference pass: let the JSON reader sample the column. At scale,
        // prefer passing an explicit schema to skip this extra scan.
        df.sparkSession.read.json(df.select(col(path)).na.drop().as(
          org.apache.spark.sql.Encoders.STRING)).schema
      }
      df.withColumn(path, from_json(col(path), s))
    case "csv" =>
      val s = schema.getOrElse(throw new IllegalArgumentException("unbox csv requires a schema"))
      df.withColumn(path, from_csv(col(path), s.asInstanceOf[StructType], Map("sep" -> separator)))
    case "avro" =>
      val s = avroSchema.getOrElse(
        throw new IllegalArgumentException("unbox avro requires the writer schema JSON"))
      AvroCodec.unboxAvro(df, path, s)
    case other => throw new IllegalArgumentException(s"unbox format $other")
  }

  // --------------------------------------------------------- DynamoDB JSON

  /** Flatten the DynamoDB typed-JSON encoding (`dynamicframe.py:390-392`):
    * every struct level of shape `{"S": …, "N": …, "BOOL": …, "L": …,
    * "M": …}` drops the type-tag layer, keeping the populated branch —
    * recursively through maps (`M`) and lists (`L`). Scalar branches
    * stringify (coalesced S/N/BOOL — the DynamoDB export populates exactly
    * one); a tag struct with an `M` recurses into the inner attribute
    * struct; an `L` of tagged values maps the strip over the array. */
  def unnestDdbJson(df: DataFrame): DataFrame = {
    val tags = Set("S", "N", "BOOL", "L", "M", "SS", "NS", "B", "NULL")
    def isTagStruct(s: StructType): Boolean =
      s.fields.nonEmpty && s.fields.forall(f => tags.contains(f.name))
    def strip(c: Column, dt: DataType): Column = dt match {
      case s: StructType if isTagStruct(s) =>
        val scalar = Seq("S", "N", "BOOL").filter(s.fieldNames.contains)
        if (scalar.nonEmpty)
          coalesce(scalar.map(b => c.getField(b).cast(StringType)): _*)
        else if (s.fieldNames.contains("M"))
          strip(c.getField("M"), s("M").dataType)
        else if (s.fieldNames.contains("L"))
          s("L").dataType match {
            case ArrayType(et, _) => transform(c.getField("L"), e => strip(e, et))
            case _                => c.getField("L")
          }
        else if (s.fieldNames.contains("SS") || s.fieldNames.contains("NS")) {
          val b = if (s.fieldNames.contains("SS")) "SS" else "NS"
          c.getField(b).cast(ArrayType(StringType))
        } else c
      case s: StructType =>
        struct(s.fields.toIndexedSeq.map(f => strip(c.getField(f.name), f.dataType).as(f.name)): _*)
      case ArrayType(et, _) => transform(c, e => strip(e, et))
      case _ => c
    }
    val cols = df.schema.fields.toIndexedSeq.map(f => strip(col(f.name), f.dataType).as(f.name))
    df.select(cols: _*)
  }
}
