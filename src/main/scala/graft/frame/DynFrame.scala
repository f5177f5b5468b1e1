package graft.frame

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types._

/** Error envelope for row-level `map`/`filter` failures. The reference keeps
  * error records *inside* the frame (`dynamicframe.py:101-118`); we keep them
  * in a parallel DataFrame so the happy path stays fully Catalyst-optimizable
  * (SURVEY.md §7.4.5). */
case class ErrorRecord(stage: String, record: String, errorMessage: String)

/** Scala-native `DynamicFrame` (`glue-jobs/awsglue/dynamicframe.py:47-519`):
  * a thin wrapper over `DataFrame` carrying a name, error records, and
  * error thresholds. All transformations are lazy delegations to Dataset
  * operators — one JVM process space, no py4j boundary (SURVEY.md §3.3).
  *
  * Threshold semantics (`dynamicframe.py:80-94,493-519`): `stageThreshold`
  * bounds errors of the most recent transform, `totalThreshold` bounds the
  * cumulative count; both are enforced on action via
  * [[assertErrorThreshold]], not at declaration time.
  */
class DynFrame private (
    val df: DataFrame,
    val name: String,
    val errorFrames: Seq[(String, DataFrame)],
    val stageThreshold: Long,
    val totalThreshold: Long) {

  private def spark: SparkSession = df.sparkSession

  private def withDf(d: DataFrame, newName: String = name): DynFrame =
    new DynFrame(d, newName, errorFrames, stageThreshold, totalThreshold)

  def toDF: DataFrame = df
  def schema: StructType = df.schema
  def glueSchema: GStructType = GlueTypes.fromSparkSchema(df.schema)

  def withName(n: String): DynFrame = new DynFrame(df, n, errorFrames, stageThreshold, totalThreshold)
  def withThresholds(stage: Long = Long.MaxValue, total: Long = Long.MaxValue): DynFrame =
    new DynFrame(df, name, errorFrames, stage, total)

  // ------------------------------------------------------------ projections

  /** Keep listed (possibly nested, dot-separated) fields
    * (`dynamicframe.py:203-217`). Nested paths surface as dotted top-level
    * column names, matching Glue's flattened addressing. */
  def selectFields(paths: Seq[String]): DynFrame =
    withDf(df.select(paths.map(p => col(p).as(p)): _*))

  /** Drop listed fields, including fields nested inside structs
    * (`dynamicframe.py:187-201`); nested drops use `Column.dropFields`. */
  def dropFields(paths: Seq[String]): DynFrame = {
    val (nested, top) = paths.partition(_.contains("."))
    var out = df.drop(top: _*)
    nested.groupBy(_.takeWhile(_ != '.')).foreach { case (root, ps) =>
      if (out.columns.contains(root)) {
        val inner = ps.map(_.drop(root.length + 1))
        out = out.withColumn(root, col(root).dropFields(inner: _*))
      }
    }
    withDf(out)
  }

  /** Rename a (possibly nested) field (`dynamicframe.py:271-282`). */
  def renameField(oldName: String, newName: String): DynFrame =
    if (!oldName.contains(".")) withDf(df.withColumnRenamed(oldName, newName))
    else {
      val root = oldName.takeWhile(_ != '.')
      val rest = oldName.drop(root.length + 1)
      val tgt = if (newName.contains(".")) newName.drop(newName.takeWhile(_ != '.').length + 1) else newName
      withDf(df.withColumn(root, col(root).withField(tgt, col(oldName)).dropFields(rest)))
    }

  /** Declarative project+rename+cast (`dynamicframe.py:347-388`): each
    * mapping is (srcPath, srcType — informational, dstName, dstType). */
  def applyMapping(mappings: Seq[(String, String, String, String)], caseSensitive: Boolean = true): DynFrame = {
    val cols = mappings.map { case (src, _, dst, dstType) =>
      val c = if (caseSensitive) col(src) else col(resolveCaseInsensitive(src))
      c.cast(dstType).as(dst)
    }
    withDf(df.select(cols: _*))
  }

  private def resolveCaseInsensitive(p: String): String =
    df.columns.find(_.equalsIgnoreCase(p)).getOrElse(p)

  /** Split into (selected, rest) by field list (`dynamicframe.py:219-236`). */
  def splitFields(paths: Seq[String]): (DynFrame, DynFrame) = {
    val sel = paths.toSet
    val rest = df.columns.filterNot(sel.contains)
    (withDf(df.select(paths.map(col): _*), s"${name}_selected"),
     withDf(df.select(rest.map(col).toIndexedSeq: _*), s"${name}_rest"))
  }

  /** Split rows by comparator map `{path -> {op -> value}}`
    * (`dynamicframe.py:238-269`); ops: `>`, `<`, `>=`, `<=`, `=`, `!=`.
    * Returns (matching, non-matching). */
  def splitRows(comparisons: Map[String, Map[String, Any]]): (DynFrame, DynFrame) = {
    val pred = comparisons.toSeq.sortBy(_._1).flatMap { case (path, ops) =>
      ops.toSeq.sortBy(_._1).map { case (op, v) =>
        val c = col(path)
        op match {
          case ">"  => c > lit(v)
          case "<"  => c < lit(v)
          case ">=" => c >= lit(v)
          case "<=" => c <= lit(v)
          case "="  => c === lit(v)
          case "!=" => c =!= lit(v)
          case other => throw new IllegalArgumentException(s"unknown comparator $other")
        }
      }
    }.reduce(_ && _)
    (withDf(df.filter(pred), s"${name}_matched"), withDf(df.filter(!pred), s"${name}_unmatched"))
  }

  // ------------------------------------------------- row-level map / filter

  /** Row filter with error capture (`dynamicframe.py:80-94`). The reference
    * contract: KeyError/ValueError/TypeError ⇒ row silently dropped; any
    * other exception ⇒ error record. Scala mapping of those exception
    * classes: NoSuchElement/IllegalArgument/ClassCast (SURVEY.md §7.4.6).
    * NB the predicate runs once on the kept path and once on the error
    * path (two lazy frames over the same input) — `f` must be
    * deterministic and side-effect free, like any Spark closure. */
  def filterRows(f: Row => Boolean, stageName: String = "filter"): DynFrame = {
    val schema = df.schema
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema)
    val kept = df.filter { (r: Row) =>
      try f(r)
      catch {
        case _: NoSuchElementException | _: IllegalArgumentException | _: ClassCastException => false
        case _: Throwable => false
      }
    }
    implicit val errEnc: org.apache.spark.sql.Encoder[ErrorRecord] =
      org.apache.spark.sql.Encoders.product[ErrorRecord]
    val errs = df.flatMap { r =>
      try { f(r); None }
      catch {
        case _: NoSuchElementException | _: IllegalArgumentException | _: ClassCastException => None
        case e: Throwable => Some(ErrorRecord(stageName, r.toString, e.toString))
      }
    }.toDF()
    new DynFrame(kept, name, errorFrames :+ (stageName -> errs), stageThreshold, totalThreshold)
  }

  /** Row transform with error capture (`dynamicframe.py:101-118`): a `None`
    * result or any exception produces an error record and drops the row. */
  def mapRows(f: Row => Option[Row], targetSchema: StructType, stageName: String = "map"): DynFrame = {
    implicit val outEnc: ExpressionEncoder[Row] = ExpressionEncoder(targetSchema)
    val mapped = df.mapPartitions { it =>
      it.flatMap { r => try f(r) catch { case _: Throwable => None } }
    }(outEnc).toDF()
    implicit val errEnc: org.apache.spark.sql.Encoder[ErrorRecord] =
      org.apache.spark.sql.Encoders.product[ErrorRecord]
    val errs = df.flatMap { r =>
      try {
        if (f(r).isEmpty) Some(ErrorRecord(stageName, r.toString, "map returned None")) else None
      } catch { case e: Throwable => Some(ErrorRecord(stageName, r.toString, e.toString)) }
    }.toDF()
    new DynFrame(mapped, name, errorFrames :+ (stageName -> errs), stageThreshold, totalThreshold)
  }

  /** Partition-wise transform (`dynamicframe.py:96-99`) — the primitive
    * under map/filter; exposed for genuinely imperative per-partition logic
    * (connection pooling, batched lookups). */
  def mapPartitionsRows(f: Iterator[Row] => Iterator[Row], targetSchema: StructType): DynFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(targetSchema)
    withDf(df.mapPartitions(f)(enc).toDF())
  }

  /** Partition-wise transform with the partition index
    * (`dynamicframe.py:120-124`). */
  def mapPartitionsWithIndexRows(f: (Int, Iterator[Row]) => Iterator[Row],
                                 targetSchema: StructType): DynFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(targetSchema)
    val rdd = df.rdd.mapPartitionsWithIndex { case (i, it) => f(i, it) }
    withDf(df.sparkSession.createDataFrame(rdd, targetSchema))
  }

  // ----------------------------------------------------------------- joins

  /** Equi inner join on field paths — the only join type the DynamicFrame
    * API exposes (`dynamicframe.py:302-308`). Catalyst picks the physical
    * strategy (broadcast vs sort-merge). */
  def join(paths1: Seq[String], paths2: Seq[String], other: DynFrame): DynFrame = {
    require(paths1.length == paths2.length, "join key lists must align")
    val cond = paths1.zip(paths2).map { case (a, b) => df(a) === other.df(b) }.reduce(_ && _)
    withDf(df.join(other.df, cond, "inner"))
  }

  /** Upsert (`mergeDynamicFrame`, `dynamicframe.py:436-461`): staging rows
    * replace source rows with matching primary keys; unmatched source rows
    * are retained; duplicates within either side are NOT deduplicated. */
  def mergeDynamicFrame(stage: DynFrame, primaryKeys: Seq[String]): DynFrame =
    withDf(df.join(stage.df, primaryKeys, "left_anti").unionByName(stage.df))

  // ------------------------------------------------------------- set ops

  /** Schema-merging union (`dynamicframe.py:463-475`): columns are aligned
    * by name; a column typed differently on the two sides becomes a
    * [[GChoiceType]], encoded as a struct of branches (see [[GlueTypes]]);
    * columns present on one side only ride along as null on the other. */
  def union(other: DynFrame): DynFrame = {
    val merged = GlueTypes.mergeSchemas(glueSchema, other.glueSchema)
    val leftAligned = DynFrame.alignToSchema(df, merged)
    val rightAligned = DynFrame.alignToSchema(other.df, merged)
    withDf(leftAligned.unionByName(rightAligned))
  }

  /** EXCEPT (`crawler_undo.py:62`). */
  def subtract(other: DynFrame): DynFrame = withDf(df.except(other.df))

  // -------------------------------------------------------- resolveChoice

  /** Collapse choice columns (`dynamicframe.py:394-434`). Specs are
    * (path — possibly nested/dotted, action) with action ∈ `cast:<type>`,
    * `project:<type>`, `make_struct`, `make_cols` (make_cols is top-level
    * only — it changes the column set). */
  def resolveChoice(specs: Seq[(String, String)]): DynFrame = {
    def typeAt(gs: GStructType, path: String): Option[GlueType] =
      path.split('.').foldLeft(Option(gs: GlueType)) {
        case (Some(s: GStructType), seg) => s.fieldMap.get(seg).map(_.dataType)
        case _                           => None
      }
    var out = df
    specs.foreach { case (path, action) =>
      typeAt(GlueTypes.fromSparkSchema(out.schema), path) match {
        case Some(c: GChoiceType) =>
          val branches = c.sortedChoices.map(_.typeName)
          def setAt(value: Column): Unit =
            if (!path.contains(".")) out = out.withColumn(path, value)
            else {
              val root = path.takeWhile(_ != '.')
              out = out.withColumn(root, col(root).withField(path.drop(root.length + 1), value))
            }
          action match {
            case a if a.startsWith("cast:") =>
              val target = a.stripPrefix("cast:")
              setAt(org.apache.spark.sql.functions.coalesce(
                branches.map(b => col(path).getField(b).cast(target)): _*))
            case a if a.startsWith("project:") =>
              val target = a.stripPrefix("project:")
              require(branches.contains(target), s"choice $path has no branch $target (has: $branches)")
              setAt(col(path).getField(target))
            case "make_struct" => // identity: the encoding IS the struct
            case "make_cols" =>
              require(!path.contains("."), "make_cols supports top-level choice columns only")
              branches.foreach(b => out = out.withColumn(s"${path}_$b", col(s"$path.$b")))
              out = out.drop(path)
            case other => throw new IllegalArgumentException(s"unknown resolveChoice action $other")
          }
        case _ => // not a choice column: no-op, mirroring Glue's behavior
      }
    }
    withDf(out)
  }

  /** Global resolveChoice (`dynamicframe.py:394-434` `choice` param):
    * apply one action to every choice column. */
  def resolveChoiceAll(choice: String): DynFrame = {
    val choicePaths = glueSchema.fields.collect {
      case GField(n, _: GChoiceType, _) => n -> choice
    }
    resolveChoice(choicePaths)
  }

  /** MATCH_CATALOG resolution (`dynamicframe.py:404,427-433`): cast each
    * choice column to the type the catalog table declares for it. */
  def resolveChoiceMatchCatalog(catalogSchema: StructType): DynFrame = {
    val byName = catalogSchema.fields.map(f => f.name -> f.dataType).toMap
    val specs = glueSchema.fields.collect {
      case GField(n, _: GChoiceType, _) if byName.contains(n) =>
        n -> s"cast:${byName(n).simpleString}"
    }
    resolveChoice(specs)
  }

  /** Enum check (EnumType, `gluetypes.py:96-110` — Spark has no enum, so
    * the constraint is enforced here): values outside `options` either
    * become null ("nullify") or raise at execution ("error"). */
  def withEnumCheck(path: String, options: Set[String],
                    onViolation: String = "nullify"): DynFrame = {
    val ok = col(path).isNull || col(path).isin(options.toSeq: _*)
    val checked = onViolation match {
      case "nullify" => when(ok, col(path))
      case "error" => when(ok, col(path)).otherwise(
        raise_error(concat(lit(s"enum violation at $path: "), col(path).cast("string"))))
      case other => throw new IllegalArgumentException(s"onViolation: $other")
    }
    withDf(df.withColumn(path, checked))
  }

  // ------------------------------------------------- nulls / partitioning

  /** Drop all columns whose type is NullType, recursing into structs and
    * arrays-of-structs but not maps (`transforms/drop_nulls.py:17-42`). */
  def dropNullFields(): DynFrame = {
    def prune(dt: DataType): Option[DataType] = dt match {
      case NullType => None
      case s: StructType =>
        val kept = s.fields.flatMap(f => prune(f.dataType).map(t => f.copy(dataType = t)))
        if (kept.isEmpty) None else Some(StructType(kept))
      case ArrayType(e, n) => prune(e).map(ArrayType(_, n))
      case other => Some(other)
    }
    def rebuild(c: Column, dt: DataType, pruned: DataType): Column = (dt, pruned) match {
      case (s: StructType, p: StructType) =>
        struct(p.fields.toIndexedSeq.map(pf => rebuild(c.getField(pf.name), s(pf.name).dataType, pf.dataType).as(pf.name)): _*)
      case _ => c
    }
    val cols = df.schema.fields.toIndexedSeq.flatMap { f =>
      prune(f.dataType).map(p => rebuild(col(f.name), f.dataType, p).as(f.name))
    }
    withDf(df.select(cols: _*))
  }

  def repartition(n: Int): DynFrame = withDf(df.repartition(n))
  def coalesce(n: Int, shuffle: Boolean = false): DynFrame =
    if (shuffle) repartition(n) else withDf(df.coalesce(n))
  /** Physical partition count (`dynamicframe.py` getNumPartitions),
    * derived from plan metadata via [[graft.plan.Partitions
    * .planPartitions]] — never forces `toRdd`, which under AQE can
    * materialize query stages just to read a count (the repo-wide rule;
    * PartitionsSpec pins that this call runs zero jobs). Explicit
    * repartition/coalesce counts and scan splits are exact; AQE may
    * coalesce shuffle outputs further at runtime. */
  def getNumPartitions: Int = graft.plan.Partitions.planPartitions(df)

  /** Write a top-k or probabilistic sample mid-pipeline, pass the frame
    * through unchanged (`dynamicframe.py:296-300`). */
  def spigot(path: String, topk: Option[Int] = None, prob: Option[Double] = None): DynFrame = {
    val sample = (topk, prob) match {
      case (Some(k), _) => df.limit(k)
      case (_, Some(p)) => df.sample(p, seed = 42L)
      case _            => df.limit(100)
    }
    sample.write.mode("overwrite").json(path)
    this
  }

  // ------------------------------------------------------ errors / actions

  def count(): Long = { assertErrorThreshold(); df.count() }

  def errorsAsDynamicFrame(): DynFrame = {
    val errs =
      if (errorFrames.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.Encoders.product[ErrorRecord].schema)
      else errorFrames.map(_._2).reduce(_ unionByName _)
    new DynFrame(errs, s"${name}_errors", Nil, Long.MaxValue, Long.MaxValue)
  }

  def stageErrorsCount(): Long = errorFrames.lastOption.map(_._2.count()).getOrElse(0L)
  def errorsCount(): Long = errorFrames.map(_._2.count()).sum

  def assertErrorThreshold(): Unit = {
    if (stageThreshold != Long.MaxValue) {
      val s = stageErrorsCount()
      require(s <= stageThreshold, s"stage error count $s exceeds threshold $stageThreshold")
    }
    if (totalThreshold != Long.MaxValue) {
      val t = errorsCount()
      require(t <= totalThreshold, s"total error count $t exceeds threshold $totalThreshold")
    }
  }
}

object DynFrame {
  def apply(df: DataFrame, name: String = "frame"): DynFrame =
    new DynFrame(df, name, Nil, Long.MaxValue, Long.MaxValue)

  /** RDD source (`create_dynamic_frame_from_rdd`, `context.py:152-156`). */
  def fromRdd(spark: SparkSession, rdd: org.apache.spark.rdd.RDD[Row],
              schema: StructType, name: String = "frame"): DynFrame =
    apply(spark.createDataFrame(rdd, schema), name)

  /** Cast/embed a DataFrame's columns into the merged Glue schema —
    * recursively: a column (or struct field, or array element, at any
    * depth) whose type became a choice wraps into the struct-of-branches
    * encoding with this side's branch populated; fields present on one
    * side only ride along as nulls. */
  private[frame] def alignToSchema(df: DataFrame, target: GStructType): DataFrame = {
    def align(c: Column, current: GlueType, tgt: GlueType): Column = (current, tgt) match {
      case (cur, t) if cur == t => c
      case (cur, ch: GChoiceType) =>
        val branches = ch.sortedChoices.map { alt =>
          if (alt.typeName == cur.typeName) align(c, cur, alt).as(alt.typeName)
          else lit(null).cast(GlueTypes.toSpark(alt)).as(alt.typeName)
        }
        struct(branches: _*)
      case (cs: GStructType, ts: GStructType) =>
        val fields = ts.fields.map { tf =>
          cs.fieldMap.get(tf.name) match {
            case Some(cf) => align(c.getField(tf.name), cf.dataType, tf.dataType).as(tf.name)
            case None     => lit(null).cast(GlueTypes.toSpark(tf.dataType)).as(tf.name)
          }
        }
        struct(fields: _*)
      case (ca: GArrayType, ta: GArrayType) =>
        transform(c, e => align(e, ca.elementType, ta.elementType))
      case (ca: GSetType, ta: GSetType) =>
        transform(c, e => align(e, ca.elementType, ta.elementType))
      case (_, t) => c.cast(GlueTypes.toSpark(t))
    }
    val mySchema = GlueTypes.fromSparkSchema(df.schema)
    val cols = target.fields.map { gf =>
      val base = mySchema.fieldMap.get(gf.name) match {
        case Some(mf) => align(col(gf.name), mf.dataType, gf.dataType)
        case None     => lit(null).cast(GlueTypes.toSpark(gf.dataType))
      }
      gf.dataType match {
        case _: GChoiceType =>
          base.as(gf.name, new MetadataBuilder()
            .putBoolean(GlueTypes.ChoiceMetaKey, value = true).build())
        case _ => base.as(gf.name)
      }
    }
    df.select(cols: _*)
  }

  /** A named map of frames (`DynamicFrameCollection`,
    * `dynamicframe.py:522-593`). */
  type Collection = Map[String, DynFrame]

  def select(c: Collection, key: String): DynFrame = c(key)
  def mapCollection(c: Collection)(f: DynFrame => DynFrame): Collection = c.map { case (k, v) => k -> f(v) }
  def flatMapCollection(c: Collection)(f: DynFrame => Collection): Collection = c.flatMap { case (_, v) => f(v) }
}
