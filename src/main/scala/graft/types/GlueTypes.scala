package graft.types

import org.apache.spark.sql.types._

/** Glue-parity type algebra.
  *
  * Mirrors the reference's dynamic type system
  * (`glue-jobs/awsglue/gluetypes.py:60-343`): the atomic types map 1:1 onto
  * `org.apache.spark.sql.types._`; the distinctive pieces are:
  *
  *   - [[GChoiceType]] — a union type produced when two schemas disagree on a
  *     field's type (`gluetypes.py:194-230`, `_make_choice`
  *     `gluetypes.py:370-388`). Spark has no union type, so choices are
  *     *encoded* as a struct with one nullable field per alternative (the
  *     same encoding Glue's `make_struct` resolution produces), tagged with
  *     metadata key [[GlueTypes.ChoiceMetaKey]] so a later `resolveChoice`
  *     pass can find and collapse them.
  *   - [[GSetType]] — array + distinct-on-write (`gluetypes.py:172-191`).
  *   - [[GEnumType]] — string + allowed-values property (`gluetypes.py:96-110`).
  *   - `mergeDataTypes` — field-wise schema merge with conflict ⇒ choice
  *     (`gluetypes.py:395-432`).
  *
  * Every type carries a free-form `properties` map (`gluetypes.py:22-24`) and
  * serializes to/from JSON (`gluetypes.py:358-368`).
  */
sealed trait GlueType {
  def properties: Map[String, String]
  /** Canonical short name used for choice-branch field names and JSON. */
  def typeName: String
}

case class GBinaryType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "binary" }
case class GBooleanType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "boolean" }
case class GByteType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "byte" }
case class GDateType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "date" }
case class GDecimalType(precision: Int = 10, scale: Int = 2, properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = s"decimal($precision,$scale)"
}
case class GDoubleType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "double" }
case class GFloatType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "float" }
case class GIntegerType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "int" }
case class GLongType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "long" }
case class GNullType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "null" }
case class GShortType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "short" }
case class GStringType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "string" }
case class GTimestampType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "timestamp" }
case class GUnknownType(properties: Map[String, String] = Map.empty) extends GlueType { val typeName = "unknown" }

/** String type restricted to a value set (`gluetypes.py:96-110`). Spark has no
  * enum; maps to StringType with the options kept in metadata. */
case class GEnumType(options: Set[String], properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = "enum"
}

case class GArrayType(elementType: GlueType, properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = s"array<${elementType.typeName}>"
}

/** Set = array with distinct elements (`gluetypes.py:172-191`); enforced by
  * `array_distinct` at write time, not in the storage type. */
case class GSetType(elementType: GlueType, properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = s"set<${elementType.typeName}>"
}

/** Map with string keys (keys are implicitly string — `gluetypes.py:233-250`
  * parameterizes the *value* type only). */
case class GMapType(valueType: GlueType, properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = s"map<string,${valueType.typeName}>"
}

case class GField(name: String, dataType: GlueType, properties: Map[String, String] = Map.empty)

case class GStructType(fields: Seq[GField], properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = "struct"
  def fieldMap: Map[String, GField] = fields.map(f => f.name -> f).toMap
}

/** The union type (`gluetypes.py:194-230`). Alternatives are kept sorted by
  * canonical name so that merge is order-independent (merge(a,b) == merge(b,a)). */
case class GChoiceType(choices: Seq[GlueType], properties: Map[String, String] = Map.empty) extends GlueType {
  val typeName = "choice"
  def sortedChoices: Seq[GlueType] = choices.sortBy(_.typeName)
}

object GlueTypes {

  /** Metadata key marking a Spark StructType column as an encoded choice. */
  val ChoiceMetaKey = "graft.choice"
  /** Metadata key carrying enum options on a StringType column. */
  val EnumMetaKey = "graft.enum.options"
  /** Metadata key marking an ArrayType column as set-semantics. */
  val SetMetaKey = "graft.set"

  // ---------------------------------------------------------------- merge

  /** Field-wise schema merge (`gluetypes.py:395-432`): identical types merge
    * to themselves; one-sided null/unknown yields the other side; otherwise a
    * [[GChoiceType]] of the flattened alternatives (`_make_choice`,
    * `gluetypes.py:370-388`). Structs merge per-field (missing fields ride
    * along); arrays/sets/maps merge element-wise.
    */
  def mergeDataTypes(a: GlueType, b: GlueType): GlueType = (a, b) match {
    case (x, y) if x == y => x
    case (GNullType(_), y) => y
    case (x, GNullType(_)) => x
    case (GUnknownType(_), y) => y
    case (x, GUnknownType(_)) => x
    case (GStructType(fa, pa), GStructType(fb, _)) =>
      val bMap = fb.map(f => f.name -> f).toMap
      val merged = fa.map { f =>
        bMap.get(f.name) match {
          case Some(g) => GField(f.name, mergeDataTypes(f.dataType, g.dataType), f.properties ++ g.properties)
          case None    => f
        }
      }
      val extras = fb.filterNot(f => fa.exists(_.name == f.name))
      GStructType(merged ++ extras, pa)
    case (GArrayType(ea, pa), GArrayType(eb, _)) => GArrayType(mergeDataTypes(ea, eb), pa)
    case (GSetType(ea, pa), GSetType(eb, _))     => GSetType(mergeDataTypes(ea, eb), pa)
    case (GMapType(va, pa), GMapType(vb, _))     => GMapType(mergeDataTypes(va, vb), pa)
    case (x, y) => makeChoice(x, y)
  }

  /** Flatten nested choices and dedupe by canonical name; a single survivor
    * collapses back to a plain type. Two alternatives sharing a name that
    * are both structs merge field-wise (all structs answer to "struct", the
    * same branch name Glue's make_struct uses) — picking one arbitrarily
    * would silently drop fields. */
  def makeChoice(a: GlueType, b: GlueType): GlueType = {
    def alts(t: GlueType): Seq[GlueType] = t match {
      case GChoiceType(cs, _) => cs.flatMap(alts)
      case other              => Seq(other)
    }
    val all = (alts(a) ++ alts(b))
      .groupBy(_.typeName).toSeq.map { case (_, ts) =>
        ts.reduce { (x, y) =>
          (x, y) match {
            case (sa: GStructType, sb: GStructType) => mergeDataTypes(sa, sb)
            case _                                  => x
          }
        }
      }.sortBy(_.typeName)
    if (all.size == 1) all.head else GChoiceType(all)
  }

  def mergeSchemas(a: GStructType, b: GStructType): GStructType =
    mergeDataTypes(a, b).asInstanceOf[GStructType]

  // ------------------------------------------------------- Spark mapping

  /** Glue → Spark. Choices encode as struct-of-branches with a metadata tag;
    * the branch field names are the alternatives' canonical names. */
  def toSpark(t: GlueType): DataType = t match {
    case GBinaryType(_)        => BinaryType
    case GBooleanType(_)       => BooleanType
    case GByteType(_)          => ByteType
    case GDateType(_)          => DateType
    case GDecimalType(p, s, _) => DecimalType(p, s)
    case GDoubleType(_)        => DoubleType
    case GFloatType(_)         => FloatType
    case GIntegerType(_)       => IntegerType
    case GLongType(_)          => LongType
    case GNullType(_)          => NullType
    case GShortType(_)         => ShortType
    case GStringType(_)        => StringType
    case GTimestampType(_)     => TimestampType
    case GUnknownType(_)       => NullType
    case GEnumType(_, _)       => StringType
    case GArrayType(e, _)      => ArrayType(toSpark(e))
    case GSetType(e, _)        => ArrayType(toSpark(e))
    case GMapType(v, _)        => MapType(StringType, toSpark(v))
    case GStructType(fs, _) =>
      StructType(fs.map(f => StructField(f.name, toSpark(f.dataType), nullable = true, metadata = fieldMetadata(f.dataType))))
    case c: GChoiceType =>
      StructType(c.sortedChoices.map(alt => StructField(alt.typeName, toSpark(alt), nullable = true)))
  }

  private def fieldMetadata(t: GlueType): Metadata = t match {
    case _: GChoiceType =>
      new MetadataBuilder().putBoolean(ChoiceMetaKey, value = true).build()
    case GEnumType(opts, _) =>
      new MetadataBuilder().putStringArray(EnumMetaKey, opts.toArray.sorted).build()
    case _: GSetType =>
      new MetadataBuilder().putBoolean(SetMetaKey, value = true).build()
    case _ => Metadata.empty
  }

  /** A struct is choice-shaped when every field is named by its own
    * canonical type name — the struct-of-branches encoding. Nested choices
    * can't carry column metadata (struct() expressions drop it), so decode
    * falls back to this structural test. */
  private def isChoiceShape(fs: Seq[StructField]): Boolean =
    fs.length >= 2 && fs.forall(f => f.name == fromSpark(f.dataType).typeName)

  /** Spark → Glue (choice-tagged structs decode back to GChoiceType; nested
    * choice-shaped structs decode structurally). */
  def fromSpark(dt: DataType): GlueType = dt match {
    case BinaryType        => GBinaryType()
    case BooleanType       => GBooleanType()
    case ByteType          => GByteType()
    case DateType          => GDateType()
    case d: DecimalType    => GDecimalType(d.precision, d.scale)
    case DoubleType        => GDoubleType()
    case FloatType         => GFloatType()
    case IntegerType       => GIntegerType()
    case LongType          => GLongType()
    case NullType          => GNullType()
    case ShortType         => GShortType()
    case StringType        => GStringType()
    case TimestampType     => GTimestampType()
    case ArrayType(e, _)   => GArrayType(fromSpark(e))
    case MapType(_, v, _)  => GMapType(fromSpark(v))
    case StructType(fs) =>
      GStructType(fs.toSeq.map { f =>
        val t = f.dataType match {
          case StructType(inner) if isChoiceShape(inner.toSeq) =>
            GChoiceType(inner.toSeq.map(g => fromSpark(g.dataType)))
          case other => fromSpark(other)
        }
        val tagged =
          if (f.metadata.contains(ChoiceMetaKey)) t match {
            case GStructType(branches, _) => GChoiceType(branches.map(_.dataType))
            case other                    => other
          } else if (f.metadata.contains(EnumMetaKey)) GEnumType(f.metadata.getStringArray(EnumMetaKey).toSet)
          else if (f.metadata.contains(SetMetaKey)) t match {
            case GArrayType(e, _) => GSetType(e)
            case other            => other
          } else t
        GField(f.name, tagged)
      })
    case other => GUnknownType(Map("spark" -> other.simpleString))
  }

  def fromSparkSchema(s: StructType): GStructType = fromSpark(s).asInstanceOf[GStructType]
  def toSparkSchema(s: GStructType): StructType = toSpark(s).asInstanceOf[StructType]

  // --------------------------------------------------------------- JSON

  /** JSON shape mirrors `gluetypes.py:358-368`:
    * `{"dataType": <name>, "properties": {...}, ...extras}`. */
  def toJson(t: GlueType): String = {
    def props(p: Map[String, String]): String =
      p.toSeq.sortBy(_._1).map { case (k, v) => s"${quote(k)}: ${quote(v)}" }.mkString("{", ", ", "}")
    t match {
      case GDecimalType(p, s, pr) =>
        s"""{"dataType": "decimal", "precision": $p, "scale": $s, "properties": ${props(pr)}}"""
      case GEnumType(opts, pr) =>
        s"""{"dataType": "enum", "options": [${opts.toSeq.sorted.map(quote).mkString(", ")}], "properties": ${props(pr)}}"""
      case GArrayType(e, pr) =>
        s"""{"dataType": "array", "elementType": ${toJson(e)}, "properties": ${props(pr)}}"""
      case GSetType(e, pr) =>
        s"""{"dataType": "set", "elementType": ${toJson(e)}, "properties": ${props(pr)}}"""
      case GMapType(v, pr) =>
        s"""{"dataType": "map", "valueType": ${toJson(v)}, "properties": ${props(pr)}}"""
      case GStructType(fs, pr) =>
        val fjson = fs.map(f => s"""{"name": ${quote(f.name)}, "container": ${toJson(f.dataType)}, "properties": ${props(f.properties)}}""")
        s"""{"dataType": "struct", "fields": [${fjson.mkString(", ")}], "properties": ${props(pr)}}"""
      case GChoiceType(cs, pr) =>
        s"""{"dataType": "choice", "choices": [${cs.sortBy(_.typeName).map(toJson).mkString(", ")}], "properties": ${props(pr)}}"""
      case atomic =>
        s"""{"dataType": ${quote(atomic.typeName)}, "properties": ${props(atomic.properties)}}"""
    }
  }

  /** JSON → GlueType (`fromJsonValue`, `gluetypes.py:358-368`), inverse of
    * [[toJson]]. Uses Jackson (ships with Spark). */
  def fromJson(json: String): GlueType = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    fromJsonNode(mapper.readTree(json))
  }

  private def fromJsonNode(n: com.fasterxml.jackson.databind.JsonNode): GlueType = {
    import scala.jdk.CollectionConverters._
    def props(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
      Option(node.get("properties")).map { p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty)
    val p = props(n)
    n.get("dataType").asText() match {
      case "decimal" => GDecimalType(n.get("precision").asInt(), n.get("scale").asInt(), p)
      case "enum" => GEnumType(n.get("options").elements().asScala.map(_.asText()).toSet, p)
      case "array" => GArrayType(fromJsonNode(n.get("elementType")), p)
      case "set" => GSetType(fromJsonNode(n.get("elementType")), p)
      case "map" => GMapType(fromJsonNode(n.get("valueType")), p)
      case "struct" =>
        GStructType(n.get("fields").elements().asScala.map { f =>
          GField(f.get("name").asText(), fromJsonNode(f.get("container")), props(f))
        }.toSeq, p)
      case "choice" =>
        GChoiceType(n.get("choices").elements().asScala.map(fromJsonNode).toSeq, p)
      case atomic =>
        atomicByName(atomic).getOrElse(GUnknownType(p)) match {
          case GBinaryType(_) => GBinaryType(p); case GBooleanType(_) => GBooleanType(p)
          case GByteType(_) => GByteType(p); case GDateType(_) => GDateType(p)
          case GDoubleType(_) => GDoubleType(p); case GFloatType(_) => GFloatType(p)
          case GIntegerType(_) => GIntegerType(p); case GLongType(_) => GLongType(p)
          case GNullType(_) => GNullType(p); case GShortType(_) => GShortType(p)
          case GStringType(_) => GStringType(p); case GTimestampType(_) => GTimestampType(p)
          case other => other
        }
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c    => c.toString
    } + "\""

  /** Canonical name → atomic type (for resolveChoice `cast:<type>` specs). */
  def atomicByName(name: String): Option[GlueType] = name match {
    case "binary"    => Some(GBinaryType())
    case "boolean"   => Some(GBooleanType())
    case "byte"      => Some(GByteType())
    case "date"      => Some(GDateType())
    case "double"    => Some(GDoubleType())
    case "float"     => Some(GFloatType())
    case "int"       => Some(GIntegerType())
    case "long"      => Some(GLongType())
    case "null"      => Some(GNullType())
    case "short"     => Some(GShortType())
    case "string"    => Some(GStringType())
    case "timestamp" => Some(GTimestampType())
    case d if d.startsWith("decimal(") =>
      val ps = d.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
      Some(GDecimalType(ps(0), ps(1)))
    case _ => None
  }
}
