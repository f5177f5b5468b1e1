package graft.restructure

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Avro decode for [[Restructure.unbox]] (`transforms/unbox.py:15-35`,
  * `dynamicframe.py:162-185` — "avro" is one of the two formats the
  * reference's unbox names first). The spark-avro module (`from_avro`) is a
  * separate artifact that is not available offline, but the core avro
  * runtime ships with Spark itself, so the decode is a plain
  * GenericDatumReader over the binary column inside `mapPartitions` —
  * per-partition reader/decoder reuse, no per-row allocation of codec
  * machinery, distributed by construction (the schema travels as its JSON
  * string; rows never leave their partition).
  */
object AvroCodec {

  /** Replace binary column `path` (raw avro binary-encoded records written
    * with `schemaJson`) by its decoded struct. A StringType column is
    * treated as base64-encoded bytes. Undecodable payloads yield NULL (the
    * DynamicFrame error-surface wrapper can route those to an error frame). */
  def unboxAvro(df: DataFrame, path: String, schemaJson: String): DataFrame = {
    val idx = df.schema.fieldIndex(path)
    val isString = df.schema(idx).dataType.isInstanceOf[StringType]
    val sparkType = toSparkType(new Schema.Parser().parse(schemaJson))
    val outSchema = StructType(
      df.schema.fields.updated(idx, StructField(path, sparkType, nullable = true)).toIndexedSeq)
    df.mapPartitions { it =>
      // parse once per partition; avro Schema is not thread-shareable with
      // the serialized closure, the JSON string is
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[AnyRef](schema)
      var decoder: BinaryDecoder = null
      it.map { row =>
        val bytes: Array[Byte] =
          if (isString) {
            val s = row.getAs[String](idx)
            if (s == null) null else java.util.Base64.getDecoder.decode(s)
          } else row.getAs[Array[Byte]](idx)
        val decoded =
          if (bytes == null) null
          else
            try {
              decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
              convert(reader.read(null, decoder), schema)
            } catch { case _: java.io.IOException | _: RuntimeException => null }
        Row.fromSeq(row.toSeq.updated(idx, decoded))
      }
    }(Encoders.row(outSchema))
  }

  /** Inverse of [[unboxAvro]]: encode struct column `path` into raw avro
    * binary per `schemaJson` — the produce-side twin (message-bus sinks,
    * and the round-trip oracle for the decode path). Same shape: one
    * writer/encoder per partition, rows never leave their partition. */
  def boxAvro(df: DataFrame, path: String, schemaJson: String): DataFrame = {
    import org.apache.avro.generic.GenericDatumWriter
    import org.apache.avro.io.EncoderFactory
    val idx = df.schema.fieldIndex(path)
    val outSchema = StructType(
      df.schema.fields.updated(idx, StructField(path, BinaryType, nullable = true)).toIndexedSeq)
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[AnyRef](schema)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      it.map { row =>
        val bytes =
          if (row.isNullAt(idx)) null
          else {
            bos.reset()
            val e = EncoderFactory.get().binaryEncoder(bos, enc)
            writer.write(toAvro(row.getStruct(idx), schema), e)
            e.flush()
            bos.toByteArray
          }
        Row.fromSeq(row.toSeq.updated(idx, bytes))
      }
    }(Encoders.row(outSchema))
  }

  /** External Row value → avro datum matching the schema (inverse of
    * [[convert]]). */
  private def toAvro(v: Any, s: Schema): AnyRef = s.getType match {
    case _ if v == null => null
    case Schema.Type.RECORD =>
      val row = v.asInstanceOf[Row]
      val rec = new org.apache.avro.generic.GenericData.Record(s)
      // match struct fields to avro fields BY NAME when the row carries a
      // schema — positional matching silently swaps same-typed fields when
      // the struct's declaration order differs from the writer schema's
      s.getFields.asScala.foreach { f =>
        val i = if (row.schema != null) row.schema.fieldIndex(f.name()) else f.pos()
        rec.put(f.pos(), toAvro(row.get(i), f.schema()))
      }
      rec
    case Schema.Type.UNION =>
      nonNullBranch(s) match {
        case Some(b) => toAvro(v, b)
        case None    => throw new IllegalArgumentException(s"box avro: ambiguous union $s")
      }
    case Schema.Type.STRING | Schema.Type.ENUM => v.toString
    case Schema.Type.BYTES => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case Schema.Type.FIXED =>
      new org.apache.avro.generic.GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
    case Schema.Type.ARRAY => // collection kind varies by row origin
      v.asInstanceOf[scala.collection.Seq[Any]].map(toAvro(_, s.getElementType)).asJava
    case Schema.Type.MAP =>
      v.asInstanceOf[scala.collection.Map[String, Any]].map { case (k, mv) =>
        k -> toAvro(mv, s.getValueType)
      }.toMap.asJava
    case _ => v.asInstanceOf[AnyRef] // primitive boxes pass through
  }

  /** Avro → Catalyst type mapping for the practical subset: records,
    * primitives, enums/fixed, arrays, maps, and nullable unions. A union
    * with more than one non-null branch has no faithful Catalyst analog
    * (that is what resolveChoice models for ambiguous data) — rejected. */
  private[restructure] def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = true)).toIndexedSeq)
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.NULL => NullType
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.UNION =>
      nonNullBranch(s).map(toSparkType).getOrElse(
        throw new IllegalArgumentException(
          s"unbox avro: union with multiple non-null branches ($s) — " +
            "decode to separate columns or resolve upstream"))
    case other => throw new IllegalArgumentException(s"unbox avro: unsupported type $other")
  }

  private def nonNullBranch(union: Schema): Option[Schema] =
    union.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toList match {
      case one :: Nil => Some(one)
      case _          => None
    }

  /** Decoded avro datum → the external Row representation matching
    * [[toSparkType]]. */
  private def convert(v: AnyRef, s: Schema): Any = s.getType match {
    case _ if v == null => null
    case Schema.Type.RECORD =>
      val rec = v.asInstanceOf[GenericRecord]
      Row.fromSeq(s.getFields.asScala.map(f => convert(rec.get(f.pos()), f.schema())).toIndexedSeq)
    case Schema.Type.STRING | Schema.Type.ENUM => v.toString
    case Schema.Type.BYTES =>
      val bb = v.asInstanceOf[java.nio.ByteBuffer]
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case Schema.Type.FIXED => v.asInstanceOf[GenericFixed].bytes().clone()
    case Schema.Type.ARRAY =>
      v.asInstanceOf[java.util.Collection[AnyRef]].asScala
        .map(convert(_, s.getElementType)).toIndexedSeq
    case Schema.Type.MAP =>
      v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
        .map { case (k, mv) => k.toString -> convert(mv, s.getValueType) }.toMap
    case Schema.Type.UNION =>
      nonNullBranch(s) match {
        case Some(b) => convert(v, b)
        case None    => throw new IllegalArgumentException(s"unbox avro: ambiguous union $s")
      }
    case _ => v // int/long/float/double/boolean arrive as matching JVM boxes
  }
}
