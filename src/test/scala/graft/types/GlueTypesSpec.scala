package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class GlueTypesSpec extends AnyFunSuite {
  import GlueTypes._

  test("identical types merge to themselves") {
    assert(mergeDataTypes(GLongType(), GLongType()) == GLongType())
  }

  test("conflicting atomics merge to a sorted choice") {
    val m = mergeDataTypes(GStringType(), GLongType())
    assert(m == GChoiceType(Seq(GLongType(), GStringType())))
  }

  test("merge is commutative on conflicts") {
    val a = mergeDataTypes(GIntegerType(), GStringType())
    val b = mergeDataTypes(GStringType(), GIntegerType())
    assert(a.typeName == b.typeName)
    assert(a.asInstanceOf[GChoiceType].sortedChoices == b.asInstanceOf[GChoiceType].sortedChoices)
  }

  test("null/unknown yield the other side") {
    assert(mergeDataTypes(GNullType(), GDoubleType()) == GDoubleType())
    assert(mergeDataTypes(GDoubleType(), GUnknownType()) == GDoubleType())
  }

  test("nested choices flatten and dedupe") {
    val c1 = GChoiceType(Seq(GIntegerType(), GStringType()))
    val m = makeChoice(c1, GLongType())
    assert(m.asInstanceOf[GChoiceType].sortedChoices.map(_.typeName) == Seq("int", "long", "string"))
    // single survivor collapses
    assert(makeChoice(GIntegerType(), GIntegerType()) == GIntegerType())
  }

  test("struct merge: per-field, extras ride along") {
    val a = GStructType(Seq(GField("x", GLongType()), GField("y", GStringType())))
    val b = GStructType(Seq(GField("x", GStringType()), GField("z", GDoubleType())))
    val m = mergeSchemas(a, b)
    assert(m.fieldMap("x").dataType.isInstanceOf[GChoiceType])
    assert(m.fieldMap("y").dataType == GStringType())
    assert(m.fieldMap("z").dataType == GDoubleType())
  }

  test("choice encodes to tagged struct and round-trips via Spark schema") {
    val g = GStructType(Seq(GField("v", GChoiceType(Seq(GLongType(), GStringType())))))
    val spark = toSparkSchema(g)
    assert(spark("v").dataType.isInstanceOf[StructType])
    assert(spark("v").metadata.contains(ChoiceMetaKey))
    val back = fromSparkSchema(spark)
    assert(back.fieldMap("v").dataType.isInstanceOf[GChoiceType])
  }

  test("atomic Spark mappings are 1:1") {
    val pairs = Seq(
      GBinaryType() -> BinaryType, GBooleanType() -> BooleanType,
      GDateType() -> DateType, GDoubleType() -> DoubleType,
      GFloatType() -> FloatType, GIntegerType() -> IntegerType,
      GLongType() -> LongType, GShortType() -> ShortType,
      GStringType() -> StringType, GTimestampType() -> TimestampType)
    pairs.foreach { case (g, s) =>
      assert(toSpark(g) == s)
      assert(fromSpark(s) == g)
    }
    assert(toSpark(GDecimalType(12, 3)) == DecimalType(12, 3))
  }

  test("set/map/enum mappings") {
    assert(toSpark(GSetType(GLongType())) == ArrayType(LongType))
    assert(toSpark(GMapType(GDoubleType())) == MapType(StringType, DoubleType))
    assert(toSpark(GEnumType(Set("A", "B"))) == StringType)
  }

  test("json serialization shape") {
    val j = toJson(GStructType(Seq(GField("a", GChoiceType(Seq(GIntegerType(), GStringType()))))))
    assert(j.contains("\"dataType\": \"struct\""))
    assert(j.contains("\"dataType\": \"choice\""))
    // valid JSON: parseable field/bracket balance sanity
    assert(j.count(_ == '{') == j.count(_ == '}'))
  }

  test("atomicByName resolves canonical names") {
    assert(atomicByName("long").contains(GLongType()))
    assert(atomicByName("decimal(10,2)").contains(GDecimalType(10, 2)))
    assert(atomicByName("bogus").isEmpty)
  }
}
