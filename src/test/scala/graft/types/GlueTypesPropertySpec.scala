package graft.types

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests for the type algebra (SURVEY.md §5d):
  * merge laws and encode round-trips over generated type trees. */
object GlueTypesPropertySpec extends Properties("GlueTypes") {
  import GlueTypes._

  private val atomicGen: Gen[GlueType] = Gen.oneOf(
    GBinaryType(), GBooleanType(), GByteType(), GDateType(), GDoubleType(),
    GFloatType(), GIntegerType(), GLongType(), GShortType(), GStringType(),
    GTimestampType(), GDecimalType(12, 2))

  private def typeGen(depth: Int): Gen[GlueType] =
    if (depth <= 0) atomicGen
    else Gen.frequency(
      6 -> atomicGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(GArrayType(_))),
      1 -> Gen.lzy(typeGen(depth - 1).map(GMapType(_))),
      1 -> Gen.lzy(structGen(depth - 1)))

  private def structGen(depth: Int): Gen[GStructType] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.pick(n, Seq("a", "b", "c", "d", "e", "f"))
    types <- Gen.listOfN(n, typeGen(depth))
  } yield GStructType(names.zip(types).map { case (nm, t) => GField(nm, t) }.toSeq)

  property("merge is idempotent") = Prop.forAll(typeGen(2)) { t =>
    mergeDataTypes(t, t) == t
  }

  property("json round-trips: fromJson(toJson(t)) == t") =
    Prop.forAll(typeGen(2)) { t => fromJson(toJson(t)) == t }

  /** Struct merge keeps the left operand's field order (reference behavior,
    * `gluetypes.py:395-432`), so commutativity holds up to field ordering —
    * canonicalize before comparing. */
  private def canon(t: GlueType): GlueType = t match {
    case GStructType(fs, p) =>
      GStructType(fs.map(f => f.copy(dataType = canon(f.dataType))).sortBy(_.name), p)
    case GArrayType(e, p)  => GArrayType(canon(e), p)
    case GSetType(e, p)    => GSetType(canon(e), p)
    case GMapType(v, p)    => GMapType(canon(v), p)
    case GChoiceType(c, p) => GChoiceType(c.map(canon).sortBy(_.typeName), p)
    case other             => other
  }

  property("merge is commutative up to ordering") =
    Prop.forAll(typeGen(2), typeGen(2)) { (a, b) =>
      toJson(canon(mergeDataTypes(a, b))) == toJson(canon(mergeDataTypes(b, a)))
    }

  property("merge with null yields the other side") = Prop.forAll(typeGen(2)) { t =>
    mergeDataTypes(GNullType(), t) == t && mergeDataTypes(t, GNullType()) == t
  }

  property("merge is associative on atomics (choice flattening)") =
    Prop.forAll(atomicGen, atomicGen, atomicGen) { (a, b, c) =>
      toJson(mergeDataTypes(mergeDataTypes(a, b), c)) ==
        toJson(mergeDataTypes(a, mergeDataTypes(b, c)))
    }

  property("struct schemas round-trip through Spark encoding") =
    Prop.forAll(structGen(2)) { s =>
      // atomic-only fields survive exactly; choice-free trees are stable
      fromSparkSchema(toSparkSchema(s)) == s
    }

  property("a merged conflict encodes as a choice and survives the Spark round-trip") =
    Prop.forAll(atomicGen, atomicGen) { (a, b) =>
      val merged = GStructType(Seq(GField("x", mergeDataTypes(a, b))))
      val back = fromSparkSchema(toSparkSchema(merged))
      toJson(back) == toJson(merged)
    }
}
