package graft

import org.apache.spark.sql.functions._

/** The native kernels are SQL-callable after registration. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate the native kernels") {
    GraftFunctions.register(spark)
    Seq(("a b c d e", Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)))
      .toDF("text", "va", "vb").createOrReplaceTempView("gf_t")
    val row = spark.sql(
      """select size(graft_minhash(graft_shingles(split(text, ' '), 2), 32)) as k,
        |       graft_cosine(va, vb) as cos,
        |       graft_simhash(split(text, ' ')) as fp,
        |       graft_hyperplane_sig(va, 2, 4) as sig
        |from gf_t""".stripMargin).collect()(0)
    assert(row.getAs[Int]("k") == 32)
    assert(math.abs(row.getAs[Double]("cos") - 1.0) < 1e-12)
    assert(row.getAs[Long]("sig") >= 0 && row.getAs[Long]("sig") < 16)
  }

  test("graft_ngram_repetition is SQL-callable") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "select graft_ngram_repetition(split('a b a b a', ' '), 2) as rs").collect()(0)
    val rs = row.getStruct(0)
    assert(rs.getDouble(0) == 0.5 && rs.getDouble(1) == 0.5)
  }

  test("graft_char_entropy is SQL-callable") {
    GraftFunctions.register(spark)
    val e = spark.sql("select graft_char_entropy('aabb') as e").collect()(0).getDouble(0)
    assert(math.abs(e - 1.0) < 1e-12) // two equiprobable chars = 1 bit
  }

  test("graft_misra_gries and graft_countmin aggregates are SQL-callable") {
    GraftFunctions.register(spark)
    (Seq.fill(5)("x") ++ Seq.fill(2)("y")).toDF("tok").createOrReplaceTempView("gf_mg")
    val mg = spark.sql(
      "select graft_misra_gries(tok, 4) as hh from gf_mg").collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    assert(mg.head.getString(0) == "x" && mg.head.getLong(1) == 5L)
    val cms = spark.sql(
      """select graft_countmin(array(
        |  pmod(cast(conv(substr(md5(concat(tok, ':cms0')), 1, 15), 16, 10) as bigint), 64),
        |  pmod(cast(conv(substr(md5(concat(tok, ':cms1')), 1, 15), 16, 10) as bigint), 64)), 2, 64) as g
        |from gf_mg""".stripMargin).collect()(0).getSeq[Long](0)
    assert(cms.length == 128 && cms.sum == 14L) // 7 rows x 2 grid rows
  }

  test("non-literal k is rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("select graft_minhash(array('a'), id) from range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
