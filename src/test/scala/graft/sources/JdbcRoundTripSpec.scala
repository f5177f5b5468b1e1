package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end JDBC paths against embedded Derby (ships with Spark): the
  * extract job (`select *` per table → raw-zone CSV) and the JDBC sink via
  * the named-connection registry. */
class JdbcRoundTripSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val conn = ConnectionRegistry.JdbcConf(url, "", "",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  private def withStatement[A](f: java.sql.Statement => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c.createStatement()) finally c.close()
  }

  test("extractTables lands JDBC tables as raw-zone CSV with \\N nulls") {
    withStatement { st =>
      st.executeUpdate("CREATE TABLE bank_customer (cust_id INT, cust_nm VARCHAR(50))")
      st.executeUpdate("INSERT INTO bank_customer VALUES (1, 'alice'), (2, NULL)")
    }
    val raw = java.nio.file.Files.createTempDirectory("jdbcraw").toString
    Rds2Raw.extractTables(spark, conn, Seq("bank_customer"), raw)
    val back = graft.jobs.BankJobs.readRawCsv(spark, s"$raw/bank_customer")
    assert(back.count() == 2)
    assert(back.filter(col("cust_nm").isNull).count() == 1)
    assert(back.schema.fields.forall(_.dataType.typeName == "string")) // raw zone is stringly
  }

  test("writeFromJdbcConf appends through the registry; jdbc source factory reads back") {
    import spark.implicits._
    withStatement(_.executeUpdate("CREATE TABLE sink_t (k INT, v VARCHAR(20))"))
    ConnectionRegistry.register("derby_mem", conn)
    ConnectionRegistry.writeFromJdbcConf(
      Seq((1, "a"), (2, "b")).toDF("k", "v"), "derby_mem", "sink_t")
    val read = Sources.read(spark, Sources.SourceSpec("jdbc",
      options = Map("url" -> url, "dbtable" -> "sink_t", "driver" -> conn.driver)))
    assert(read.count() == 2)
    assert(read.orderBy("k").select("v").as[String].collect().toSeq == Seq("a", "b"))
  }
}
