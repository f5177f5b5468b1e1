package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static Vietnamese public-holiday calendar 2015–2024, replacing the
  * reference's per-row Python UDF over `holidays.VN()`
  * (`r2g_account.py:98-104`) with a broadcast-joinable lookup table —
  * the UDF forces a JVM→Python boundary per batch; a 60-row broadcast
  * table costs nothing at any scale.
  *
  * Fixed-date holidays are generated; lunar-calendar holidays (Tet,
  * Hung Kings) use the published solar dates for 2015–2024.
  */
object Holidays {

  /** Lunar New Year (Tet) day 1, solar dates. */
  private val tetDay1 = Map(
    2015 -> "2015-02-19", 2016 -> "2016-02-08", 2017 -> "2017-01-28",
    2018 -> "2018-02-16", 2019 -> "2019-02-05", 2020 -> "2020-01-25",
    2021 -> "2021-02-12", 2022 -> "2022-02-01", 2023 -> "2023-01-22",
    2024 -> "2024-02-10")

  /** Hung Kings Commemoration Day (lunar 10/3), solar dates. */
  private val hungKings = Map(
    2015 -> "2015-04-28", 2016 -> "2016-04-16", 2017 -> "2017-04-06",
    2018 -> "2018-04-25", 2019 -> "2019-04-14", 2020 -> "2020-04-02",
    2021 -> "2021-04-21", 2022 -> "2022-04-10", 2023 -> "2023-04-29",
    2024 -> "2024-04-18")

  /** (date, holiday_name) rows for 2015-01-01 … 2024-12-31. */
  def entries: Seq[(String, String)] = {
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    (2015 to 2024).flatMap { y =>
      val tet1 = java.time.LocalDate.parse(tetDay1(y), fmt)
      Seq(
        s"$y-01-01" -> "International New Year's Day",
        tet1.minusDays(1).format(fmt) -> "Vietnamese New Year's Eve",
        tet1.format(fmt) -> "Vietnamese New Year",
        tet1.plusDays(1).format(fmt) -> "The second day of Tet Holiday",
        tet1.plusDays(2).format(fmt) -> "The third day of Tet Holiday",
        tet1.plusDays(3).format(fmt) -> "The fourth day of Tet Holiday",
        tet1.plusDays(4).format(fmt) -> "The fifth day of Tet Holiday",
        hungKings(y) -> "Hung Kings Commemoration Day",
        s"$y-04-30" -> "Liberation Day/Reunification Day",
        s"$y-05-01" -> "International Labor Day",
        s"$y-09-02" -> "Independence Day")
    }
  }

  /** DataFrame (holiday_date: date, holiday_name: string), broadcastable. */
  def table(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val rows = entries.map { case (d, n) => org.apache.spark.sql.Row(d, n) }.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("holiday_date_str", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("holiday_name", org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows, schema)
      .select(to_date(col("holiday_date_str")).as("holiday_date"), col("holiday_name"))
  }
}
