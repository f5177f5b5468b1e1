package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-maintenance operators (SURVEY.md §2.14): the backup/restore and
  * crawler-undo logic from the library scripts, generalized to plain
  * DataFrames.
  *
  * Backup shape (`scripts_utils.py:25-31,58-63,97-101`): each frame is
  * nested to a single row per group via `collect_list(struct("*"))`, tagged
  * with its table name, unioned and written as JSON. Restore
  * (`crawler_redo_from_backup.py:25-34`, `scripts_utils.py:77-95`) splits by
  * tag and explodes back to flat frames.
  */
object CatalogMaintenance {

  /** Nest all columns of each frame under an `items` array, tag with
    * `tableName`, union into the single backup frame. */
  def nestForBackup(frames: Map[String, DataFrame]): DataFrame =
    frames.map { case (name, df) =>
      df.agg(collect_list(struct(col("*"))).as("items"))
        .withColumn("tableName", lit(name))
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  def writeBackup(frames: Map[String, DataFrame], dest: String): Unit =
    nestForBackup(frames).write.mode(SaveMode.Overwrite).json(dest)

  /** Read a backup and split it back into per-table flat frames
    * (`explode(items)` + `select("col.*")`, `scripts_utils.py:78-83`). */
  def readBackup(spark: SparkSession, path: String): Map[String, DataFrame] = {
    val nested = spark.read.json(path)
    val names = nested.select("tableName").distinct().collect().map(_.getString(0))
    names.map { n =>
      n -> nested.filter(col("tableName") === n)
        .select(explode(col("items")).as("item"))
        .select(col("item.*"))
    }.toMap
  }

  /** The crawler-undo argmax restore (`crawler_undo.py:26-70`): from a
    * `tableVersions` frame (`table` struct with name/updateTime +
    * `updatedByCrawler` marker), reconstruct the latest version of each
    * table at or before `timestamp`, for tables touched by `crawlerName`:
    *
    *  1. filter to the crawler's tables,
    *  2. argmax: groupBy name → max(updateTime ≤ t), self-join back
    *     (compound equality — the reference idiom; a window row_number is
    *     the idiomatic alternative, §2.5),
    *  3. `subtract` the names that didn't exist before t (they are new —
    *     to be deleted, returned separately).
    *
    * Returns (restoreVersions, newTableNames). */
  def crawlerUndo(tableVersions: DataFrame, crawlerName: String,
                  timestamp: Long): (DataFrame, DataFrame) = {
    val mine = tableVersions
      .filter(col("updatedByCrawler") === crawlerName)
    val before = mine.filter(col("updateTime") <= timestamp)
    val latest = before.groupBy(col("name").as("l_name")).agg(max(col("updateTime")).as("maxTime"))
    val restore = before.join(latest,
      before("name") === latest("l_name") && before("updateTime") === latest("maxTime"))
      .select(before("name"), before("updateTime"), before("schemaVersion"))
    val allNames = mine.select("name").distinct()
    val newTables = allNames.except(before.select("name").distinct())
    (restore, newTables)
  }
}
