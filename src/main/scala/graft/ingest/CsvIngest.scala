package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Config-driven CSV→typed-frame ingestion.
  *
  * Reference semantics (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY):
  *  - a numeric type dictionary maps config codes to Spark types (L90–98);
  *  - headerless CSV gets its header assigned from config (`toDF(*head_list)`,
  *    L336) and each column cast per the type list (L147–158);
  *  - config rows carry a validity window (STARTDATE/ENDDATE, L295) so the
  *    same table name can change layout over time.
  *
  * Spark-first re-expression: casting is a projection (codegen'd, no UDF);
  * the config lookup is a plain filter on a small config DataFrame.
  */
object CsvIngest {

  /** The reference's List_Types_Dict (L90–98). */
  val typeDict: Map[Int, DataType] = Map(
    1 -> StringType,
    2 -> FloatType,
    3 -> DecimalType(38, 18),
    4 -> LongType,
    5 -> TimestampType,
    6 -> DateType,
    7 -> BooleanType)

  /** Assign config headers to a headerless frame (ref L336 `toDF(*newColumns)`). */
  def withHeaders(df: DataFrame, headers: Seq[String]): DataFrame = {
    require(df.columns.length == headers.length,
      s"header count mismatch: data=${df.columns.length} config=${headers.length}")
    df.toDF(headers: _*)
  }

  /** Cast every column per the numeric type list (ref L147–158). */
  def castByTypeList(df: DataFrame, typeCodes: Seq[Int]): DataFrame = {
    require(df.columns.length == typeCodes.length,
      s"type list mismatch: data=${df.columns.length} config=${typeCodes.length}")
    val cols: Seq[Column] = df.columns.toSeq.zip(typeCodes).map { case (name, code) =>
      col(name).cast(typeDict(code)).as(name)
    }
    df.select(cols: _*)
  }

  /** Config row valid for `table` on the file's business date — the
    * reference's validity-window lookup (L295: `STARTDATE <= d AND
    * ENDDATE > d AND TABLE = t`), so one table name can change layout
    * over time and each landing file is parsed with the layout that was
    * live on its date. Config carries `table`, `start_date`, `end_date`
    * (date-typed) plus the header/type payload columns. */
  def configFor(config: DataFrame, table: String,
                fileDate: java.sql.Date): DataFrame =
    config.where(col("table") === table &&
      col("start_date") <= lit(fileDate) && col("end_date") > lit(fileDate))

  /** Read a headerless CSV the way the reference does (L311), then apply
    * headers + types. Distributed: one DataFrame per *table*, with all of
    * that table's files globbed into one scan — not one driver thread per
    * file like the reference's ThreadPool (L392). */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
              headers: Seq[String], typeCodes: Seq[Int]): DataFrame =
    castByTypeList(withHeaders(spark.read.option("header", "false").csv(path), headers), typeCodes)
}
