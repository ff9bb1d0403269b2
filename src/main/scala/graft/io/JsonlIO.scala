package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL source/sink (reference stages/text/io/reader/jsonl.py:30-131 and
  * writer/jsonl.py:24-47).
  *
  * Spark-first: `spark.read.schema(...).json(path)` with an EXPLICIT
  * schema — at 100 TB, schema inference would scan the corpus twice
  * (the reference avoids it the same way by passing pandas dtypes).
  * Optional column projection mirrors the reader's `fields` arg and
  * reaches the scan as a pruned ReadSchema.
  */
object JsonlIO {

  def read(spark: SparkSession, path: String, schema: StructType,
           fields: Seq[String] = Nil): DataFrame = {
    val df = spark.read.schema(schema).json(path)
    if (fields.nonEmpty) df.select(fields.map(org.apache.spark.sql.functions.col): _*) else df
  }

  /** Schema-inferring variant for small/interactive use only. */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  def write(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}
