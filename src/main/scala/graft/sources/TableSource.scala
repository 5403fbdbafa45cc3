package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Loader surface — the Spark re-expression of the reference's Loader
  * protocols (python/graphscope/framework/loader.py:96-127: file:// CSV
  * with delimiter/header options, oss/hdfs/s3 schemes, vineyard streams;
  * CSVOptions loader.py:43-87; engine-side CSV/Arrow reading
  * core/loader/arrow_fragment_loader.h:44-70).
  *
  * Spark's DataSource framework already speaks every scheme the reference
  * does (file/hdfs/s3a/oss via Hadoop FS connectors) — the scheme is part
  * of the path, so one `spark.read` covers the whole protocol table; what
  * this object pins down is the reference's OPTION semantics:
  * header_row -> "header", delimiter -> "sep", explicit column types ->
  * schema, and the default `f0, f1, ...` naming when header_row = false
  * (loader.py:123-126). */
object TableSource {

  /** CSV with the reference loader's option mapping. When `headerRow` is
    * false and no schema is given, columns are named f0..fN like the
    * reference (loader.py:126). */
  def csv(
      spark: SparkSession,
      path: String,
      headerRow: Boolean = true,
      delimiter: String = ",",
      schema: Option[StructType] = None): DataFrame = {
    var r = spark.read
      .option("header", headerRow.toString)
      .option("sep", delimiter)
    r = schema match {
      case Some(s) => r.schema(s)
      case None => r.option("inferSchema", "true")
    }
    val df = r.csv(path)
    if (!headerRow && schema.isEmpty)
      df.toDF(df.columns.indices.map(i => s"f$i"): _*)
    else df
  }

  /** Parquet (the Arrow-columnar equivalent of the reference's vineyard
    * tables). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The simple-graph text format of the reference test harness
    * (--vfile `id[ data]` / --efile `src dst [weight]`, whitespace
    * separated — analytical_engine/test/run_app.h:197-210). */
  def edgeListFile(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = spark.read.text(path)
    val parts = split(trim(col("value")), "\\s+")
    raw.where(length(trim(col("value"))) > 0)
      .select(
        element_at(parts, 1).cast("long").as("src"),
        element_at(parts, 2).cast("long").as("dst"),
        when(size(parts) >= 3, element_at(parts, 3).cast("double"))
          .otherwise(lit(1.0)).as("weight"))
  }
}
