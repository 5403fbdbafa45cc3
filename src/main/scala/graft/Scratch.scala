package graft

// Dev probe (not part of the product surface): measures the statistics
// behind the d_minhash_check / d_simhash_check self-check thresholds.
import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")

      // minhash: |est - true| distribution over found pairs
      val pairs = Dedup.minhashPairs(docs)
      val sh = docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 5).as("sh"))
      val diag = pairs
        .join(sh.toDF("id_a", "sh_a"), "id_a")
        .join(sh.toDF("id_b", "sh_b"), "id_b")
        .select(col("est_jaccard"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
            / size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
            .as("tj"))
        .agg(count(lit(1)).as("n"),
          max(abs(col("est_jaccard") - col("tj"))).as("max_err"),
          avg(abs(col("est_jaccard") - col("tj"))).as("avg_err"))
      println(s"$sf minhash: ${diag.head()}")

      // simhash: planted one-word-append pairs vs adjacent-doc pairs
      val planted = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
      val all = docs.select("doc_id", "text").unionByName(planted)
      val shh = Dedup.simhash(all)
      val a = shh.toDF("ia", "sa")
      val p = a.join(shh.toDF("ib", "sb"),
          col("ib") === col("ia") + 1000000L)
        .select(Dedup.hamming64(col("sa"), col("sb")).as("h"))
        .agg(count(lit(1)), max(col("h")), avg(col("h")))
      println(s"$sf simhash planted: ${p.head()}")
      val r = a.join(shh.toDF("ib", "sb"), col("ib") === col("ia") + 1L)
        .where(col("ia") < 1000000L)
        .select(Dedup.hamming64(col("sa"), col("sb")).as("h"))
        .agg(count(lit(1)), min(col("h")), avg(col("h")))
      println(s"$sf simhash adjacent: ${r.head()}")
    }
    spark.stop()
  }
}
