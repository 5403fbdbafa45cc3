package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: machine thread-scaling ceiling probe — pure compute
  * (hash chain, no shuffle, no memory traffic) at 8 vs 32 threads. */
object Scratch {
  def main(args: Array[String]): Unit = {
    for (cores <- Seq(8, 32, 8)) {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // warm
      spark.range(10000000L).select(
        sum(xxhash64(col("id")))).head()
      val t0 = System.nanoTime()
      val r = spark.range(2000000000L).repartition(cores * 4)
        .select(sum(xxhash64(xxhash64(xxhash64(col("id")))))).head()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scratch] cores=$cores pure-compute 2e9 hashes: $t%.2f s")
      spark.stop()
    }
  }
}
