package graft

import graft.pregel.{CheckpointConfig, Iterate}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Superstep runner: convergence, metrics, checkpoint + resume. */
class IterateSpec extends SparkSpec {

  test("stops at fixpoint and reports metrics") {
    import spark.implicits._
    // state: countdown to 0 -> changed goes to 0 after 5 rounds
    val init = Seq((1L, 5), (2L, 3)).toDF("vid", "n")
    val res = Iterate.run(init, 100, (s, _) =>
      s.select(col("vid"),
        greatest(col("n") - 1, lit(0)).as("n"),
        when(col("n") > 0, 1).otherwise(0).as("_changed")))
    assert(res.completedRounds == 6) // 5 changing rounds + 1 fixpoint round
    assert(res.metrics.last.changed == 0)
    assert(res.metrics.head.changed == 2)
    assert(res.state.columns.toSeq == Seq("vid", "n"))
  }

  test("fixed-round mode runs exactly maxRounds") {
    import spark.implicits._
    val init = Seq((1L, 0)).toDF("vid", "n")
    val res = Iterate.run(init, 7, (s, _) =>
      s.select(col("vid"), (col("n") + 1).as("n")),
      stopWhenUnchanged = false)
    assert(res.completedRounds == 7)
    assert(res.state.head().getInt(1) == 7)
  }

  test("checkpoint + resume from the newest complete iteration") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val init = Seq((1L, 0)).toDF("vid", "n")
    val cp = CheckpointConfig(Some(dir), runId = "r1")
    // First run: 4 rounds.
    val first = Iterate.run(init, 4, (s, _) =>
      s.select(col("vid"), (col("n") + 1).as("n")),
      stopWhenUnchanged = false, checkpoint = cp)
    assert(first.state.head().getInt(1) == 4)
    // Resumed run to 10 rounds must pick up at round 4, not recompute.
    val resumed = Iterate.run(init, 10, (s, _) =>
      s.select(col("vid"), (col("n") + 1).as("n")),
      stopWhenUnchanged = false, checkpoint = cp)
    assert(resumed.state.head().getInt(1) == 10)
    assert(resumed.metrics.size == 6, "only rounds 5..10 re-ran")
    // metrics.jsonl has per-iteration lineage
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(dir, "r1", "metrics.jsonl"))
    assert(lines.size() == 10)
    assert(lines.get(0).contains("\"iteration\":1"))
    // lineage.jsonl has per-PARTITION lineage: every iteration's rows
    // sum to the state size (1 here) and carry a content checksum.
    val lin = Files.readAllLines(
      java.nio.file.Paths.get(dir, "r1", "lineage.jsonl"))
    assert(lin.size() == 10, "one single-row partition per iteration")
    assert(lin.get(0).contains("\"partition\":"))
    assert(lin.get(0).contains("\"rows\":1"))
    assert(lin.get(0).contains("\"checksum\":\""))
  }

  test("resume refuses a checkpoint that contradicts its lineage") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt-bad").toString
    val init = Seq((1L, 0), (2L, 10)).toDF("vid", "n")
    val cp = CheckpointConfig(Some(dir), runId = "r1")
    Iterate.run(init, 3, (s, _) =>
      s.select(col("vid"), (col("n") + 1).as("n")),
      stopWhenUnchanged = false, checkpoint = cp)
    // Corrupt the newest checkpoint's content without touching lineage:
    // overwrite iter_3 with iter_2's (different) rows.
    val p2 = java.nio.file.Paths.get(dir, "r1", "iter_2")
    val p3 = java.nio.file.Paths.get(dir, "r1", "iter_3")
    spark.read.parquet(p2.toString).write
      .mode("overwrite").parquet(p3.toString)
    val e = intercept[IllegalArgumentException] {
      Iterate.run(init, 5, (s, _) =>
        s.select(col("vid"), (col("n") + 1).as("n")),
        stopWhenUnchanged = false, checkpoint = cp)
    }
    assert(e.getMessage.contains("checksum mismatch"))
  }
}
