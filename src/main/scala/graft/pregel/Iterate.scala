package graft.pregel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Per-iteration lineage + convergence metrics, one row per superstep
  * (north rule: "checkpoints per-iteration vertex state ... with
  * per-partition lineage and convergence metrics for resumable runs"). */
final case class IterMetrics(
    runId: String,
    iteration: Int,
    changed: Long,
    rows: Long,
    numPartitions: Int,
    wallMs: Long)

/** Where to durably checkpoint iteration state. `dir=None` keeps only
  * in-memory `localCheckpoint`s (lineage cut, not resumable). */
final case class CheckpointConfig(
    dir: Option[String] = None,
    runId: String = "run",
    every: Int = 1)

/** The superstep driver loop — the Spark-side equivalent of the reference's
  * `DefaultWorker::Query` PEval/IncEval loop
  * (analytical_engine/core/worker/default_worker.h:81-112):
  * `init` plays PEval's output, `step` is one IncEval round, and
  * `ToTerminate` becomes "changed == 0" computed from the new state.
  *
  * Every round the new state is checkpointed (in-memory `localCheckpoint`,
  * plus parquet when a dir is configured) — without the lineage cut the plan
  * grows superlinearly with iterations (SURVEY.md §7.4). On a cluster the
  * parquet checkpoint doubles as the resume point: `run` scans the dir and
  * restarts from the newest complete iteration of the same runId.
  */
object Iterate {

  final case class Result(state: DataFrame, metrics: Seq[IterMetrics],
      completedRounds: Int)

  /** @param init     iteration-0 state (must contain column `vid`)
    * @param maxRounds run at most this many IncEval rounds
    * @param step     (state, round) => new state; round is 1-based. If the
    *                 returned frame has a `_changed` int/bool column it is
    *                 summed for the convergence count and then dropped.
    * @param stopWhenUnchanged terminate early when the `_changed` sum is 0
    *                 (fixed-round algorithms like PageRank/CDLP pass false)
    */
  def run(
      init: DataFrame,
      maxRounds: Int,
      step: (DataFrame, Int) => DataFrame,
      stopWhenUnchanged: Boolean = true,
      checkpoint: CheckpointConfig = CheckpointConfig()): Result = {

    val spark = init.sparkSession
    var metrics = Vector.empty[IterMetrics]

    // Resume: newest complete parquet checkpoint for this runId.
    var startRound = 0
    var state: DataFrame = null
    checkpoint.dir.foreach { d =>
      val found = latestCheckpoint(d, checkpoint.runId)
      found.foreach { case (round, path) =>
        startRound = round
        state = spark.read.parquet(path)
      }
    }
    if (state == null) state = init.localCheckpoint(true)

    var round = startRound
    var done = false
    var prev = state
    while (round < maxRounds && !done) {
      round += 1
      val t0 = System.nanoTime()
      val next0 = step(prev, round)
      val hasChanged = next0.columns.contains("_changed")
      // Materialize + cut lineage in one action.
      val next = next0.localCheckpoint(true)
      // Fixed-round algorithms (no _changed column) pay no extra action
      // per round; convergence-gated ones pay one cheap agg over the
      // checkpointed frame.
      val (changed, rows) =
        if (hasChanged) {
          val r = next.agg(
            sum(col("_changed").cast("long")), count(lit(1))).head()
          (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
        } else (-1L, -1L)
      val state1 = if (hasChanged) next.drop("_changed") else next
      val wall = (System.nanoTime() - t0) / 1000000
      val m = IterMetrics(checkpoint.runId, round, changed, rows,
        spark.sessionState.conf.numShufflePartitions, wall)
      metrics :+= m
      if (sys.env.contains("GRAFT_ITER_VERBOSE"))
        println(s"[iter] ${checkpoint.runId} round=$round " +
          s"changed=$changed wallMs=$wall")
      checkpoint.dir.foreach { d =>
        if (round % checkpoint.every == 0) {
          state1.write.mode("overwrite")
            .parquet(s"$d/${checkpoint.runId}/iter_$round")
          appendMetrics(d, m)
        }
      }
      if (prev ne init) prev.unpersist()
      prev = state1
      if (hasChanged && stopWhenUnchanged && changed == 0L) done = true
    }
    Result(prev, metrics, round)
  }

  private def latestCheckpoint(dir: String, runId: String)
      : Option[(Int, String)] = {
    val base = Paths.get(dir, runId)
    if (!Files.isDirectory(base)) return None
    val iters = Files.list(base).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("iter_"))
      .filter(p => Files.exists(p.resolve("_SUCCESS")))
      .map(p => (p.getFileName.toString.stripPrefix("iter_").toInt,
        p.toString))
      .toSeq
    if (iters.isEmpty) None else Some(iters.maxBy(_._1))
  }

  private def appendMetrics(dir: String, m: IterMetrics): Unit = {
    val p = Paths.get(dir, m.runId, "metrics.jsonl")
    Files.createDirectories(p.getParent)
    val line =
      s"""{"runId":"${m.runId}","iteration":${m.iteration},""" +
      s""""changed":${m.changed},"rows":${m.rows},""" +
      s""""numPartitions":${m.numPartitions},"wallMs":${m.wallMs}}""" + "\n"
    Files.writeString(p, line, StandardOpenOption.CREATE,
      StandardOpenOption.APPEND)
  }
}
