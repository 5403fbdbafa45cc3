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
  * in-memory `localCheckpoint`s (lineage cut, not resumable).
  * `snapshot=true` checkpoints through [[graft.sources.SnapshotTable]]
  * instead of bare per-iteration parquet dirs: each superstep becomes an
  * atomically-committed snapshot of one versioned table per runId, with
  * the convergence metrics in the manifest summary and per-FILE lineage
  * in the manifest itself — the north rule's "checkpoints per-iteration
  * vertex state to Iceberg[-class tables] with per-partition lineage and
  * convergence metrics for resumable runs" in one artifact, plus time
  * travel to any earlier iteration's full vertex state. */
final case class CheckpointConfig(
    dir: Option[String] = None,
    runId: String = "run",
    every: Int = 1,
    snapshot: Boolean = false)

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
    *                 summed for the convergence count, kept on the state
    *                 (and in durable checkpoints — exact frontier resume),
    *                 and dropped only from the returned Result.
    * @param stopWhenUnchanged terminate early when the `_changed` sum is 0
    *                 (fixed-round algorithms like PageRank/CDLP pass false)
    */
  def run(
      init: DataFrame,
      maxRounds: Int,
      step: (DataFrame, Int) => DataFrame,
      stopWhenUnchanged: Boolean = true,
      checkpoint: CheckpointConfig = CheckpointConfig()): Result =
    runDelta(init, maxRounds, (s, r, _) => step(s, r), stopWhenUnchanged,
      checkpoint)

  /** Like [[run]], but the step also receives the PREVIOUS round's
    * `_changed` sum (the frontier-delta size; -1 when unknown — e.g. the
    * first round after a resume). Frontier apps use it to broadcast-hint
    * a shrunken frontier (north rule: "broadcast of high-degree frontier
    * deltas", [[graft.graph.Strategy.frontier]]) without paying an extra
    * count job — the convergence check already computed the number.
    * @param initChanged the frontier size of `init` when the caller knows
    *   it (single-source apps seed exactly 1); -1 = unknown. */
  def runDelta(
      init: DataFrame,
      maxRounds: Int,
      step: (DataFrame, Int, Long) => DataFrame,
      stopWhenUnchanged: Boolean = true,
      checkpoint: CheckpointConfig = CheckpointConfig(),
      initChanged: Long = -1L): Result = {

    val spark = init.sparkSession
    var metrics = Vector.empty[IterMetrics]

    // Resume: newest complete parquet checkpoint for this runId. If that
    // iteration has per-partition lineage on record, the resumed state is
    // validated against it (row total + content checksum) before any new
    // round runs — a truncated or foreign checkpoint fails loudly instead
    // of resuming from corrupt state.
    var startRound = 0
    var state: DataFrame = null
    checkpoint.dir.foreach { d =>
      if (checkpoint.snapshot) {
        val table = s"$d/${checkpoint.runId}"
        graft.sources.SnapshotTable.currentVersionOpt(spark, table)
          .foreach { v =>
            val m = graft.sources.SnapshotTable.manifest(spark, table, v)
            startRound = m.summary("iteration").toInt
            graft.sources.SnapshotTable.validate(spark, table, v)
            state = graft.sources.SnapshotTable
              .readVersion(spark, table, v)
          }
      } else {
        val found = latestCheckpoint(d, checkpoint.runId)
        found.foreach { case (round, path) =>
          startRound = round
          state = spark.read.parquet(path)
          validateLineage(d, checkpoint.runId, round, state)
        }
      }
    }
    if (state == null) state = init.localCheckpoint(true)
    else {
      // Checkpoints persist the step OUTPUT, which may carry `_changed`
      // even when `init` does not (steps that derive their frontier from
      // the state each round, e.g. the Pregel runner): tolerate exactly
      // that extra column and drop it so the step sees the same shape as
      // in an unresumed run. Anything else is a wrong runId or a
      // pre-frontier-era checkpoint — refuse; a frontier cannot be
      // reinvented on resume (an unreached vertex must not broadcast).
      val want = init.columns.toSet
      val got = state.columns.toSet
      require(got == want || got == want + "_changed",
        s"checkpoint for runId '${checkpoint.runId}' has columns " +
          s"${state.columns.toSeq} but this run's state is " +
          s"${init.columns.toSeq} — wrong runId, or a pre-frontier-era " +
          "checkpoint (re-run from scratch)")
      if (!want.contains("_changed") && got.contains("_changed"))
        state = state.drop("_changed")
    }

    var round = startRound
    var done = false
    var prev = state
    // Frontier-delta size from the previous round. Fresh runs take the
    // caller's hint; resumes recompute it exactly from the restored
    // frontier column (checkpoints persist it), one agg once per resume.
    var lastChanged =
      if (startRound == 0) initChanged
      else if (state.columns.contains("_changed"))
        state.agg(sum(col("_changed").cast("long"))).head() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
      else -1L
    while (round < maxRounds && !done) {
      round += 1
      val t0 = System.nanoTime()
      val next0 = step(prev, round, lastChanged)
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
      val wall = (System.nanoTime() - t0) / 1000000
      val m = IterMetrics(checkpoint.runId, round, changed, rows,
        spark.sessionState.conf.numShufflePartitions, wall)
      metrics :+= m
      if (sys.env.contains("GRAFT_ITER_VERBOSE"))
        println(s"[iter] ${checkpoint.runId} round=$round " +
          s"changed=$changed wallMs=$wall")
      checkpoint.dir.foreach { d =>
        if (round % checkpoint.every == 0) {
          if (checkpoint.snapshot) {
            graft.sources.SnapshotTable.overwrite(
              next, s"$d/${checkpoint.runId}",
              summary = Map(
                "runId" -> checkpoint.runId,
                "iteration" -> round.toString,
                "changed" -> changed.toString,
                "stateRows" -> rows.toString,
                "numPartitions" -> m.numPartitions.toString,
                "wallMs" -> wall.toString))
            appendMetrics(d, m)
          } else {
            next.write.mode("overwrite")
              .parquet(s"$d/${checkpoint.runId}/iter_$round")
            appendMetrics(d, m)
            appendLineage(d, checkpoint.runId, round, next)
          }
        }
      }
      if (prev ne init) prev.unpersist()
      prev = next
      if (hasChanged) lastChanged = changed
      if (hasChanged && stopWhenUnchanged && changed == 0L) done = true
    }
    // The frontier column is engine state: it stays on the in-session
    // frame AND inside durable checkpoints (a resume needs the exact
    // frontier — re-marking all vertices changed would make reachability
    // apps broadcast from unreached vertices), but is dropped from the
    // returned result.
    val out = if (prev.columns.contains("_changed"))
      prev.drop("_changed") else prev
    Result(out, metrics, round)
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

  /** Per-partition lineage (north rule: "per-partition lineage"): one
    * line per (iteration, partition) with row count and an
    * order-independent content checksum (sum of per-row xxhash64 in
    * DECIMAL(38,0) — ANSI-safe, no long overflow). Written next to each
    * durable checkpoint; `validateLineage` replays it on resume. The agg
    * collects one row PER PARTITION (P rows), never data rows. */
  private def appendLineage(dir: String, runId: String, round: Int,
      state: DataFrame): Unit = {
    val cols = state.columns.map(col)
    val parts = state
      .groupBy(spark_partition_id().as("part"))
      .agg(count(lit(1)).as("rows"),
        sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("checksum"))
      .orderBy("part")
      .collect()
    val p = Paths.get(dir, runId, "lineage.jsonl")
    Files.createDirectories(p.getParent)
    val lines = parts.map { r =>
      s"""{"runId":"$runId","iteration":$round,""" +
      s""""partition":${r.getInt(0)},"rows":${r.getLong(1)},""" +
      s""""checksum":"${r.getDecimal(2)}"}"""
    }.mkString("", "\n", "\n")
    Files.writeString(p, lines, StandardOpenOption.CREATE,
      StandardOpenOption.APPEND)
  }

  /** Check a resumed checkpoint against its recorded lineage: total rows
    * and the (partitioning-independent) sum of per-partition checksums
    * must match. Partition boundaries themselves may legally differ on
    * re-read — the checksum is a sum of per-row hashes, so it is invariant
    * to how rows landed in partitions. No-op when no lineage was written
    * for the round. */
  private def validateLineage(dir: String, runId: String, round: Int,
      state: DataFrame): Unit = {
    val p = Paths.get(dir, runId, "lineage.jsonl")
    if (!Files.exists(p)) return
    val iterRe = """"iteration":(\d+)""".r
    val rowsRe = """"rows":(\d+)""".r
    val sumRe = """"checksum":"(-?\d+)"""".r
    val recs = Files.readAllLines(p).asScala
      .filter(l => iterRe.findFirstMatchIn(l)
        .exists(_.group(1).toInt == round))
    if (recs.isEmpty) return
    val wantRows = recs.map(l =>
      rowsRe.findFirstMatchIn(l).get.group(1).toLong).sum
    val wantSum = recs.map(l =>
      BigDecimal(sumRe.findFirstMatchIn(l).get.group(1))).sum
    val cols = state.columns.map(col)
    val got = state.agg(count(lit(1)).as("rows"),
      sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("checksum")).head()
    require(got.getLong(0) == wantRows,
      s"checkpoint $runId/iter_$round row count ${got.getLong(0)} != " +
        s"lineage total $wantRows — refusing to resume from corrupt state")
    require(BigDecimal(got.getDecimal(1)) == wantSum,
      s"checkpoint $runId/iter_$round content checksum mismatch vs " +
        "lineage — refusing to resume from corrupt state")
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
