package graft

import org.apache.spark.sql.functions._

/** Physical-plan contracts (the properties that survive a 100x scale-up):
  * predicate pushdown and column pruning reach the parquet scan, the text
  * pipeline stays inside whole-stage codegen with no UDFs, and the small
  * side of the ANN join is broadcast. These assert the SHAPE of the plan,
  * not timings, so they are stable across machines. */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("filters and projections push down to the parquet scan") {
    val plan = executedPlan(Queries.iFilter(spark, dir))
    assert(plan.contains("PushedFilters: ["), "no pushed filters")
    assert(plan.contains("IsNotNull(c_acctbal)")
      || plan.contains("GreaterThan(c_acctbal"),
      s"c_acctbal filter not pushed:\n$plan")
    // column pruning: untouched wide columns never reach the scan
    assert(!plan.contains("c_address") && !plan.contains("c_comment"),
      "scan reads pruned columns")
  }

  test("text/dedup pipeline is UDF-free and inside whole-stage codegen") {
    for (q <- Seq(Queries.dQuality(spark, dir),
        Queries.dTokenCount(spark, dir), Queries.dLangId(spark, dir))) {
      val plan = executedPlan(q)
      // executedPlan.toString marks whole-stage codegen spans as "*(n)"
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        "no codegen span")
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        "UDF in the hot path")
    }
  }

  test("ANN brute-force broadcasts the query side, not the corpus") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val plan = executedPlan(graft.sim.Ann.bruteForceTopK(emb, q, 10))
    assert(plan.contains("Broadcast"), s"no broadcast in:\n$plan")
  }

  test("IVF probes broadcast centroids + probe set; embeddings UDF-free") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_embedding"))
    val plan = executedPlan(
      graft.sim.Ann.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 4,
        iters = 1))
    assert(plan.contains("Broadcast"), s"no broadcast in:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "UDF in the IVF path")
    // The nlist-row centroid side must never be the build side of a
    // sort-merge join against the corpus.
    assert(!plan.contains("CartesianProduct"),
      s"non-broadcast cross join in:\n$plan")
  }

  test("dedupClusters pair generation is UDF-free with no cross join") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"),
      (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val plan = executedPlan(graft.text.Dedup.dedupClusters(docs))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "UDF in the dedup path")
    assert(!plan.contains("CartesianProduct"),
      s"all-pairs cross join in:\n$plan")
  }

  test("dedup hub caps are groupBy-count semi-joins, never Window sorts") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"),
      (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    // One cap implementation everywhere: a Window count over the banded /
    // inverted relation re-sorts the full exploded relation per key — at
    // 100 TB that sort is pure waste next to a map-side-combinable
    // groupBy.count semi-join (the incrementalMinhashPairs form).
    for (q <- Seq(graft.text.Dedup.minhashPairs(docs),
        graft.text.Dedup.ngramJaccardPairs(docs))) {
      val plan = executedPlan(q)
      assert(!plan.contains("Window"),
        s"Window sort in the dedup cap path:\n$plan")
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        "UDF in the dedup path")
    }
  }

  test("superstep aggregation is map-side combined (partial + final)") {
    val g = graphbuild.CoPurchase.graph(spark, dir)
    val contrib = g.edges
      .join(g.outDegrees.select(col("vid").as("src"), col("deg")), "src")
      .groupBy(col("dst")).agg(sum(lit(1.0) / col("deg")).as("m"))
    val plan = executedPlan(contrib)
    // two HashAggregate nodes = partial (map-side combine) + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("snapshot scan: manifest pruning composes with parquet pushdown") {
    import graft.sources.SnapshotTable
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("plan-snap")
    val t = root.resolve("t").toString
    try {
      SnapshotTable.create(
        (0L until 100L).map(i => (i, s"d-$i")).toDF("id", "text")
          .repartition(1), t)
      SnapshotTable.append(
        (100L until 200L).map(i => (i, s"d-$i")).toDF("id", "text")
          .repartition(1), t)
      val scanned = SnapshotTable.scan(spark, t,
        Seq(GreaterThanOrEqual("id", 120L), LessThan("id", 130L)))
      // tier 1: the manifest stats plan only the matching file
      assert(scanned.inputFiles.length == 1)
      // tier 2: the residual filter reaches the parquet scan, so row
      // groups inside the kept file are pruned by the reader too
      val plan = executedPlan(scanned)
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThanOrEqual(id,120)"),
        s"residual filter not pushed to the parquet scan:\n$plan")
    } finally {
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }
}
