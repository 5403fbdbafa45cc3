package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generator for the mandated input table
  * (BASELINE.json input_hint): source-code repository files with columns
  * (repo: string, path: string, commit: string, lang: string,
  * content: string).
  *
  * Fully distributed (`spark.range` + pure column expressions — no
  * driver-side data, no RNG state), so the same (seed, nFiles, nRepos)
  * yields byte-identical rows at any parallelism level or data scale, which
  * is what makes the per-row sha256 content invariant and the two-cluster-
  * size invariance checks meaningful.
  *
  * Shape knobs mirror the FIXTURES.md §1 description:
  *   - Zipf-ish repo sizes (quadratic density -> low repo ids are hubs);
  *   - shared path basenames across repos -> co-occurrence edges;
  *   - synthetic `import org.repoK.FileB` lines -> import-link edges, with
  *     a bias toward the first repos to create high-degree hub vertices
  *     (the skew the north rule requires us to handle).
  */
object SourceFiles {

  val langs = Seq("scala", "java", "py", "go", "rs")

  def generate(
      spark: SparkSession,
      nFiles: Long,
      nRepos: Int,
      nBasenames: Int = 64,
      seed: Long = 42L): DataFrame = {
    val id = col("id")
    def h(salt: Int) = abs(xxhash64(id, lit(seed), lit(salt)))

    // Quadratic skew: u in [0,1) from a hash, repo = floor(u^2 * nRepos).
    val u = (h(1) % 1000000L).cast("double") / lit(1000000.0)
    val repoId = least(floor(u * u * nRepos).cast("long"), lit(nRepos - 1L))

    val langIdx = (h(2) % langs.size).cast("int")
    val lang = element_at(
      array(langs.map(lit): _*), langIdx + 1)

    val basename = concat(lit("File"), (h(3) % nBasenames).cast("string"))
    // Import targets: one uniform, one hub-biased (first 8 repos).
    val impUniform = (h(4) % nRepos).cast("string")
    val impHub = (h(5) % math.min(8L, nRepos.toLong)).cast("string")
    val impBase = concat(lit("File"), (h(6) % nBasenames).cast("string"))

    spark.range(nFiles).select(
      concat(lit("org/repo"), repoId.cast("string")).as("repo"),
      concat(lit("src/"), lang, lit("/"), basename, lit("_"),
        id.cast("string"), lit("."), lang).as("path"),
      lang.cast("string").as("lang"),
      concat(
        lit("package org.repo"), repoId.cast("string"), lit(";\n"),
        lit("import org.repo"), impUniform, lit("."), impBase, lit(";\n"),
        lit("import org.repo"), impHub, lit(".Core;\n"),
        lit("class "), basename, lit(" { /* body "),
        h(7).cast("string"), lit(" */ }\n")).as("content"))
      // commit is deterministic from (repo, path) per FIXTURES.md §1.
      .withColumn("commit",
        lower(hex(xxhash64(col("repo"), col("path"), lit(seed)))))
      .select("repo", "path", "commit", "lang", "content")
  }

  /** The per-row invariant column (north rule: per-row content sha256
    * equality against the source rows). */
  def withSha(df: DataFrame): DataFrame =
    df.withColumn("content_sha", sha2(col("content"), 256))
}
