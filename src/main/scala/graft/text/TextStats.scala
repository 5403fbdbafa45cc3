package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd, no UDFs). */
object TextStats {

  /** Whitespace token count (separator-count formula — kept identical to
    * the DuckDB oracle in OracleSql.dTokenCount). */
  def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + lit(1))
      .cast("long")

  /** Regex-based "BPE-ish" token count: word pieces, numbers, and single
    * punctuation marks each count as one token. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"),
      t => t =!= "")).cast("long")

  /** Quality features: char count, token count, mean token length,
    * punctuation ratio, stopword ratio, uppercase ratio. Char-class
    * counts use `translate` (not regexp_replace) so the identical
    * formula replays in ANSI SQL engines whose regexp_replace is
    * first-match-only (DuckDB needs a 'g' flag Spark doesn't parse).
    * This is THE quality implementation — the driver catalog entry
    * (Queries.dQuality) and its DuckDB oracle both mirror it. */
  private val punctChars = ".,!?;:"
  private val upperChars = ('A' to 'Z').mkString
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val punct = length(t) - length(translate(t, punctChars, ""))
    val upper = length(t) - length(translate(t, upperChars, ""))
    val stop = (length(t) - length(replace(t, lit(" the "), lit("")))) / 5 +
      (length(t) - length(replace(t, lit(" a "), lit("")))) / 3
    docs.select(col(idCol),
      length(t).cast("long").as("n_chars"),
      toks.as("n_tokens"),
      (length(replace(t, lit(" "), lit(""))).cast("double") /
        toks.cast("double")).as("avg_token_len"),
      (punct.cast("double") / greatest(length(t), lit(1)))
        .as("punct_ratio"),
      (upper.cast("double") / greatest(length(t), lit(1)))
        .as("upper_ratio"),
      (stop.cast("double") / toks.cast("double")).as("stop_ratio"))
  }

  /** Language-ID by per-language stopword frequency (n-gram heuristic);
    * deterministic tie-break by the priority order of `profiles`. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " y "),
    "fr" -> Seq(" le ", " les ", " et "))

  def langId(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      profiles: Seq[(String, Seq[String])] = defaultProfiles): DataFrame = {
    val t = col(textCol)
    def score(words: Seq[String]): Column = words.map { w =>
      (length(t) - length(replace(t, lit(w), lit("")))) / lit(w.length)
    }.reduce(_ + _)
    val scored = docs.select(col(idCol) +: profiles.map { case (l, ws) =>
      score(ws).as(s"s_$l") }: _*)
    val best = profiles.map(_._1).foldRight(
      lit(profiles.last._1)) { (l, elseCol) =>
      val isMax = profiles.map(_._1).filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduceOption(_ && _).getOrElse(lit(true))
      when(isMax, lit(l)).otherwise(elseCol)
    }
    scored.select(col(idCol), best.as("lang_pred"))
  }

  /** Document fingerprint: winnowing-style — the minimum k-gram hash per
    * document (a 1-hash MinHash; robust to local edits). For a w-window
    * winnow set use Dedup.minhashSignature. */
  def fingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => xxhash64(substr(text, i, lit(k)))))
}
