package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import TextFunctions._

/** Language identification + quality scoring heuristics for training-data
  * curation. Pure codegen'd regexp/arithmetic formulas, replicated
  * verbatim in the DuckDB oracle (see Queries) — no model dependency.
  */
object LangFunctions {

  val EnStop: Seq[String] = Seq("the", "and", "of", "to", "in", "is", "for", "with")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
  val EsStop: Seq[String] = Seq("el", "la", "los", "las", "que", "es", "un", "una", "para")
  val FrStop: Seq[String] = Seq("le", "la", "les", "des", "est", "un", "une", "dans", "pour")
  /** Common hanzi — presence marks zh (no \b for CJK; RE2/Java parity). */
  val ZhChars = "的|是|在|了|和|有"

  def zhHits(c: Column): Column =
    size(regexp_extract_all(canonicalText(c), lit("(" + ZhChars + ")"), lit(0)))

  /** Argmax over stopword-hit counts with fixed tie-break order
    * (zh-presence first, then en ≥ de ≥ es ≥ fr). */
  def langId(c: Column): Column = {
    val en = stopwordHits(c, EnStop); val de = stopwordHits(c, DeStop)
    val es = stopwordHits(c, EsStop); val fr = stopwordHits(c, FrStop)
    when(zhHits(c) > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  def punctCount(c: Column): Column =
    size(regexp_extract_all(canonicalText(c), lit("[.,;:!?。！？；]"), lit(0)))

  def alphaCount(c: Column): Column =
    size(regexp_extract_all(canonicalText(c), lit("[a-z]"), lit(0)))

  /** Heuristic quality score in {0.0 … 1.0}: word-count band + stopword
    * density + low punctuation noise. Identical thresholds in the oracle;
    * all ratios are exact rational arithmetic on counts, so both engines
    * produce bit-identical doubles. */
  def qualityScore(c: Column): Column = {
    val words = wsTokenCount(c).cast("double")
    val chars = length(canonicalText(c)).cast("double")
    val stopRatio = stopwordHits(c, EnStop).cast("double") / words
    val punctRatio = punctCount(c).cast("double") / chars
    round(when(words >= 20 && words <= 1000, 0.4).otherwise(0.0)
      + when(stopRatio >= 0.05, 0.3).otherwise(0.0)
      + when(punctRatio <= 0.1, 0.3).otherwise(0.0), 1)
  }
}
