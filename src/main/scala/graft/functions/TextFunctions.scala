package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * ID, quality scoring, token counting, fingerprinting, minhash/simhash.
  *
  * These have no counterpart in the reference (it is purely numeric); they
  * are the beyond-reference surface required by BASELINE.json's north star.
  * Everything here is built from codegen'd `functions._` expressions — no
  * UDFs — so the whole pipeline stays inside WholeStageCodegen and scales as
  * narrow per-row maps (no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenization — the shared convention for every op below. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word shingles of width `n`, joined by spaces. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(transform(
      sequence(lit(0), size(t) - lit(n)),
      i => concat_ws(" ", (0 until n).map(k => get(t, i + lit(k))): _*)))
  }

  /** MinHash component for one seed: the minimum md5 digest over distinct
    * tokens of `seed|token`. String-min over lowercase hex is a total order
    * identical across engines, making signatures oracle-checkable. */
  def minhash(text: Column, seed: Int): Column =
    array_min(transform(array_distinct(tokens(text)),
      w => md5(concat(lit(s"$seed|"), w))))

  /** k-component MinHash signature as separate columns mh0..mh{k-1}. */
  def minhashSignature(text: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map(i => s"mh$i" -> minhash(text, i))

  /** 16-bit SimHash from per-token md5 digests: bit b is set when the
    * majority of tokens have hex digit b of md5(token) >= '8' (top bit of
    * the nibble). Pure expression — portable and codegen'd. */
  def simhash16(text: Column): Column = {
    val t = tokens(text)
    (0 until 16).map { b =>
      val votes = aggregate(
        transform(t, w => when(substring(md5(w), b + 1, 1) >= "8", 1).otherwise(-1)),
        lit(0), (acc, x) => acc + x)
      when(votes > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Document fingerprint: md5 of the sorted distinct token set — an
    * order-insensitive content hash (bag-of-words identity). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t)
  }

  /** Mean token length (chars), derived without re-tokenizing:
    * (chars - separators) / tokens. */
  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - lit(1))).cast("double") / n
  }

  /** Language-ID by stopword voting over per-language marker lists; returns
    * the language with the most marker hits (ties broken by language code
    * order). Lists are tiny and inlined into the codegen'd expression. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "est"),
    "zh" -> Seq("de", "shi", "le", "zai", "wo", "you", "he"))

  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = langMarkers.zipWithIndex.map { case ((lang, ws), idx) =>
      struct(size(filter(t, w => w.isin(ws: _*))).as("score"),
             lit(-idx).as("tb"), lit(lang).as("lang"))
    }
    // greatest(struct(score, tiebreak, lang)) — max score wins; stable tie-break
    greatest(scored: _*).getField("lang")
  }
}
