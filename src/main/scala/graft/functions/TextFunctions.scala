package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline surface
  * (north-star extension, SURVEY.md §7 phase 4): tokenization, quality
  * scoring, language-ID, rolling-hash fingerprinting, shingling.
  *
  * Everything here is a pure `Column` expression over built-in functions —
  * whole-stage-codegen friendly, no UDFs — so the same logic scales to
  * 100 TB as a map-only pass over the scan (no shuffle, no JVM boxing).
  *
  * Constants (stopword lists, hash modulus) are shared with the DuckDB
  * oracle SQL via [[TextSql]] so the two sides are generated from one
  * definition.
  */
object TextFunctions {

  /** Polynomial rolling-hash modulus (fits 31*h+c in Long). */
  val HashMod = 1000000007L

  /** Stopwords used for quality scoring (English function words that
    * appear in the synthetic corpus vocabulary).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Marker words per language for the n-gram/keyword language-ID
    * heuristic (reference has none; additive per north star).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Scrub patterns for the q74 redaction pass. Both are RE2-safe (no
    * backreferences/lookaround) so Java regex (Spark) and RE2 (DuckDB)
    * match identically. Email is the canonical PII shape — it fires
    * nowhere in the synthetic corpus, and the count column proves that
    * negative end-to-end; the denylist is the configurable knob that
    * DOES fire here, exercising count + replace on real rows. A real
    * deployment swaps patterns (phone, SSN, credit-card), not plumbing.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val DenyPattern  = "\\b(customer|supplier|vector)\\b"

  /** Whitespace tokenization of the lowercased text; empty tokens from
    * leading/trailing/repeated whitespace are dropped so the array is
    * identical to DuckDB's regexp_split_to_array + list_filter.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish subword count: each word contributes ceil(len/4) subword
    * units — a deterministic stand-in for a real BPE vocab (the actual
    * merges table is model-specific; the Spark-side plumbing — per-token
    * arithmetic folded with `aggregate` — is what carries to scale).
    */
  def bpeTokenCount(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + ((length(t) + 3) / 4).cast("long"))

  /** Mean token length (null-safe: null when no tokens). */
  def avgWordLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
      .cast("double") / size(toks)

  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks)

  /** Punctuation density over raw characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,!?;:'\"()-]", "")))
      .cast("double") / length(text)

  /** Composite quality score in [0,1]: long enough, not stopword soup,
    * reasonable word lengths, light punctuation.
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val lenScore  = least(tokenCount(toks).cast("double") / 100.0, lit(1.0))
    val stopScore = lit(1.0) - stopwordRatio(toks)
    val wordScore = least(avgWordLen(toks) / 8.0, lit(1.0))
    val punctPen  = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    lenScore * 0.3 + stopScore * 0.3 + wordScore * 0.2 + punctPen * 0.2
  }

  /** Keyword-marker language-ID: argmax of per-language marker-word hits,
    * 'und' when no marker fires. Ties resolve in [[LangMarkers]] order
    * (greatest-so-far keeps the earlier language).
    */
  def langId(toks: Column): Column = {
    val scored = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    val best = scored.tail.foldLeft[(Column, Column)](
      (lit(scored.head._1), scored.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Polynomial rolling-hash fingerprint over the lowercased character
    * stream: h = fold(h*31 + codepoint) mod 1e9+7. ASCII-stable across
    * engines (Spark `ascii` == DuckDB `unicode` on ASCII input). Backed
    * by the native codegen StringPolyHash expression — the equivalent
    * split-per-character `aggregate` fold allocates one string per
    * character per row (TextDedupSpec pins equality).
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.polyHash(lower(text))

  /** Distinct n-token shingles joined by single spaces. Guarded for
    * short docs: Spark's `sequence(1, 0)` would count DOWN, so texts with
    * fewer than n tokens return an empty array explicitly.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))

  /** Rolling hash of each shingle (maps shingle strings into [0, HashMod)
    * for MinHash). Native StringPolyHash per element.
    */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => org.apache.spark.sql.graft.GraftExpressions.polyHash(s))
}

/** DuckDB-side spellings of the [[TextFunctions]] expressions, generated
  * from the same constants so Spark and oracle can never drift.
  */
object TextSql {
  import TextFunctions._

  /** `toks` CTE fragment: tokenized lowercased text. */
  def toksExpr(textCol: String): String =
    s"list_filter(regexp_split_to_array(lower($textCol), '\\s+'), t -> t != '')"

  def tokenCountExpr(toks: String): String = s"len($toks)"

  def bpeCountExpr(toks: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform($toks, t -> ((length(t)+3)//4)::BIGINT)), (a,b) -> a+b)"

  def avgWordLenExpr(toks: String): String =
    s"(list_reduce(list_prepend(0::BIGINT, list_transform($toks, t -> length(t)::BIGINT)), (a,b) -> a+b))::DOUBLE / len($toks)"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  def stopwordRatioExpr(toks: String): String =
    s"len(list_filter($toks, t -> t IN ${inList(Stopwords)}))::DOUBLE / len($toks)"

  def punctRatioExpr(textCol: String): String =
    s"""(length($textCol) - length(regexp_replace($textCol, '[.,!?;:''"()-]', '', 'g')))::DOUBLE / length($textCol)"""

  def qualityExpr(textCol: String, toks: String): String = {
    val lenScore  = s"least(${tokenCountExpr(toks)}::DOUBLE / 100.0, 1.0)"
    val stopScore = s"(1.0 - ${stopwordRatioExpr(toks)})"
    val wordScore = s"least(${avgWordLenExpr(toks)} / 8.0, 1.0)"
    val punctPen  = s"(1.0 - least(${punctRatioExpr(textCol)} * 5.0, 1.0))"
    s"($lenScore * 0.3 + $stopScore * 0.3 + $wordScore * 0.2 + $punctPen * 0.2)"
  }

  def langIdExpr(toks: String): String = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> s"len(list_filter($toks, t -> t IN ${inList(markers)}))"
    }
    // Same fold as TextFunctions.langId: strictly-greater replaces.
    val (bl, bs) = scores.tail.foldLeft((s"'${scores.head._1}'", scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (s"(CASE WHEN $s > $bs THEN '$lang' ELSE $bl END)",
         s"greatest($s, $bs)")
    }
    s"(CASE WHEN $bs > 0 THEN $bl ELSE 'und' END)"
  }

  /** Character rolling hash; `%` in DuckDB on non-negative operands
    * matches Spark's pmod here (acc stays in [0, HashMod)).
    */
  def fingerprintExpr(textCol: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(list_filter(regexp_split_to_array(lower($textCol), ''), c -> c != ''), c -> unicode(c)::BIGINT)), (a,b) -> (a*31+b) % $HashMod)"

  def stringHashExpr(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(list_filter(regexp_split_to_array($s, ''), c -> c != ''), c -> unicode(c)::BIGINT)), (a,b) -> (a*31+b) % $HashMod)"

  def shinglesExpr(toks: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, greatest(len($toks)-${n - 1}, 0)), i -> $parts))"
  }
}
