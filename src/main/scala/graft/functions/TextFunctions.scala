package graft.functions

/** Text-analysis expression builders (SURVEY.md §2.G): language ID,
  * quality features, token counting, document fingerprinting.
  *
  * Each helper emits formula text in both engines' dialects (Spark
  * `filter/size/split` vs DuckDB `list_filter/len/string_split`) from one
  * definition, so query and oracle can't drift. All features are integer
  * counts or exact rational scores (SURVEY.md §4).
  */
object TextFunctions {

  /** Marker words per language, in tie-break priority order. The corpus is
    * synthetic, so markers are a deterministic heuristic, not linguistics.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("shi", "bu", "wo", "ni", "ta"))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Marker-hit count for one language over column `text`. */
  def scoreSpark(words: Seq[String]): String =
    s"CAST(size(filter(split(trim(text), ' '), t -> t IN ${inList(words)})) AS BIGINT)"
  def scoreDuck(words: Seq[String]): String =
    s"len(list_filter(string_split(trim(text), ' '), t -> t IN ${inList(words)}))"

  /** Arg-max CASE over score aliases s_<lang>; identical in both dialects. */
  val predictCaseSql: String = {
    val langs = langMarkers.map(_._1)
    val whens = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1)
      val conds = rest.map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${langs.last}' END"
  }

  /** Whitespace token count (regexp-based; both engines use `[^ ]+`). */
  val wsTokensSpark = "CAST(size(regexp_extract_all(text, '[^ ]+', 0)) AS BIGINT)"
  val wsTokensDuck = "len(regexp_extract_all(text, '[^ ]+'))"

  /** BPE-ish token count: letter runs, digit runs, single other chars. */
  private val bpePat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  val bpeTokensSpark = s"CAST(size(regexp_extract_all(text, '$bpePat', 0)) AS BIGINT)"
  val bpeTokensDuck = s"len(regexp_extract_all(text, '$bpePat'))"

  /** Short-token count (length <= 2). */
  val shortTokensSpark =
    "CAST(size(filter(split(trim(text), ' '), t -> length(t) <= 2)) AS BIGINT)"
  val shortTokensDuck =
    "len(list_filter(string_split(trim(text), ' '), t -> length(t) <= 2))"

  /** Rolling polynomial fingerprint over the ordered token stream
    * (positional — reordered docs get different prints, unlike bag-of-words
    * dedup keys). Spark `aggregate` / DuckDB `list_reduce` with a prepended
    * zero seed to align fold semantics.
    */
  val fingerprintSpark: String = {
    val code = graft.operators.Dedup.tokenCodeSql(8, "rpad(t, 8, ' ')")
    s"aggregate(transform(split(trim(text), ' '), t -> $code), 0L, " +
      "(acc, c) -> (acc * 1000003 + c) % 2147483647)"
  }
  val fingerprintDuck: String = {
    val code = graft.operators.Dedup.tokenCodeSql(8, "rpad(t, 8, ' ')")
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(trim(text), ' '), t -> $code)), " +
      "(acc, c) -> (acc * 1000003 + c) % 2147483647)"
  }
}
