package org.apache.spark.sql.graft

import org.apache.spark.unsafe.types.UTF8String

/** THE tokenization contract for every native text expression.
  *
  * One definition of "whitespace tokens" shared by [[RepetitionStats]],
  * [[SimHash60]], [[ShingleHashes]] and [[ShingleMinHash]], replicating
  * the SQL formulation `split(trim(text), '\\s+')` EXACTLY — the same
  * expression the DuckDB oracles spell as
  * `regexp_split_to_array(trim(text), '\s+')`:
  *
  *   - `trim` strips ONLY leading/trailing spaces (U+0020), not tabs
  *     or newlines — SQL trim's default trim set, NOT Java
  *     `String.trim` (which strips every char <= U+0020);
  *   - the split keeps leading AND trailing empty tokens — Spark's
  *     `split(str, re)` defaults to limit -1, NOT Java `split(re)`'s
  *     limit 0 (which drops trailing empties).
  *
  * So `"foo bar\n"` tokenizes to `["foo", "bar", ""]` — three tokens,
  * the last empty — on the engine, the oracle, and here.
  *
  * Out-of-contract edge, documented rather than papered over: Java's
  * `\s` class includes U+000B (vertical tab), RE2's (DuckDB) does not.
  * A text with an interior vertical tab splits in Spark but not in
  * DuckDB — a divergence of the SQL twin itself, not of this native
  * path, which pins to the Spark side. No other `\s` member differs
  * (space, \t, \n, \f, \r all agree; verified empirically against
  * DuckDB 1.x).
  *
  * TokenizeSpec pins native-vs-SQL equality on adversarial padding
  * (\t/\n/\r/\f, leading and trailing, empty and all-space strings).
  */
object Tokenize {

  /** `split(trim(text), '\\s+')` with exact Spark SQL semantics. */
  def sqlTokens(text: UTF8String): Array[String] = {
    val s = text.toString
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    // limit -1: keep trailing empty tokens, matching Spark's split
    (if (from == 0 && to == s.length) s else s.substring(from, to))
      .split("\\s+", -1)
  }
}
