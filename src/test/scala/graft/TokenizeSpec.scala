package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Tokenize
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize.sqlTokens IS the `split(trim(text), '\s+')` expression —
  * pinned against the real Spark expression on adversarial padding,
  * because that expression is also what every DuckDB oracle spells
  * out. Java String.trim / split-limit-0 semantics (strip-all-controls
  * / drop-trailing-empties) are exactly the bugs this contract bans. */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "",                 // one empty token
    " ",                // all-space → one empty token
    "   ",
    "\t",               // tab survives trim → two empty tokens
    "\n",
    "foo bar",
    " foo bar ",        // space padding: trimmed
    "foo bar\n",        // trailing newline → trailing empty token
    "foo bar\t",
    "foo bar\r\n",
    "\tfoo bar",        // leading tab → leading empty token
    "\nfoo",
    " \t foo \n ",      // mixed: spaces trimmed, \t/\n kept
    "a\t\tb",
    "x\n\ny",
    "héllo wörld\n",
    "\f\ra b\f")

  test("sqlTokens == split(trim(text), '\\s+') on adversarial padding") {
    val fromSpark = adversarial.toDF("text")
      .select($"text", split(trim($"text"), "\\s+").as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    adversarial.foreach { s =>
      val native = Tokenize.sqlTokens(UTF8String.fromString(s)).toList
      assert(native == fromSpark(s),
        s"'${s.replace("\n", "\\n").replace("\t", "\\t")}': " +
          s"native $native vs spark ${fromSpark(s)}")
    }
  }

  test("the contract differs from Java trim/split where it must") {
    // trailing newline: Java drops it AND the trailing empty token
    val t = UTF8String.fromString("foo bar\n")
    assert(Tokenize.sqlTokens(t).toList == List("foo", "bar", ""))
    assert("foo bar\n".trim.split("\\s+").toList == List("foo", "bar"))
    // leading tab: kept as a leading empty token
    assert(Tokenize.sqlTokens(UTF8String.fromString("\tx")).toList ==
      List("", "x"))
    // space padding still trims like before
    assert(Tokenize.sqlTokens(UTF8String.fromString("  a b  ")).toList ==
      List("a", "b"))
  }
}
