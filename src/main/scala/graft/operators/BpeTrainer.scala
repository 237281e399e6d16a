package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction — the tokenizer-TRAINING side
  * of t_token_count_bpe's tokenizer-APPLYING shape: learn the merge
  * table from the corpus itself (Sennrich-style byte-pair encoding
  * over word types).
  *
  * The classic formulation is a driver loop over a word-type
  * dictionary; the distributed shape keeps exactly that structure but
  * makes each step corpus-scalable:
  *  - the WORD TYPE table (word, count) is one hash-aggregate over the
  *    corpus — the only corpus-sized pass; everything after works on
  *    word types, whose cardinality grows slowly (Heaps' law);
  *  - each merge round scores all adjacent symbol pairs with one
  *    explode + weighted hash-aggregate over the type table, takes the
  *    argmax (count desc, then lexicographic pair — the determinism
  *    tie-break), and applies the merge with a typed per-row map
  *    (genuinely imperative left-to-right non-overlapping rewrite —
  *    the documented Dataset-map exception, linear per word);
  *  - the driver holds ONE (pair, count) row per round, never the
  *    dictionary.
  *
  * Rounds are a fixed budget (vocab size is a hyperparameter, not
  * data-dependent), so the job is k deterministic stages. The symbol
  * state is localCheckpoint'd per round like every other iterative
  * artifact in this repo (Lloyd rounds, CC rounds, PageRank rounds).
  *
  * BpeSpec pins the classic hand-computable corpus and determinism;
  * there is no SQL oracle — replaying an iterative argmax-merge in
  * one DuckDB statement would prove the SQL, not the operator — so
  * this stays a spec-verified operator like the other operators/
  * members, not a registry query.
  */
object BpeTrainer {

  /** One learned merge: rank order, the two symbols joined, and the
    * weighted pair count that won the round. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Train `k` merges from a (doc_id, text) corpus. Words are
    * whitespace tokens; symbols start as single characters with the
    * standard </w> end-of-word marker on the final character. Returns
    * the merge table in learned order. */
  def train(spark: SparkSession, docs: DataFrame, k: Int): Seq[Merge] = {
    import spark.implicits._
    val words = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    var syms: Dataset[(Seq[String], Long)] = words
      .map { case (w, n) =>
        val cs = w.toCharArray.map(_.toString)
        (cs.init.toSeq :+ (cs.last + "</w>"), n)
      }
      .localCheckpoint(true)

    val merges = Seq.newBuilder[Merge]
    for (rank <- 0 until k) {
      val best = syms.flatMap { case (ss, n) =>
        ss.zip(ss.tail).map(p => (p._1, p._2, n))
      }
        .toDF("l", "r", "n")
        .groupBy($"l", $"r").agg(sum($"n").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(1)
        .collect()
      if (best.nonEmpty) {
        val row = best.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(rank, l, r, c)
        syms = syms.map { case (ss, n) =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              out += (l + r); i += 2 // left-to-right, non-overlapping
            } else { out += ss(i); i += 1 }
          }
          (out.result(), n)
        }.localCheckpoint(true)
      }
    }
    merges.result()
  }

  /** The vocabulary after training: every surviving symbol with its
    * corpus frequency (weighted by word count). */
  def vocab(spark: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val ms = train(spark, docs, k)
    val words = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    words.map { case (w, n) =>
      val cs = w.toCharArray.map(_.toString)
      var ss: Seq[String] = cs.init.toSeq :+ (cs.last + "</w>")
      ms.foreach { m =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < ss.length) {
          if (i + 1 < ss.length && ss(i) == m.left && ss(i + 1) == m.right) {
            out += (m.left + m.right); i += 2
          } else { out += ss(i); i += 1 }
        }
        ss = out.result()
      }
      (ss, n)
    }
      .flatMap { case (ss, n) => ss.map(s => (s, n)) }
      .toDF("symbol", "n")
      .groupBy($"symbol").agg(sum($"n").as("freq"))
  }
}
