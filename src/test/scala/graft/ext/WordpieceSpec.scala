package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** The packed-cursor greedy fold vs an independent Scala reference
  * implementation of maximal munch — full-corpus equality, plus the
  * boundary contracts (longest-first, UNK advance, long-word collapse,
  * degenerate spine). */
class WordpieceSpec extends SparkSpec {

  private val vocab = Seq("the", "ing", "ion", "er", "in", "re") ++
    ('a' to 'z').map(_.toString)

  /** Direct transcription of the documented rule, no packing tricks. */
  private def ref(w: String, v: Set[String], maxPiece: Int, maxWord: Int): (Long, Long) = {
    if (w == null || w.isEmpty) (0L, 0L)
    else if (w.length > maxWord) (0L, 1L)
    else {
      var pos = 0; var pieces = 0L; var unk = 0L
      while (pos < w.length) {
        val hit = (math.min(maxPiece, w.length - pos) to 1 by -1)
          .find(l => v.contains(w.substring(pos, pos + l)))
        hit match {
          case Some(l) => pos += l; pieces += 1
          case None    => pos += 1; unk += 1
        }
      }
      (pieces, unk)
    }
  }

  test("fold equals the reference tokenizer over the whole fixture corpus") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val got = TextStats.wordpieceCounts(docs, col("doc_id"), col("text"), vocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val vset = vocab.toSet
    val want = docs.select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      val words =
        if (r.isNullAt(1)) Array.empty[String]
        else r.getString(1).toLowerCase.split(" ", -1)
      val (p, u) = words.map(ref(_, vset, 3, 64)).foldLeft((0L, 0L)) {
        case ((ap, au), (p, u)) => (ap + p, au + u)
      }
      id -> (words.length.toLong, p, u)
    }.toMap
    assert(got.keySet == want.keySet)
    val bad = got.collect { case (id, g) if g != want(id) => (id, g, want(id)) }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(3).mkString("; ")}")
    // fixture words are all-lowercase-letter, so UNKs are structurally 0
    // here; the UNK path is exercised by the planted cases below.
    assert(got.values.map(_._2).sum > 0, "fixture should produce pieces")
  }

  test("maximal munch prefers the longest piece and collapses long words") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "theing"),            // the+ing, NOT t-h-e-i-n-g
      (2L, "a!b"),               // ! is UNK between two 1-char pieces
      (3L, "x" * 65),            // beyond maxWordLen: single UNK
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val got = TextStats.wordpieceCounts(df, col("doc_id"), col("text"), vocab)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1L, 2L, 0L)), s"maximal munch broke: ${got(1L)}")
    assert(got(2L) == ((1L, 2L, 1L)), s"UNK advance broke: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, 1L)), s"long-word collapse broke: ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L)), s"null-text spine broke: ${got(4L)}")
    // split("", " ") yields one empty token; tokenizing "" is (0, 0)
    assert(got(5L) == ((1L, 0L, 0L)), s"empty-text contract broke: ${got(5L)}")
  }

  test("vocab pieces with single quotes and backslashes survive SQL literal escaping") {
    val s = spark
    import s.implicits._
    // Spark's lexer has no ''-doubling: under the old escaping, vocab "'s"
    // became two adjacent literals that concatenated with their neighbor,
    // silently corrupting the whole IN-list. Backslash escaping is correct.
    val docs = Seq((1L, "it's o'k a\\b")).toDF("doc_id", "text")
    val got = TextStats.wordpieceCounts(docs, col("doc_id"), col("text"),
        vocab = Seq("it", "'s", "o'k", "a\\b"), maxPieceLen = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    // it's -> [it]['s] (2 pieces), o'k -> [o'k] (1), a\b -> [a\b] (1); 0 unk
    assert(got == ((3L, 4L, 0L)), s"quote/backslash vocab mis-tokenized: $got")
  }
}
