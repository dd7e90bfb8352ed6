package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** BPE merge training vs an independent plain-Scala reference (explicit
  * greedy left-to-right rescan, no fold/packing tricks), plus the boundary
  * contracts: overlap counting, run alternation, tie-breaking, early stop. */
class BpeSpec extends SparkSpec {

  /** Direct transcription of the documented rule. */
  private def refBpe(words: Seq[(String, Long)], merges: Int): Seq[(Int, String, String, String, Long)] = {
    var cur: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var ix = 1
    var stop = false
    while (ix <= merges && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((s, c) <- cur; j <- 0 until s.length - 1) pc((s(j), s(j + 1))) += c
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((ix, l, r, l + r, c))
        cur = cur.map { case (s, c) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j + 1 < s.length && s(j) == l && s(j + 1) == r) { b += l + r; j += 2 }
            else { b += s(j); j += 1 }
          }
          (b.result(), c)
        }
        ix += 1
      }
    }
    out.toSeq
  }

  private def run(texts: Seq[String], merges: Int): Seq[(Int, String, String, String, Long)] = {
    val s = spark
    import s.implicits._
    TextStats.bpeTrain(texts.toDF("text"), col("text"), merges)
      .orderBy("merge_ix").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
  }

  private def refFromTexts(texts: Seq[String], merges: Int) = {
    val wc = texts.flatMap(t => Option(t).toSeq.flatMap(_.toLowerCase.split(" ", -1)))
      .filter(w => w.nonEmpty && w.length <= 64)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }.toSeq
    refBpe(wc, merges)
  }

  test("trainer equals the reference on a random multi-frequency corpus") {
    val rnd = new scala.util.Random(7)
    val vocabWords = Seq("banana", "bandana", "analysis", "nanna", "abba",
      "cabbage", "baggage", "aaaa", "aaab", "the", "of")
    val texts = (1 to 120).map { _ =>
      Array.fill(3 + rnd.nextInt(8))(vocabWords(rnd.nextInt(vocabWords.size)))
        .mkString(" ")
    }
    val got = run(texts, 12)
    val want = refFromTexts(texts, 12)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got.size == 12)
  }

  test("overlap counting and run alternation: aaaa counts (a,a) thrice, merges twice") {
    val got = run(Seq("aaaa"), 1)
    // pairs of "aaaa": (a,a) at 3 positions -> count 3; greedy merge gives
    // [aa, aa] (alternating positions 1 and 3)
    assert(got == Seq((1, "a", "a", "aa", 3L)), s"$got")
    val got2 = run(Seq("aaaa"), 2)
    // round 2: [aa, aa] -> pair (aa, aa) count 1
    assert(got2(1) == ((2, "aa", "aa", "aaaa", 1L)), s"${got2(1)}")
  }

  test("ties break on (lhs, rhs) ascending and training stops when pairs run dry") {
    // "ba" and "ab" both count 1; tie -> (a,b) wins lexicographically
    val got = run(Seq("ba ab"), 10)
    assert(got.head == ((1, "a", "b", "ab", 1L)), s"${got.head}")
    // after 2 merges every word is a single symbol: training stops at 2 rows
    assert(got.size == 2, s"$got")
    assert(got == refFromTexts(Seq("ba ab"), 10))
  }

  test("word frequency weights the pair counts") {
    // "xy" appears 5 times, "zq" once: (x,y) must win despite equal
    // per-word structure
    val got = run(Seq("xy xy xy", "xy xy zq"), 1)
    assert(got == Seq((1, "x", "y", "xy", 5L)), s"$got")
  }

  /** Sequential replay of learned merges, the documented apply rule. */
  private def refSegments(w: String, merges: Seq[(String, String)]): Vector[String] = {
    var s = w.map(_.toString).toVector
    for ((l, r) <- merges) {
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) { b += l + r; j += 2 }
        else { b += s(j); j += 1 }
      }
      s = b.result()
    }
    s
  }

  private def refApply(w: String, merges: Seq[(String, String)]): Long =
    refSegments(w, merges).length.toLong

  test("apply replays trained merges: per-doc piece counts match the reference") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val vocabWords = Seq("banana", "bandana", "analysis", "nanna", "abba",
      "cabbage", "baggage", "aaaa", "the", "of")
    val texts = (1 to 60).map { i =>
      i.toLong -> Array.fill(2 + rnd.nextInt(6))(
        vocabWords(rnd.nextInt(vocabWords.size))).mkString(" ")
    }
    val df = texts.toDF("doc_id", "text")
    val merges = TextStats.bpeTrain(df, col("text"), 10)
      .orderBy("merge_ix").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextStats.bpeApply(df, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = texts.map { case (id, t) =>
      val ws = t.toLowerCase.split(" ", -1).filter(w => w.nonEmpty && w.length <= 64)
      id -> ((ws.length.toLong, ws.map(refApply(_, merges)).sum))
    }.toMap
    assert(got == want)
    // training compresses: total pieces strictly under total characters
    val chars = texts.map(_._2.count(_ != ' ').toLong).sum
    assert(got.values.map(_._2).sum < chars)
  }

  test("vocabulary equals the reference's surviving symbol counts") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val vocabWords = Seq("banana", "bandana", "analysis", "abba", "cabbage", "the")
    val texts = (1 to 50).map(_ =>
      Array.fill(2 + rnd.nextInt(5))(vocabWords(rnd.nextInt(vocabWords.size)))
        .mkString(" "))
    val df = texts.toDF("text")
    val merges = refFromTexts(texts, 8).map(m => (m._2, m._3))
    val got = TextStats.bpeVocab(df, col("text"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = texts.flatMap(_.toLowerCase.split(" ", -1))
      .filter(w => w.nonEmpty && w.length <= 64)
      .flatMap(w => refSegments(w, merges))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    assert(got == want)
    // merged pieces made it into the vocabulary
    assert(got.keys.exists(_.length > 1))
  }

  test("trainer matches the reference on the fixture corpus") {
    val docs = Envelopes.table(spark, sfDir(), "documents")
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val got = {
      val d = docs
      TextStats.bpeTrain(d, col("text"), 8)
        .orderBy("merge_ix").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
    }
    assert(got == refFromTexts(texts, 8), s"$got")
  }
}
