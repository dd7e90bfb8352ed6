package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CJK-capable tokenizer: whitespace tokens for latin text, overlapping
  * character bigrams for Han runs (the Lucene-CJK-style fallback standing in
  * for the reference's reserved ikanalyzer). */
class TokenizeSpec extends SparkSpec {

  private def toks(s: String): Seq[String] = {
    val sp = spark
    import sp.implicits._
    Seq(s).toDF("t").select(Windows.tokenize(col("t")).as("ks"))
      .collect().head.getSeq[String](0)
  }

  test("pure latin text tokenizes on whitespace, lowercased, empties dropped") {
    assert(toks("Big  Data engine") == Seq("big", "data", "engine"))
    assert(toks("") == Seq.empty)
  }

  test("a Han run becomes overlapping bigrams") {
    assert(toks("大数据") == Seq("大数", "数据"))
    assert(toks("大数据引擎") == Seq("大数", "数据", "据引", "引擎"))
  }

  test("mixed script splits runs; single hanzi stays a unigram") {
    assert(toks("spark大数据engine") == Seq("spark", "大数", "数据", "engine"))
    assert(toks("查 spark") == Seq("查", "spark"))
  }
}
