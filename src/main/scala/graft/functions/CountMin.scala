package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed count-min sketch — fixed-memory frequency estimation over an
  * unbounded key domain (the heavy-hitter / token-frequency companion to the
  * [[Hll]] cardinality sketch): `d` hash rows × `w` long counters; a key's
  * estimate is the MIN of its `d` counters, so estimates never undercount
  * and overcount is bounded by εN (ε ≈ e/w) with probability 1 − e^−d.
  *
  * The buffer is one flat long array. `reduce` is `d` counter increments;
  * `merge` is element-wise addition — commutative and associative on exact
  * integers, so the sketch is bitwise identical under ANY partitioning or
  * merge order (asserted in SketchSpec), and partial aggregation /
  * cross-window rollup are free. That mergeability is what lets a 100 TB
  * scan produce one 128 KiB frequency summary with no key shuffle at all.
  */
object CountMin {

  final val D = 4          // hash rows: error probability e^−4 ≈ 1.8 %
  final val W = 1 << 12    // 4096 counters/row: ε ≈ e/4096 ≈ 0.066 % of N

  private val Seeds = Array(0x9747b28c, 0x85ebca6b, 0xc2b2ae35, 0x27d4eb2f)

  private def idx(s: String, row: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(s, Seeds(row))
    (h & Int.MaxValue) % W
  }

  /** Point estimate for `key` from a finished sketch. */
  def estimate(sketch: Array[Long], key: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = sketch(r * W + idx(key, r))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Element-wise sketch union (counts add) — for cross-window/cross-corpus
    * rollups of already-finished sketches. */
  def add(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, "sketch sizes differ")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  val stringFreq: Aggregator[String, Array[Long], Array[Long]] =
    new Aggregator[String, Array[Long], Array[Long]] {
      // Same copy-on-first-touch protocol as [[Hll.stringDistinct]]: sort-
      // based typed aggregation shares ONE zero() instance across groups, so
      // the sentinel is never mutated and reduce/merge take ownership by
      // copying when handed it.
      private val Empty = new Array[Long](D * W)
      override def zero: Array[Long] = Empty
      private def owned(buf: Array[Long]): Array[Long] =
        if (buf eq Empty) new Array[Long](D * W) else buf

      override def reduce(buf0: Array[Long], in: String): Array[Long] = {
        val buf = owned(buf0)
        if (in != null) {
          var r = 0
          while (r < D) { buf(r * W + idx(in, r)) += 1; r += 1 }
        }
        buf
      }

      override def merge(a0: Array[Long], b: Array[Long]): Array[Long] = {
        val a = owned(a0)
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }

      override def finish(buf: Array[Long]): Array[Long] = buf

      override def bufferEncoder: Encoder[Array[Long]] =
        ExpressionEncoderHelper.longArray
      override def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoderHelper.longArray
    }
}

private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  val stringLongMap: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
}
