package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed HyperLogLog distinct-count sketch (SURVEY.md §4(b): register-based
  * HLL as an `Aggregator[IN, BUF, OUT]`).
  *
  * Standard HLL with 2^p byte registers over xxhash64-style 64-bit hashes
  * (here: `scala.util.hashing.MurmurHash3` over the string bytes widened to
  * 64 bits deterministically). The buffer is a plain byte array: partial
  * aggregation merges by register max, so the sketch is shuffle-friendly and
  * mergeable across partitions/windows — the property that makes it usable
  * at 100 TB where exact distinct must shuffle every key.
  *
  * Spark's built-in `approx_count_distinct` is the production choice; this
  * implementation exists to cover the custom-typed-aggregate surface and is
  * asserted within tolerance of exact counts in HllSpec.
  */
object Hll {

  final val P = 11                 // 2048 registers, rel. error ≈ 1.04/√2048 ≈ 2.3%
  private val M = 1 << P

  private def hash64(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c).toLong
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b).toLong
    (h1 << 32) | (h2 & 0xffffffffL)
  }

  val stringDistinct: Aggregator[String, Array[Byte], Long] =
    new Aggregator[String, Array[Byte], Long] {
      override def zero: Array[Byte] = new Array[Byte](M)

      override def reduce(buf: Array[Byte], in: String): Array[Byte] = {
        if (in != null) {
          val h = hash64(in)
          val idx = (h >>> (64 - P)).toInt
          val rank = (java.lang.Long.numberOfLeadingZeros(h << P | (1L << (P - 1))) + 1)
            .toByte
          if (rank > buf(idx)) buf(idx) = rank
        }
        buf
      }

      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        var i = 0
        while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
        a
      }

      override def finish(buf: Array[Byte]): Long = {
        val alpha = 0.7213 / (1.0 + 1.079 / M)
        var sum = 0.0
        var zeros = 0
        var i = 0
        while (i < M) {
          sum += 1.0 / (1L << buf(i))
          if (buf(i) == 0) zeros += 1
          i += 1
        }
        val raw = alpha * M * M / sum
        val est =
          if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // small-range
          else raw
        math.round(est)
      }

      override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
