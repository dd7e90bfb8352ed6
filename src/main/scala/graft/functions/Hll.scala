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
      // Canonical NEVER-MUTATED empty buffer. Spark's sort-based typed
      // aggregation calls zero() ONCE per operator and re-points every
      // group's buffer at that one instance, so an aggregator that mutates
      // the buffer in place would accumulate state ACROSS GROUPS (group N's
      // estimate includes groups 1..N−1 — observed, not hypothetical).
      // zero therefore returns this sentinel, and reduce/merge copy on
      // first touch (`eq` check): one extra M-byte copy per group, after
      // which the owned buffer mutates freely.
      private val Empty = new Array[Byte](M)
      override def zero: Array[Byte] = Empty
      private def owned(buf: Array[Byte]): Array[Byte] =
        if (buf eq Empty) new Array[Byte](M) else buf

      override def reduce(buf0: Array[Byte], in: String): Array[Byte] = {
        val buf = owned(buf0)
        if (in != null) {
          val h = hash64(in)
          val idx = (h >>> (64 - P)).toInt
          val rank = (java.lang.Long.numberOfLeadingZeros(h << P | (1L << (P - 1))) + 1)
            .toByte
          if (rank > buf(idx)) buf(idx) = rank
        }
        buf
      }

      override def merge(a0: Array[Byte], b: Array[Byte]): Array[Byte] = {
        val a = owned(a0)
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
