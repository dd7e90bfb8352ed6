package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Misra-Gries heavy-hitter summary — the DETERMINISTIC-guarantee
  * member of the sketch suite ([[Hll]] cardinality, [[CountMin]] frequency,
  * approx_percentile quantiles): at most `K` counters; every key with true
  * frequency > n/(K+1) is guaranteed present, and every reported count
  * undercounts its true frequency by at most n/(K+1). Unlike count-min
  * there are no hash collisions and no probability — the bound always
  * holds, under ANY partitioning and merge order (the mergeable-summaries
  * result of Agarwal et al., PODS'12).
  *
  * `reduce` is the classic decrement step; `merge` adds counterpart counts
  * then subtracts the (K+1)-th largest count from every survivor — the
  * merge that preserves the error bound. The buffer is a bounded map
  * (≤ K entries), so a 100 TB scan reduces to K counters per partition
  * with no key shuffle.
  */
object MisraGries {

  final val K = 16

  val stringHeavyHitters: Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      override def zero: Map[String, Long] = Map.empty

      override def reduce(buf: Map[String, Long], in: String): Map[String, Long] =
        if (in == null) buf
        else buf.get(in) match {
          case Some(c) => buf.updated(in, c + 1)
          case None if buf.size < K => buf.updated(in, 1L)
          case None => // decrement all, drop zeros — the Misra-Gries step
            buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        }

      override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val sum = b.foldLeft(a) { case (m, (k, v)) =>
          m.updated(k, m.getOrElse(k, 0L) + v)
        }
        if (sum.size <= K) sum
        else {
          // subtract the (K+1)-th largest count from everyone, keep positives
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(K)
          sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
        }
      }

      override def finish(buf: Map[String, Long]): Map[String, Long] = buf

      override def bufferEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoderHelper.stringLongMap
      override def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoderHelper.stringLongMap
    }
}
