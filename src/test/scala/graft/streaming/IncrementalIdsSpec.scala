package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stable dense id minting: assigned ids never move, new keys continue
  * densely, refolds are no-ops, and a fresh reader sees the mapping. */
class IncrementalIdsSpec extends SparkSpec {

  private def snap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("ids are dense, lexicographic within a fold, and FROZEN across folds") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_ids").toString + "/store"
    val first = snap(IncrementalIds.mergeBatch(
      Seq("banana", "apple", "cherry").toDF("k"), store, col("k")))
    assert(first == Map("apple" -> 0L, "banana" -> 1L, "cherry" -> 2L))
    // overlap re-presents apple/cherry: their ids must not move; the two
    // new keys continue densely in lexicographic order
    val second = snap(IncrementalIds.mergeBatch(
      Seq("cherry", "date", "apple", "blueberry").toDF("k"), store, col("k")))
    assert(second == first ++ Map("blueberry" -> 3L, "date" -> 4L))
  }

  test("refolding an already-folded batch writes nothing") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_ids_rf").toString + "/store"
    val b = Seq("x", "y").toDF("k")
    val first = snap(IncrementalIds.mergeBatch(b, store, col("k")))
    val rows0 = KeyedStore.read(s, store).get
      .select(col("key"), col("id"), col("ver")).collect().map(_.toSeq).toSet
    val again = snap(IncrementalIds.mergeBatch(b, store, col("k")))
    val rows1 = KeyedStore.read(s, store).get
      .select(col("key"), col("id"), col("ver")).collect().map(_.toSeq).toSet
    assert(again == first && rows1 == rows0)
  }

  test("restart: a fresh reader sees the mapping; nulls never mint") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_ids_rs").toString + "/store"
    val folded = snap(IncrementalIds.mergeBatch(
      Seq(Some("a"), None, Some("b")).toDF("k"), store, col("k")))
    assert(folded == Map("a" -> 0L, "b" -> 1L))
    assert(snap(IncrementalIds.readIds(s, store)) == folded)
  }
}
