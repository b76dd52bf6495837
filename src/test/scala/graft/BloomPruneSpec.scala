package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomPrune

/** BloomPrune must never produce false NEGATIVES — in particular not
  * through xxhash64's type sensitivity when build and probe keys have
  * different integral widths (ADVICE r8: an INT build key probed by a
  * BIGINT column hashed differently and silently dropped every true
  * match before the canonical-type cast).
  */
class BloomPruneSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("INT build keys vs BIGINT probe keys: every true match survives") {
    val dim = Seq(1, 2, 3, 500).toDF("k")
      .select(col("k").cast("int").as("k")) // INT on the build side
    val model = BloomPrune.bloomBinary(dim, col("k"), 4)
    assert(model.castTo == org.apache.spark.sql.types.LongType)
    val fact = Seq(1L, 2L, 3L, 500L, 999L).toDF("k") // BIGINT probes
    val kept = fact.filter(BloomPrune.mightContain(model, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 3L, 500L).subsetOf(kept),
      s"false negative: kept only $kept")
  }

  test("string keys pass through un-cast and still match exactly") {
    val dim = Seq("alpha beta", "gamma").toDF("sh")
    val model = BloomPrune.bloomBinary(dim, col("sh"), 2)
    assert(model.castTo == org.apache.spark.sql.types.StringType)
    val probe = Seq("alpha beta", "delta").toDF("sh")
    val kept = probe.filter(BloomPrune.mightContain(model, col("sh")))
      .collect().map(_.getString(0)).toSet
    assert(kept.contains("alpha beta"))
  }

  test("narrow probe vs wide build the other way (BIGINT build, INT probe)") {
    val dim = Seq(7L, 8L).toDF("k")
    val model = BloomPrune.bloomBinary(dim, col("k"), 2)
    val probe = Seq(7, 9).toDF("k").select(col("k").cast("int").as("k"))
    val kept = probe.filter(BloomPrune.mightContain(model, col("k")))
      .collect().map(_.getInt(0)).toSet
    assert(kept.contains(7))
  }
}
