package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert

/** MERGE semantics: update wins, insert lands, tombstone deletes,
  * untouched rows carry over — and snapshots publish to a NEW directory
  * (never in place).
  */
class UpsertSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("mergeFrames: update/insert/delete/carry-over semantics per key") {
    val target = Seq(
      (1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0), (4L, "four", 40.0))
      .toDF("id", "name", "score")
    val batch = Seq(
      (2L, "TWO", 22.0, false), // update
      (5L, "five", 50.0, false), // insert
      (3L, "x", 0.0, true)) // delete
      .toDF("id", "name", "score", "_deleted")
    val out = Upsert.mergeFrames(target, batch, "id")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "one", 10.0), (2L, "TWO", 22.0), (4L, "four", 40.0), (5L, "five", 50.0)))
    assert(Upsert.mergeFrames(target, batch, "id").columns.toSeq ==
      target.columns.toSeq, "output schema must equal the target's")
  }

  test("merge without _deleted column is a pure upsert") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val batch = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val out = Upsert.mergeFrames(target, batch, "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("merge fails fast on a duplicate batch key instead of duplicating the snapshot row") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val dupBatch = Seq((2L, "B1"), (2L, "B2"), (3L, "c")).toDF("id", "v")
    val e = intercept[Exception] {
      Upsert.mergeFrames(target, dupBatch, "id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate key in merge batch")),
      s"unexpected failure: $e")
    // a clean batch still merges
    val out = Upsert.mergeFrames(target, Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("merge publishes the next snapshot; the current one is untouched") {
    val v1 = Files.createTempDirectory("upsert_v1_").toString
    val v2 = Files.createTempDirectory("upsert_v2_").toString
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").write.mode("overwrite").parquet(v1)
    val batch = Seq((2L, 20.0)).toDF("id", "v")
    Upsert.merge(spark.read.parquet(v1), batch, "id", v2)
    // next snapshot has the update; the current snapshot still serves v1
    assert(spark.read.parquet(v2).filter($"id" === 2L)
      .select("v").as[Double].head() == 20.0)
    assert(spark.read.parquet(v1).filter($"id" === 2L)
      .select("v").as[Double].head() == 2.0)
    // chaining: a second batch against v2 sees the first batch's result
    val v3 = Files.createTempDirectory("upsert_v3_").toString
    Upsert.merge(spark.read.parquet(v2),
      Seq((1L, 0.0)).toDF("id", "v").withColumn("_deleted", lit(true)),
      "id", v3)
    assert(spark.read.parquet(v3).orderBy("id")
      .as[(Long, Double)].collect().toSeq == Seq((2L, 20.0)))
  }
}
