package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null / empty-input robustness: the synthetic fixtures contain no
  * nulls, so these exercise the operator functions on adversarial
  * inline data — null text, empty strings, empty tables, unicode.
  */
class NullEdgeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("tokenizer: null text yields no tokens, empty text yields no tokens") {
    val docs = Seq((1L, null: String), (2L, ""), (3L, "  "), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = docs.select($"doc_id", explode(operators.TextQueries.tokens($"text")).as("w"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((4L, "a"), (4L, "b")))
  }

  test("wordcount-style aggregation over an empty table returns zero rows") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val counts = empty
      .select(explode(operators.TextQueries.tokens($"text")).as("w"))
      .groupBy("w").count()
    assert(counts.count() == 0)
  }

  test("unicode text: tokenizer drops non-latin letters like the [^a-z] contract says") {
    val docs = Seq((1L, "héllo wörld 你好 abc")).toDF("doc_id", "text")
    val words = docs.select(explode(operators.TextQueries.tokens($"text")).as("w"))
      .as[String].collect().toSet
    // [^a-z]+ splits ON every non-ascii-lowercase char: accents/CJK are separators
    assert(words == Set("h", "llo", "w", "rld", "abc"))
  }

  test("joins with null keys: null never matches (SQL semantics)") {
    val l = Seq((Some(1L), "a"), (None, "b")).toDF("k", "lv")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("k2", "rv")
    assert(l.join(r, $"k" === $"k2").count() == 1)
    assert(l.join(r, $"k" === $"k2", "left_anti").count() == 1)
  }

  test("dot product on empty arrays is 0; mismatched dimensions error") {
    val ok = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
      .select(functions.VectorFunctions.vecDot($"a", $"b").as("d"))
      .as[Double].collect()
    assert(ok(0) == 0.0) // empty → empty sum
    // DuckDB's list_dot_product errors on length mismatch; vec_dot must
    // too, or an upstream dimension bug becomes a silent wrong answer
    val bad = Seq((Array(1.0, 2.0), Array(3.0))).toDF("a", "b")
      .select(functions.VectorFunctions.vecDot($"a", $"b").as("d"))
    val e = intercept[Exception] { bad.collect() }
    def hasDimMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("dimensions differ")) ||
        hasDimMsg(t.getCause))
    assert(hasDimMsg(e))
  }

  test("null vector → null dot product (null-intolerant column semantics)") {
    val df = Seq((Some(Array(1.0)), None: Option[Array[Double]])).toDF("a", "b")
    val out = df.select(functions.VectorFunctions.vecDot($"a", $"b").as("d")).head()
    assert(out.isNullAt(0))
  }

  test("salted count on empty input returns zero rows") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(operators.ScaleOps.saltedCount(empty, "k").count() == 0)
  }

  test("pagerank on an empty edge set returns zero rows, no division crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(operators.GraphOps.pageRank(empty, iters = 3).count() == 0)
  }

  test("heavy hitters on an empty corpus returns zero rows, no degenerate isin") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(operators.AnalyticsQueries.heavyHittersFrom(spark, empty).count() == 0)
  }

  test("boilerplate on docs too short to shingle returns zero rows") {
    val tiny = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    assert(operators.AnalyticsQueries.boilerplateFrom(tiny, dfMin = 3).count() == 0)
  }

  test("lm score: null text docs drop out, scored docs unaffected") {
    val docs = Seq((1L, "en", null: String), (2L, "en", "aa aa bb"))
      .toDF("doc_id", "lang", "text")
    val out = operators.AdvancedTextQueries.lmScoreFrom(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L))
    assert(out.head.getLong(2) == 3L)
  }
}
