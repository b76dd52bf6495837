package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY.md §5.3): algebraic laws that must hold
  * for arbitrary inputs, run through the real Spark operators on
  * generated mini-DataFrames. (The scalatest↔scalacheck bridge artifact
  * isn't in the offline cache, so generators are sampled with a fixed
  * seed by a small local driver — same coverage, reproducible runs.)
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Deterministically sample `gen` n times and run the property. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 10)(prop: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => prop(a); produced += 1
        case None =>
      }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator produced only $produced/$n samples")
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.nonEmpty)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  test("wordcount total equals token count for arbitrary corpora") {
    forAllSamples(Gen.nonEmptyListOf(text)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val counts = docs
        .select(explode(operators.TextQueries.tokens($"text")).as("w"))
        .groupBy("w").count()
      val total = counts.agg(coalesce(sum($"count"), lit(0L))).as[Long].head()
      val tokens = texts.map(_.split("[^a-z]+").count(_.nonEmpty).toLong).sum
      assert(total == tokens)
    }
  }

  test("codegen vec_dot equals the interpreted fold and is symmetric") {
    val vec = Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0))
    forAllSamples(Gen.zip(vec, vec)) { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val Row = df.select(
        functions.VectorFunctions.vecDot($"a", $"b").as("fast"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, x) => s + x).as("fold"),
        functions.VectorFunctions.vecDot($"b", $"a").as("swapped")).head()
      assert(Row.getDouble(0) == Row.getDouble(1)) // bit-identical, not approx
      assert(Row.getDouble(0) == Row.getDouble(2))
    }
  }

  test("codegen sorted_overlap equals size(array_intersect) and is symmetric") {
    val words = Gen.listOf(Gen.oneOf(
      "aa", "ab", "ba", "bb", "ca", "cb", "da", "db", "ea", "eb"))
    forAllSamples(Gen.zip(words, words), 20) { case (xs, ys) =>
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val row = df.select(
        functions.SetFunctions.sortedOverlap($"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).cast("long").as("builtin"),
        functions.SetFunctions.sortedOverlap($"b", $"a").as("swapped")).head()
      assert(row.getLong(0) == row.getLong(1))
      assert(row.getLong(0) == row.getLong(2))
      assert(row.getLong(0) == (a.toSet & b.toSet).size.toLong)
    }
  }

  test("CountOccurrences aggregator: merge is associative and matches size") {
    forAllSamples(Gen.listOf(Gen.oneOf("a", "b", "c")), 20) { xs =>
      val agg = functions.CountOccurrences
      val total = xs.foldLeft(agg.zero)(agg.reduce)
      assert(total == xs.size)
      val (l, r) = xs.splitAt(xs.size / 2)
      assert(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)) == total)
    }
  }

  test("set algebra on generated keys: union = intersect ∪ both-excepts") {
    forAllSamples(Gen.zip(Gen.listOf(Gen.chooseNum(0, 20)), Gen.listOf(Gen.chooseNum(0, 20)))) { case (xs, ys) =>
      val a = xs.toDF("k").distinct()
      val b = ys.toDF("k").distinct()
      val viaOps = a.intersect(b).unionAll(a.except(b)).unionAll(b.except(a))
        .as[Int].collect().toSet
      assert(viaOps == (xs.toSet | ys.toSet))
    }
  }

  test("as-of: union-merge form equals join-then-prune form on random histories") {
    import graft.operators.AsofJoin
    // random (key, time) left rows and right rows with duplicate times
    // to exercise the tie-break; keys overlap only partially
    val row = Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 100L))
    val gen = Gen.zip(Gen.nonEmptyListOf(row), Gen.nonEmptyListOf(row))
    forAllSamples(gen, 8) { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }.toDF("lk", "lt", "lid")
      val right = rs.zipWithIndex
        .map { case ((k, t), i) => (k + 2, t, i.toLong) }.toDF("rk", "rt", "rid")
      val viaJoin = AsofJoin.asofBackward(left, right,
          "lk", "rk", "lt", "rt", "lid", "rid")
        .select($"lid", $"rid", $"rt").as[(Long, Long, Long)].collect().toSet
      val viaUnion = AsofJoin.asofBackwardUnion(left, right,
          "lk", "rk", "lt", "rt", "lid", "rid")
        .select($"lid", $"rid", $"rt").as[(Long, Long, Long)].collect().toSet
      assert(viaUnion == viaJoin)
    }
  }

  test("chunking: conservation and reassembly hold for arbitrary corpora") {
    import graft.operators.TextQueries
    forAllSamples(Gen.nonEmptyListOf(text), 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = TextQueries.chunkTokensStrided(docs, 4, 4)
      val expectedTokens = texts.map(_.split("[^a-z]+").count(_.nonEmpty).toLong).sum
      val got = chunks.agg(coalesce(sum($"n_tokens"), lit(0L))).as[Long].head()
      assert(got == expectedTokens)
      // rebuild every doc from its chunks and compare to its token join
      val rebuilt = chunks.groupBy("doc_id")
        .agg(array_join(
          transform(sort_array(collect_list(struct($"chunk_id", $"chunk_text"))),
            s => s.getField("chunk_text")), " ").as("rebuilt"))
        .as[(Long, String)].collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split("[^a-z]+").filter(_.nonEmpty)
        if (toks.nonEmpty) assert(rebuilt(i.toLong) == toks.mkString(" "))
        else assert(!rebuilt.contains(i.toLong))
      }
    }
  }

  test("session windows: total session count between 1 and n for any gap layout") {
    val gaps = Gen.nonEmptyListOf(Gen.chooseNum(1L, 7200L)) // seconds between events
    forAllSamples(gaps) { deltas =>
      val times = deltas.scanLeft(0L)(_ + _)
      val events = times.zipWithIndex
        .map { case (t, i) => (1L, i.toLong, new java.sql.Timestamp(t * 1000)) }
        .toDF("user_id", "event_id", "ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy($"ts", $"event_id")
      val sessions = events
        .withColumn("prev", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("newS",
          when($"prev".isNull || unix_micros($"ts") - $"prev" > 1800L * 1000000L, 1)
            .otherwise(0))
        .agg(sum($"newS")).as[Long].head()
      val expected = 1 + deltas.count(_ > 1800L)
      assert(sessions == expected)
    }
  }
}
