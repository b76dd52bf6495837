package graft

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Proves the z-order layout's data-skipping claim with the actual
  * pruning mechanism: parquet footer min/max statistics. A layout
  * sorted on user_id alone gives every file full-width `value` stats
  * (no file can be skipped for a value-band predicate); the z-ordered
  * layout confines each file to a square of the (user, value) grid, so
  * the same band predicate's stats-overlap set is a fraction of the
  * files — and the user-dimension pruning single-column sorting is
  * good at is retained.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.01" // 10k events, 150 users

  private def parquetFiles(dir: String): Seq[File] =
    new File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  /** (min, max) of a long/double column per file, from footer stats
    * only — exactly what a reader's row-group filter sees.
    */
  private def stats(f: File, column: String): (Double, Double) = {
    val rd = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
    try {
      val perBlock = rd.getFooter.getBlocks.asScala.map { b =>
        val s = b.getColumns.asScala
          .find(_.getPath.toDotString == column).get.getStatistics
        (s.genericGetMin, s.genericGetMax) match {
          case (mn: java.lang.Long, mx: java.lang.Long) =>
            (mn.toDouble, mx.toDouble)
          case (mn: java.lang.Double, mx: java.lang.Double) =>
            (mn.toDouble, mx.toDouble)
          case other => fail(s"unexpected stats types: $other")
        }
      }
      (perBlock.map(_._1).min, perBlock.map(_._2).max)
    } finally rd.close()
  }

  private def overlapping(dir: String, column: String,
      lo: Double, hi: Double): Int =
    parquetFiles(dir).count { f =>
      val (mn, mx) = stats(f, column)
      mn <= hi && mx >= lo
    }

  test("z-order prunes on BOTH dimensions; single-sort only on its own") {
    val events = Tables.events(spark, sfDir).drop("ts") // nanos quirk irrelevant
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toFile
    val zDir = new File(tmp, "z").getAbsolutePath
    val linDir = new File(tmp, "lin").getAbsolutePath
    val nFiles = 16
    Sources.writeZOrdered(events, col("user_id"),
      floor(col("value") / 8).cast("long"), zDir, nFiles)
    Sources.writeGlobalSorted(events, "user_id", linDir, nFiles)
    assert(parquetFiles(zDir).size == nFiles)
    assert(parquetFiles(linDir).size == nFiles)

    // Value-band predicate (value in [200, 232) — a ~6% slice of the
    // 0..490 span): user-sorted files all span the full value range, so
    // stats prune nothing; z-ordered files cover value squares, so only
    // the files whose square touches the band survive.
    val linValue = overlapping(linDir, "value", 200, 231.99)
    val zValue = overlapping(zDir, "value", 200, 231.99)
    assert(linValue == nFiles,
      s"user-sorted layout should be unprunable on value, got $linValue")
    assert(zValue <= nFiles / 2,
      s"z-order should confine a value band to a corner, got $zValue/$nFiles")

    // User-band predicate (users 40..49 of 0..149): both layouts prune;
    // z-order keeps this ability (coarser — roughly the square root of
    // the single-sort's precision, the documented z-order trade).
    val linUser = overlapping(linDir, "user_id", 40, 49)
    val zUser = overlapping(zDir, "user_id", 40, 49)
    assert(linUser <= 3, s"single-sort should prune users hard, got $linUser")
    assert(zUser <= nFiles / 2,
      s"z-order should still prune on user, got $zUser/$nFiles")

    // layouts are rewrites: same rows
    assert(spark.read.parquet(zDir).count() == events.count())
    assert(spark.read.parquet(linDir).count() == events.count())
  }

  test("zorder cells: tie-broken order is deterministic in the 9-bit " +
      "collision regime (>512 users)") {
    import spark.implicits._
    // 1200 users > 512: morton2 keeps 9 bits per key, so users u,
    // u+512 and u+1024 (same vbucket) share a zcell — the truncation
    // collision regime the sf0.01 fixture (150 users) never enters.
    // The raw-key tie-break must make the LIMIT-100 cut exact anyway.
    val rows = (0 until 1200).flatMap { u =>
      val copies = if (u % 3 == 0) 2 else 1
      Seq.fill(copies)((u.toLong, (u % 4) * 8.0 + 1.0))
    }
    val got = graft.operators.ScaleOps
      .zorderCellsFrom(rows.toDF("user_id", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    // independent driver-side morton + total order
    def spread(x: Long, off: Int): Long =
      (0 until 9).map(i => ((x >> i) & 1L) << (2 * i + off)).reduce(_ | _)
    val expected = rows.groupBy(identity).toSeq.map { case ((u, v), g) =>
      val vb = math.floor(v / 8).toLong
      (spread(u, 0) | spread(vb, 1), u, vb, g.size.toLong)
    }.sortBy(t => (t._1, t._2, t._3)).take(100)

    assert(got == expected)
    // the cut must actually exercise collisions: distinct users mapping
    // to one zcell inside the top 100
    assert(got.groupBy(_._1).values.exists(_.map(_._2).distinct.size > 1),
      "top-100 contains no zcell collisions — fixture regression")
  }
}
