package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.sources.Sources

/** Drop-in migration surface for the reference's user API. A reference
  * job is (Map plugin, Reduce plugin, input files, nReduce) →
  * `mr-out-<R>` text files (`/root/reference/main/mrworker.go:35-52`
  * loads the plugins; `mr/worker.go:111-123` feeds Map whole files;
  * `mr/worker.go:190-207` writes sorted `"key value"` lines). `run`
  * takes the SAME two function signatures and produces the SAME output
  * contract, executed as one Spark job:
  *
  *   map side    → whole-file read + typed flatMap (one task per file,
  *                 like the reference's map tasks)
  *   shuffle     → hash exchange on key (Tungsten binary, compressed —
  *                 replacing the reference's uncompressed NDJSON files)
  *   reduce side → groupByKey + mapGroups (values iterator per key,
  *                 exactly the `reducef(key, values)` contract)
  *   sink        → nReduce hash-sharded files, keys sorted within each
  *                 shard (the reference's output invariant)
  *
  * Fault tolerance, the map/reduce barrier, and straggler re-execution
  * come from Spark's scheduler instead of the reference's 10-second
  * timeout loop (`mr/coordinator.go:63-87`) — and without its
  * duplicate-read/torn-write retry bugs (SURVEY.md §2.1).
  *
  * Scale caveat, by design: `reducef` sees all values of one key on one
  * executor (the reference's exact semantics, `mr/worker.go:194-204`).
  * For associative reduces at 100 TB prefer `runAggregated`, which
  * map-side-combines through a typed Aggregator instead.
  */
object MapReduceCompat {

  type KeyValue = (String, String)
  type MapF = (String, String) => Seq[KeyValue] // (filename, contents)
  type ReduceF = (String, Seq[String]) => String // (key, values)

  /** Run a reference-style job. Output: `outDir/part-*` text files,
    * `"<key> <value>"` lines, nReduce shards, sorted within shard.
    */
  def run(spark: SparkSession, mapf: MapF, reducef: ReduceF,
      inputGlob: String, nReduce: Int, outDir: String): Unit = {
    val reduced = transform(spark, mapf, reducef, inputGlob)
    Sources.writeKvText(reduced.toDF("key", "value"), "key", "value", outDir, nReduce)
  }

  /** The reference hands Map the bare CLI filename
    * (`mr/worker.go:111-123` passes os.Args verbatim), not a URI;
    * wholeTextCorpus yields `file:///...` paths. Strip to the basename
    * so plugins that embed the name (indexer) emit the reference's
    * exact values.
    */
  private def basename(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** The dataflow without the sink — one row per (key, reduced value). */
  def transform(spark: SparkSession, mapf: MapF, reducef: ReduceF,
      inputGlob: String): Dataset[KeyValue] = {
    import spark.implicits._
    Sources.wholeTextCorpus(spark, inputGlob)
      .as[(String, String)]
      .flatMap { case (path, contents) => mapf(basename(path), contents) }
      .groupByKey(_._1)
      .mapGroups { (key, kvs) => (key, reducef(key, kvs.map(_._2).toSeq)) }
  }

  /** Associative/commutative variant: the user supplies a fold instead
    * of a whole-group function, enabling map-side partial aggregation
    * (the combiner the reference lacks) — the form to use at 100 TB.
    */
  def transformAggregated[B: Encoder](
      spark: SparkSession, mapf: MapF,
      zeroValue: B, foldF: (B, String) => B, mergeF: (B, B) => B,
      finishF: B => String,
      inputGlob: String): Dataset[KeyValue] = {
    import spark.implicits._
    val agg = new Aggregator[KeyValue, B, String] {
      def zero: B = zeroValue
      def reduce(b: B, a: KeyValue): B = foldF(b, a._2)
      def merge(b1: B, b2: B): B = mergeF(b1, b2)
      def finish(b: B): String = finishF(b)
      def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }
    Sources.wholeTextCorpus(spark, inputGlob)
      .as[(String, String)]
      .flatMap { case (path, contents) => mapf(basename(path), contents) }
      .groupByKey(_._1)
      .agg(agg.toColumn)
  }

  /** `run` with the combiner path: same sink contract as `run`, but the
    * reduce is a typed Aggregator so partial aggregation happens
    * map-side — the form to use for associative reduces at 100 TB.
    */
  def runAggregated[B: Encoder](
      spark: SparkSession, mapf: MapF,
      zeroValue: B, foldF: (B, String) => B, mergeF: (B, B) => B,
      finishF: B => String,
      inputGlob: String, nReduce: Int, outDir: String): Unit = {
    val reduced = transformAggregated(spark, mapf, zeroValue, foldF, mergeF,
      finishF, inputGlob)
    Sources.writeKvText(reduced.toDF("key", "value"), "key", "value", outDir, nReduce)
  }
}

/** The reference's two shipped applications, ported verbatim at the
  * plugin level: same tokenization, same emission, same reduce.
  */
object ReferenceApps {

  /** wc: `mrapps/wc.go:21-34` — split contents on non-letter runs, emit
    * (word,"1") per occurrence; reduce = count of values.
    */
  val wcMap: MapReduceCompat.MapF = (_, contents) =>
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
      .map(w => (w, "1")).toSeq

  val wcReduce: MapReduceCompat.ReduceF = (_, values) => values.length.toString

  /** indexer: `mrapps/indexer.go:21-40` — emit (word, doc) once per
    * distinct word per doc; reduce = "<n> <sorted,comma-joined docs>".
    */
  val indexerMap: MapReduceCompat.MapF = (path, contents) =>
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
      .toSet[String].map((w: String) => (w, path)).toSeq

  val indexerReduce: MapReduceCompat.ReduceF = (_, values) => {
    val docs = values.distinct.sorted
    s"${docs.length} ${docs.mkString(",")}"
  }
}
