package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Empirical scaling evidence for the heavy operators: run each on a
  * 1x / 4x / 16x corpus and record wall time and output rows to
  * SCALING.md.
  *
  * Text replicas perturb every token with a replica-unique letter
  * suffix, so the token/shingle space is disjoint across replicas and
  * the duplicate rate stays that of the base corpus — the honest way to
  * grow data volume without manufacturing a k^2 near-dup explosion.
  * Event replicas shift users into disjoint id ranges (per-user session
  * structure unchanged). Embedding replicas add deterministic
  * per-element jitter (±0.05), densifying the vector space the way a
  * near-dup corpus does, and the ANN section records recall@5 against
  * the brute-force ground truth on the SAME corpus, next to wall time —
  * the recall/cost trade the LSH/IVF knobs (nFlip, nProbe) buy.
  *
  * Near-linear rows in the scale column = the partitioning strategy
  * holds; superlinear time = a hot spot to fix.
  *
  *   java -cp "target/scala-2.13/classes:<spark jars>" graft.ScaleSmoke
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "SCALING.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")

    def replicated(k: Int): DataFrame =
      (0 until k).map { i =>
        val tag = ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar
        base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "([a-z]+)", s"$$1x$tag").as("text"))
      }.reduce(_ unionAll _)

    // replicated(k) plus the same closing boilerplate on every doc:
    // the perturbed replicas still grow the vocabulary ~31·k, but the
    // appended tokens are SHARED across replicas, so their share of the
    // token stream (≈3/57, ≈2/57, ≈1/57 per doc of ~54 tokens) is
    // scale-invariant — heavy-hitter output stays non-trivial at 16x
    // instead of diluting to zero rows.
    def replicatedHot(k: Int): DataFrame =
      replicated(k).select(col("doc_id"),
        concat(col("text"),
          lit(" corpus corpus corpus quality quality data")).as("text"))

    val baseSrc = Tables.documents(spark, sfDir).select("doc_id", "source", "text")

    // same disjoint-token replication, source kept: each source's
    // shingle set grows linearly, the cross-source structure is preserved
    def replicatedSrc(k: Int): DataFrame =
      (0 until k).map { i =>
        val tag = ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar
        baseSrc.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          col("source"),
          regexp_replace(col("text"), "([a-z]+)", s"$$1x$tag").as("text"))
      }.reduce(_ unionAll _)

    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type", "value")

    def replicatedEvents(k: Int): DataFrame =
      (0 until k).map { i =>
        events.select(
          (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
          (col("user_id") + lit(i.toLong * 10000000L)).as("user_id"),
          col("ts"), col("event_type"), col("value"))
      }.reduce(_ unionAll _)

    val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")

    def replicatedLineitem(k: Int): DataFrame =
      (0 until k).map { i =>
        lineitem.select(
          (col("l_orderkey") + lit(i.toLong * 1000000000L)).as("l_orderkey"),
          col("l_partkey"))
      }.reduce(_ unionAll _)

    // by-name: operators like heavyHittersFrom run a bounded driver
    // action (the MG sketch pass) while BUILDING the plan — the timer
    // must start before plan construction to charge it honestly
    def timeNoop(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Same defense Bench has: a single measured execution is at the
    // mercy of a transiently contended host (observed 5-20x inflation
    // of individual cells from neighbor noise); min-of-N reflects the
    // plan.
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    def timeMin(mk: => DataFrame): Double =
      (1 to reps).map(_ => timeNoop(mk)).min

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "ngram_jaccard_pairs" -> (k => AdvancedTextQueries.ngramJaccardPairs(replicated(k), AdvancedTextQueries.ShingleDfCap)),
      "inverted_index_capped" -> (k => CoreQueries.invertedIndexCapped(replicated(k), CoreQueries.IndexDfCap)),
      "chunk_strided_32_24" -> (k => TextQueries.chunkTokensStrided(replicated(k), 32, 24)),
      "minhash_lsh_candidates" -> (k => MinHashLsh.candidatePairs(replicated(k))),
      "dedup_hamming_pairs" -> (k => AdvancedTextQueries.dedupHammingPairs(replicated(k), 16, 1, AdvancedTextQueries.HammingBucketCap)),
      // per-row mod-p k-gram selection: no per-doc window anywhere, so
      // the only growth surface is the 1/p fingerprint stream; the df
      // cap bounds a hot (boilerplate) fingerprint's pair fan-out
      "dedup_substring" -> (k => AdvancedTextQueries.substringFingerprintPairs(
        replicated(k), AdvancedTextQueries.SubstrK,
        AdvancedTextQueries.SubstrModP, AdvancedTextQueries.SubstrDfCap, 2)),
      // aggregate-before-explode: the wordcount exchange grows with the
      // corpus but the pair explode grows only with the VOCABULARY
      // (replicas add disjoint token spaces, so vocab grows k·|V| here —
      // the worst case; real corpora grow ~corpus^0.5)
      "bpe_pairs" -> (k => AdvancedTextQueries.bpePairsFrom(replicated(k))),
      // distinct (source,shingle) grows with shingle volume, but the
      // self-join fan-out stays bounded by |sources|²/2 per shingle and
      // the output is one row per source pair at any scale
      "source_overlap" -> (k => AdvancedTextQueries.sourceOverlapFrom(
        replicatedSrc(k))),
      "session_windows" -> (k => EventQueries.sessionWindows(replicatedEvents(k))),
      // one window shuffle on user_id; rows = users, so growth tracks
      // the replicated user space exactly
      "funnel" -> (k => BehaviorQueries.funnelFrom(replicatedEvents(k))),
      // bounded C(n,2) explode per order (disjoint order spaces share
      // partkeys, so pair counts scale with k while pair cardinality
      // stays fixed — the worst case for the final aggregation)
      "cooccur_pairs" -> (k => BehaviorQueries.cooccurPairCounts(replicatedLineitem(k))),
      // shingle-df pipeline: one shingle exchange + join-back; a hot
      // shingle is one counter row, so growth must track shingle volume
      "boilerplate_df3" -> (k => AnalyticsQueries.boilerplateFrom(replicated(k), 3)),
      // the baseline the MG sketch replaces: full token shuffle
      "wordcount_full" -> (k => replicated(k)
        .select(explode(TextQueries.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))),
      // MG sketch pass + candidate-only confirm. The replicas make the
      // vocabulary GROW ~31·k (disjoint token spaces) while k=128 state
      // stays fixed — the vocabulary-independence claim measured. The
      // corpus is replicatedHot, not replicated: pure disjoint
      // replication divides every token's share by k, so past 4x
      // nothing cleared 1% and the smoke timed an operator with an
      // empty threshold set (r6 rows 47-49 reported 0 rows). The
      // shared per-doc hot tokens hold a scale-INVARIANT >1% share, so
      // the sketch→confirm→threshold path stays exercised at every
      // scale while the vocabulary still grows with k.
      "heavy_hitters_mg" -> (k => AnalyticsQueries.heavyHittersFrom(spark, replicatedHot(k))),
      // exact vs sketch column profile (see ValidationQueries): the
      // exact form's Expand multiplies agg input rows by (cols+1); the
      // HLL form's curve must track the scan alone
      "profile_exact" -> (k => ValidationQueries.profile(
        replicatedEvents(k), Seq("event_id", "user_id", "ts", "event_type"))),
      "profile_approx" -> (k => ValidationQueries.profileApprox(
        replicatedEvents(k), Seq("event_id", "user_id", "ts", "event_type"))),
      // 10 fixed iterations; disjoint order replicas share partkeys so
      // co-occurrence counts grow with k and the thresholded edge set
      // densifies toward the pair-space ceiling — rounds stay 10, so
      // time must track edge volume, not explode with it
      "pagerank_10" -> (k => AnalyticsQueries.pagerankFrom(replicatedLineitem(k))),
      // 5 fixed mutual-recursion rounds on the DIRECTED order→part
      // bipartite graph; each round is 2 join+aggs over the edge list
      // plus a 1-row normalizer broadcast — time must track edge
      // volume linearly, rounds never grow
      "hits_5" -> (k => GraphOps.hits(
        replicatedLineitem(k).select(col("l_orderkey").as("src"),
          col("l_partkey").as("dst")),
        iters = AnalyticsQueries.HitsIters)._2),
      // 6 fixed peeling rounds; the edge set only shrinks round-over-
      // round, so time tracks the FIRST round's degree agg + semi-joins
      "kcore_6" -> (k => GraphOps.kCore(
        BehaviorQueries.cooccurPairCounts(replicatedLineitem(k))
          .filter(col("n_orders") >= AnalyticsQueries.PagerankMinCooccur)
          .select(col("p1").as("u"), col("p2").as("v")),
        AnalyticsQueries.KcoreK, AnalyticsQueries.KcoreRounds)),
      // two-sample rank-test fold (q_mannwhitney/q_ks_test): the
      // ordered window runs over the distinct-VALUE axis, which
      // disjoint event replication leaves untouched — rows out must
      // stay ~flat while the scan grows with k
      "two_sample_fold" -> (k =>
        StatsQueries.twoSampleValueCountsFrom(replicatedEvents(k))),
      // pair gen + CC + one join + one component window; replicas are
      // disjoint clusters so rounds stay flat and time tracks pair volume
      "dedup_keep_best" -> (k => AdvancedTextQueries.keepBestFrom(replicated(k))),
      // one per-user window; rows = purchases, state one value per row
      "attribution" -> (k => BehaviorQueries.attributionFrom(replicatedEvents(k))),
      // distributed count agg; the single-partition cumsum only ever
      // sees the post-limit vocab rows no matter how the corpus grows
      "vocab_coverage" -> (k => TextQueries.vocabCoverageFrom(replicated(k))),
      // two windows + agg sharing one user_id exchange; replicas are
      // disjoint users so runs (and output rows) grow linearly
      "scd2_history" -> (k => EventQueries.scd2From(replicatedEvents(k))),
      // one lead window + one keyed agg, single exchange; output rows
      // = distinct multi-event users, linear in replicas
      "time_weighted" -> (k => EventQueries.timeWeightedFrom(replicatedEvents(k))),
      // explode + bigram lead + unigram agg off one doc-position
      // exchange; output pinned at 50, time tracks token volume
      "collocations_top50" -> (k => AdvancedTextQueries.collocationsFrom(replicated(k))),
      // distinct (type,user) exchange + two-phase per-type k-smallest;
      // pair math on |types|·k sketch rows — output pinned at pairs
      "overlap_kmv" -> (k => AnalyticsQueries.overlapKmvFrom(replicatedEvents(k))),
      // PPJoin prefix filter: disjoint replicas keep each replica's
      // dup pairs internal, so output pairs AND candidate volume must
      // grow linearly in k — superlinear time here means the prefix
      // pruning stopped working (rarest-first ordering broken)
      // NOTE: runs on the REDUCED 1/2/4 ladder (opScales below). The
      // synthetic corpus shares one 31-word vocabulary, so shingle df
      // grows linearly with corpus size and the prefix-filter candidate
      // set C(df,2) grows QUADRATICALLY — ~150 s at 1x (sf0.1),
      // ~10 min at 4x. The claim under test — disjoint replication
      // keeps the quadratic term per-replica, candidates ~k× — shows
      // at 4x just as well as 16x, without an hour-long smoke.
      "setsim_prefix" -> (k => SetSimJoin.setsimPrefixFrom(replicated(k))),
      // tfidf shape: 5-gram df agg + join-back; replicas keep the base
      // corpus's dup structure so dup_frac distribution is scale-stable
      // while the 5-gram vocabulary grows ~k
      "dup_ngram_frac" -> (k => AdvancedTextQueries.dupNgramFracFrom(replicated(k))),

      // chunk df agg over disjoint-token replicas: chunk vocabulary and
      // the reassembly both grow linearly, no cross-replica matches
      "scrub_common" -> (k => CurationQueries.scrubCommonFrom(replicated(k), 4, 2)),

      // per-source vocab grows linearly while the pair grid stays
      // |sources|² — the KL sums are the linear term that must dominate
      "js_divergence" -> (k => CurationQueries.jsDivergenceFrom(replicatedSrc(k))),
      // (lang × bigram-vocab) model agg + one bigram-stream join; the
      // disjoint replicas are the worst case — model rows grow k·|V²|
      "bigram_lm" -> (k => AdvancedTextQueries.bigramLmFrom(
        replicated(k).withColumn("lang",
          // deterministic 5-way lang spread so the per-lang model path
          // (not one giant lang) is what scales
          concat(lit("l"), pmod(col("doc_id"), lit(5)).cast("string"))))),
      // bounded 28-way explode AFTER the (user, day) distinct collapse:
      // output rows are |days| (constant), work is 28·|user-days| —
      // time must track the collapse, never the raw stream
      "stickiness_28d" -> (k => BehaviorQueries.stickinessFrom(replicatedEvents(k))),
      // char explode folds to the |sources|×|alphabet| grid map-side;
      // rows stay constant while the scanned char volume grows k×
      "char_entropy" -> (k => AdvancedTextQueries.charEntropyFrom(replicatedSrc(k))))

    val sb = new StringBuilder
    sb.append("# Operator scaling smoke (corpus replicated with disjoint token/user spaces)\n\n")
    sb.append(s"Base: `$sfDir` (${base.count()} docs, ${events.count()} events), local[$cpus]. ")
    sb.append("Generated by `graft.ScaleSmoke` — rows should grow ~linearly in scale; ")
    sb.append("time growing much faster than rows marks a hot spot.\n\n")
    sb.append(s"| operator | scale | rows | seconds (min of $reps) |\n|---|---|---|---|\n")
    // warm pass: first execution of each plan pays one-time codegen/JIT
    // that would otherwise inflate the 1x row and distort the curve
    ops.foreach { case (_, fn) => timeNoop(fn(1)) }
    val opScales: Map[String, Seq[Int]] = Map("setsim_prefix" -> Seq(1, 2, 4))
    for ((name, fn) <- ops; k <- opScales.getOrElse(name, Seq(1, 4, 16))) {
      // noop write so the FULL result materializes (a bare count lets
      // Catalyst prune the expensive columns and times a different plan)
      val sec = timeMin(fn(k))
      val rows = fn(k).count()
      val line = f"| $name | ${k}x | $rows | $sec%.1f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }

    // ---- ANN recall/cost: brute force vs LSH (multi-probe) vs IVF ----
    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), SimilarityQueries.asDoubles(col("embedding")).as("vec"))

    def replicatedEmb(k: Int): DataFrame =
      (0 until k).map { i =>
        val jittered =
          if (i == 0) col("vec")
          else transform(col("vec"), (x, j) =>
            x + (pmod(hash(col("vec_id"), lit(i), j), lit(2001)) - lit(1000))
              .cast("double") / 20000.0)
        embBase.select(
          (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
          jittered.as("vec"))
      }.reduce(_ unionAll _)

    sb.append("\n## ANN recall/cost (jittered embedding replicas, ~constant probe count)\n\n")
    sb.append("recall@5 vs the brute-force ground truth on the identical corpus; ")
    sb.append("`probeModulus` scales with the corpus so the probe set stays comparable. ")
    sb.append("LSH numPlanes=4, IVF nLists=16 (both parameterized — see LshKnn/IvfKnn docs ")
    sb.append("for the corpus-size math); quant_int8 = int8 codes + 4x overfetch + exact ")
    sb.append("re-rank (QuantizedKnn — full scan, so its win is bytes not compute: recall ")
    sb.append("loss is pure quantization noise, measured zero here).\n\n")
    sb.append("Reading the recall column: at 1x the base embeddings have weak ")
    sb.append("neighbor structure (top-5 cosines sit barely above the bulk), so ANY ")
    sb.append("bucketed index scores low — that is the data, not the index. The ")
    sb.append("jittered replicas give every vector true near-neighbors, the regime ")
    sb.append("near-dup retrieval actually runs in, and recall climbs with scale ")
    sb.append("while cost per probe stays a fraction of the brute-force scan — the ")
    sb.append("16x row is the one that models a real corpus.\n\n")
    sb.append("| corpus | variant | corpus_rows | n_probes | recall@5 | seconds |\n|---|---|---|---|---|---|\n")
    for (k <- Seq(1, 4, 16)) {
      val mod = 100 * k
      val corpus = replicatedEmb(k).localCheckpoint(true)
      val nRows = corpus.count()
      val exactDf = SimilarityQueries.blockedTopKFrom(corpus, 5, mod)
      val bruteSec = timeMin(exactDf)
      val exact = exactDf.select("probe_id", "vec_id").localCheckpoint(true)
      val nExact = exact.count().toDouble
      val nProbes = corpus.filter(col("vec_id") % mod === 0).count()
      def emit(variant: String, df: DataFrame, sec: Double): Unit = {
        val recall = df.select("probe_id", "vec_id").intersect(exact).count() / nExact
        val line = f"| ${k}x | $variant | $nRows | $nProbes | $recall%.3f | $sec%.1f |"
        println(s"[scale] $line")
        sb.append(line + "\n")
      }
      emit("brute_force", exact, bruteSec)
      // int8 quantized scan + exact re-rank: recall loss here is pure
      // quantization noise (no bucketing), bought with 4x fewer bytes
      // at rest/in shuffle for the scan stage
      val quantDf = QuantizedKnn.approxTopKFrom(corpus, 5, 4, mod)
      emit("quant_int8", quantDf, timeMin(quantDf))
      for (nFlip <- Seq(0, 1, 2)) {
        val df = LshKnn.approxTopKFrom(corpus, 5, nFlip, mod)
        emit(s"lsh_flip$nFlip", df, timeMin(df))
      }
      val tBuild0 = System.nanoTime()
      val (indexedRaw, centroids) = IvfKnn.buildIndexFrom(corpus)
      val indexed = indexedRaw.localCheckpoint(true)
      val buildSec = (System.nanoTime() - tBuild0) / 1e9
      sb.append(f"| ${k}x | ivf_build | $nRows | - | - | $buildSec%.1f |\n")
      for (nProbe <- Seq(1, 4, 8)) {
        val df = IvfKnn.approxTopKFrom(indexed, centroids, 5, nProbe, mod)
        emit(s"ivf_probe$nProbe", df, timeMin(df))
      }
    }

    // ---- Incremental MinHash band ledger: per-batch cost vs ledger size ----
    // Each ingested batch is ONE disjoint-token half-replica of the base
    // corpus (same batch size every run); the ledger's band index grows
    // by one batch per row, 12x end to end. MinHashLedger's contract is
    // per-batch cost proportional to the BATCH plus matching buckets.
    // Two IO columns prove it:
    //   - ingest_read_mb: bytes the ingest probe read. The batch's own
    //     key set is pushed into the ledger scan as an In filter, so the
    //     read is bounded by min(batch_keys, row_groups) x row-group
    //     size — at this fixture scale a 10k-key batch touches most row
    //     groups (pigeonhole), at production scale batch_keys << groups
    //     and the bound is the batch's.
    //   - probe64_read_mb: the pruning regime made visible — a FIXED
    //     64-doc batch (256 band keys) probed after every ingest+compact
    //     must read ~flat bytes while the ledger grows 12x (~256 sorted
    //     row groups, LSM point lookups), where the r8 bucketed layout
    //     read the WHOLE ledger.
    // compact_sec is the LSM amortization (sorted-run fold), priced
    // separately so probe and maintenance cost are not conflated.
    // cluster_rw_write_mb vs cluster_pa_write_mb: the SAME batch's pairs
    // folded into the incremental component labels by BOTH ClusterLedger
    // modes — rewrite mode rewrites the whole label table (bytes grow
    // with admitted docs), patch-append mode writes the delta + the
    // touched-clusters patch map (bytes track the batch).
    sb.append("\n## Incremental MinHash band ledger (per-batch IO vs ledger size)\n\n")
    sb.append("Same-size batches ingested sequentially; the ledger grows 12x. ")
    sb.append("probe64_read_mb is a FIXED 64-doc probe after each ingest+compact: ")
    sb.append("~flat bytes = probe IO tracks the probe batch, not the corpus ")
    sb.append("(In-pushdown point lookups over the bkh-sorted runs; the r8 ")
    sb.append("layout re-read the whole ledger per batch). ingest_read_mb is ")
    sb.append("bounded by min(batch_keys, row_groups) x row-group size; at this ")
    sb.append("fixture scale a 10k-key batch touches most 256 KB row groups, at ")
    sb.append("production scale batch_keys << row_groups. compact_sec is the ")
    sb.append("amortized LSM sorted-run fold. cluster_rw/pa_write_mb compare ")
    sb.append("ClusterLedger's rewrite vs patch-append folds of the same pairs: ")
    sb.append("rewrite bytes grow with admitted docs, patch bytes track the ")
    sb.append("delta.\n\n")
    sb.append("| batch | ledger_rows_before | pairs_out | ingest_sec | ingest_read_mb | compact_sec | probe64_sec | probe64_read_mb | cluster_rw_write_mb | cluster_pa_write_mb |\n")
    sb.append("|---|---|---|---|---|---|---|---|---|---|\n")
    val mhLedger = "scale_minhash_ledger"
    val clLedger = "scale_cluster_ledger"
    val clLedgerPa = "scale_cluster_ledger_pa"
    MinHashLedger.init(spark, mhLedger)
    ClusterLedger.init(spark, clLedger)
    ClusterLedger.initPatch(spark, clLedgerPa)
    val mhRoot = Files.createTempDirectory("mh_ledger_scale_")
    def replicaSlice(i: Int): DataFrame = {
      val tag = ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar
      base.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "([a-z]+)", s"$$1x$tag").as("text"))
    }
    // half-replicas: 12 same-size batches instead of 6 so the ledger
    // grows >10x within the same smoke budget (pair materialization,
    // which scales with the fixture's dup density, dominates wall time)
    def halfSlice(i: Int): DataFrame =
      replicaSlice(i).filter(pmod(col("doc_id"), lit(2)) === 0)
    // the FIXED probe: 64 docs from a replica tag never ingested
    val fixedProbe = replicaSlice(20)
      .orderBy("doc_id").limit(64).localCheckpoint(true)
    timeNoop(MinHashLedger.bandRows(halfSlice(0))) // warm the sig path
    for (i <- 0 until 12) {
      val batch = halfSlice(i)
      val before = spark.table(mhLedger).count()
      val t0 = System.nanoTime()
      val (pairs, ingestIo) = IoMeter.measure(spark) {
        MinHashLedger.ingest(spark, batch, mhLedger, s"$mhRoot/run$i")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val tc = System.nanoTime()
      MinHashLedger.compact(spark, mhLedger, s"$mhRoot/compact$i")
      val compactSec = (System.nanoTime() - tc) / 1e9
      val tp = System.nanoTime()
      val (probeCnt, probeIo) = IoMeter.measure(spark) {
        MinHashLedger.candidatePairsAgainst(spark, fixedProbe, mhLedger)
          .count()
      }
      val probeSec = (System.nanoTime() - tp) / 1e9
      // fold the batch's pairs into the incremental cluster labels in
      // BOTH modes; the delta CC cost tracks the DELTA, the write
      // volumes are the two persistence contracts under comparison
      val ids = batch.select(col("doc_id").as("id"))
      val edges = pairs
        .select(col("doc_id_1").as("src"), col("doc_id_2").as("dst"))
      val (_, rwIo) = IoMeter.measure(spark) {
        ClusterLedger.ingest(spark, ids, edges, clLedger,
          s"$mhRoot/cluster$i")
      }
      val (_, paIo) = IoMeter.measure(spark) {
        ClusterLedger.ingestPatch(spark, ids, edges, clLedgerPa,
          s"$mhRoot/clusterpa$i")
      }
      val line = f"| ${i + 1} | $before | ${pairs.count()} | $sec%.1f | " +
        f"${ingestIo.readMb}%.1f | $compactSec%.1f | $probeSec%.1f | " +
        f"${probeIo.readMb}%.1f | ${rwIo.writtenMb}%.1f | " +
        f"${paIo.writtenMb}%.1f |"
      println(s"[scale] $line (probe64 pairs=$probeCnt)")
      sb.append(line + "\n")
    }
    // Byte-footprint evaluation (r8 ask): the ledger denormalizes the
    // full signature onto every band row (x4 duplication at rest) so a
    // probe never needs a second lookup; the alternative normalizes to
    // narrow band rows + one (doc_id, sig) side table. Both written
    // once from the final ledger and sized. The denormalized form is
    // KEPT: at-rest duplication is parquet-columnar and row-group-
    // pruned out of probe IO (the probe64 column above), while the
    // normalized form would add a second corpus-sized point-lookup
    // join (sig fetch) to every probe — the measured at-rest delta
    // below is the price of keeping probes single-lookup.
    def dirMb(path: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else f.length
      walk(new java.io.File(path)) / 1e6
    }
    val finalLedger = spark.table(mhLedger)
    finalLedger.select("bkh", "bkey", "doc_id")
      .write.mode("overwrite").parquet(s"$mhRoot/norm_bands")
    finalLedger.select("doc_id", "sig").distinct()
      .write.mode("overwrite").parquet(s"$mhRoot/norm_sigs")
    val denormMb = dirMb(spark.sql(s"DESC FORMATTED $mhLedger")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:"))
    sb.append(f"\nAt-rest footprint of the final ledger: denormalized " +
      f"(sig on every band row, as shipped) ${denormMb}%.1f MB vs " +
      f"normalized (bands ${dirMb(s"$mhRoot/norm_bands")}%.1f MB + " +
      f"doc→sig side table ${dirMb(s"$mhRoot/norm_sigs")}%.1f MB). " +
      "Denormalized is kept: probes stay single-lookup (no second " +
      "corpus-sized sig fetch) and row-group pruning keeps the " +
      "duplication out of probe IO (probe64_read_mb above).\n")

    // the two modes must agree after the full sequence
    val rwLabels = spark.table(clLedger)
    val paLabels = ClusterLedger.resolvePatch(spark, clLedgerPa)
    require(rwLabels.exceptAll(paLabels).isEmpty &&
      paLabels.exceptAll(rwLabels).isEmpty,
      "ClusterLedger rewrite and patch-append modes diverged")
    // Patch-map maintenance: checkpointPatch folds the map into the
    // base (ONE corpus-sized write, amortized over the 12 delta-sized
    // folds above — the read path's broadcast-small patch guarantee is
    // what it buys) and truncates the map; labels bit-identical after.
    val tk = System.nanoTime()
    val (_, ckptIo) = IoMeter.measure(spark) {
      ClusterLedger.checkpointPatch(spark, clLedgerPa, s"$mhRoot/ckpt")
    }
    val ckptSec = (System.nanoTime() - tk) / 1e9
    val paAfter = ClusterLedger.resolvePatch(spark, clLedgerPa)
    require(rwLabels.exceptAll(paAfter).isEmpty &&
      paAfter.exceptAll(rwLabels).isEmpty,
      "checkpointPatch changed resolved labels")
    sb.append(f"\nPatch-map maintenance: one checkpointPatch after the " +
      f"12 folds wrote ${ckptIo.writtenMb}%.1f MB in $ckptSec%.1f s " +
      "(the single base rewrite patch mode amortizes — per-fold writes " +
      "above stay delta-sized) and truncated the patch map to 0 rows; " +
      "resolved labels verified bit-identical pre/post.\n")
    spark.sql(s"DROP TABLE IF EXISTS $mhLedger")
    spark.sql(s"DROP TABLE IF EXISTS $clLedger")
    spark.sql(s"DROP TABLE IF EXISTS $clLedgerPa")
    spark.sql(s"DROP TABLE IF EXISTS ${clLedgerPa}_patch")

    // ---- Production ingest regime: batch_keys << row_groups ----
    // The 12-batch table above shows ingest_read_mb ~flat at ~35 MB —
    // the FIXTURE CEILING, not the production claim: a 10k-key batch
    // touches most of a ~40-row-group ledger by pigeonhole, so reads
    // are bounded by the LEDGER. The claimed regime is the other one:
    // many small batches against a big ledger, where the In-pushdown
    // point lookups prune to ~batch_keys row groups and reads track
    // the BATCH. Manufacture that regime honestly: bulk-load a
    // 60-replica ledger (~1.2M band rows across hundreds of 256 KB row
    // groups) as one sorted run, then run FULL ingests of shrinking
    // batch size drawn from ALREADY-INGESTED replicas — their band
    // keys exist in the ledger, so no-match dictionary pruning cannot
    // fake the result — and record what each ingest read.
    sb.append("\n### Ingest read IO vs batch size (fixed big ledger — the production regime)\n\n")
    val regime = "scale_minhash_regime"
    MinHashLedger.init(spark, regime)
    val regimeRoot = Files.createTempDirectory("mh_regime_")
    val nRep = 60
    MinHashLedger.bulkLoad(spark,
      (0 until nRep).map(replicaSlice).reduce(_ unionAll _), regime)
    val ledgerRows = spark.table(regime).count()
    val ledgerMb = dirMb(spark.sql(s"DESC FORMATTED $regime")
      .filter(col("col_name") === "Location")
      .head().getString(1).stripPrefix("file:"))
    val approxGroups = math.max(1, (ledgerMb * 1e6 /
      MinHashLedger.RowGroupBytes).round)
    sb.append(f"Ledger: $ledgerRows rows, $ledgerMb%.1f MB at rest " +
      f"≈ $approxGroups x 256 KB row groups. Batches are slices of " +
      "ingested replicas (matching keys, so pruning must earn its " +
      "bytes). Read MB must FALL with batch size once batch keys " +
      "(4/doc) drop below the row-group count — the flat-table " +
      "ceiling above inverts into proportionality here.\n\n")
    sb.append("probe_read_mb isolates the point-lookup read path ")
    sb.append("(candidatePairsAgainst alone). It falls with batch keys until ")
    sb.append("it saturates at the LAYOUT's per-probe minimum: every file ")
    sb.append("with any probed key in range contributes footer/dictionary ")
    sb.append("pages plus at least one row group — so the floor is ")
    sb.append("~files-touched x row-group size (here 32 files from one ")
    sb.append("bulk-load write), not zero. The probe reads the pruned ledger ")
    sb.append("ONCE: hot-bucket-cap totals and the pair join both consume ")
    sb.append("the same union exchange (AQE stage reuse dedupes the ")
    sb.append("branches) — earlier rounds scanned it twice, which doubled ")
    sb.append("this floor. At a production layout (thousands of files over ")
    sb.append("many TB) that per-file minimum is a vanishing fraction of ")
    sb.append("the corpus, which is the claim that matters: a 256x smaller ")
    sb.append("batch never re-reads the corpus. ingest_read_mb is the full ")
    sb.append("ingest (probe + its own pair-materialization re-read + the ")
    sb.append("batch source).\n\n")
    sb.append("| batch_docs | batch_band_keys | ledger_rows_before | pairs_out | probe_read_mb | ingest_sec | ingest_read_mb |\n")
    sb.append("|---|---|---|---|---|---|---|\n")
    for ((n, i) <- Seq(2048, 512, 128, 32, 8).zipWithIndex) {
      val batch = replicaSlice(7 * i % nRep).orderBy("doc_id").limit(n)
        .localCheckpoint(true)
      val keys = batch.count() * MinHashLsh.Bands
      val before = spark.table(regime).count()
      val (_, probeIo) = IoMeter.measure(spark) {
        MinHashLedger.candidatePairsAgainst(spark, batch, regime).count()
      }
      val t0 = System.nanoTime()
      val (pairs, io) = IoMeter.measure(spark) {
        MinHashLedger.ingest(spark, batch, regime, s"$regimeRoot/run$n")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val line = f"| $n | $keys | $before | ${pairs.count()} | " +
        f"${probeIo.readMb}%.1f | $sec%.1f | ${io.readMb}%.1f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }
    spark.sql(s"DROP TABLE IF EXISTS $regime")

    // ---- K-means: Lloyd rounds over the same jittered replicas ----
    // Each round is ONE scan (literal-centroid assignment projection)
    // plus ONE k x dim-cell agg whose result is the next model, so
    // wall time must track corpus rows ~linearly; superlinear growth
    // would mean the model exchange or the driver collect is scaling
    // with the data, which it never may.
    sb.append("\n## K-means (3 Lloyd rounds + final assignment, k=8)\n\n")
    sb.append("| corpus | rows | seconds |\n|---|---|---|\n")
    for (k <- Seq(1, 4, 16)) {
      val corpus = replicatedEmb(k).localCheckpoint(true)
        .select(col("vec_id"), lit(0).as("label"), col("vec").as("embedding"))
      val nRows = corpus.count()
      timeNoop(ClusterQueries.kmeansAssign(spark, corpus)) // warm
      val sec = timeMin(ClusterQueries.kmeansAssign(spark, corpus))
      val line = f"| ${k}x | $nRows | $sec%.1f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }

    // ---- JL projection audit over the same jittered replicas ----
    // The 1024-row sign grid is corpus-independent; work is the ×16
    // (vec, out-dim) partial-term fold, so time must grow ~linearly
    // with rows while the report stays |labels| rows.
    sb.append("\n## JL projection audit (64→16 dims, md5 sign grid)\n\n")
    sb.append("| corpus | rows | out_rows | seconds |\n|---|---|---|---|\n")
    for (k <- Seq(1, 4, 16)) {
      val corpus = replicatedEmb(k).localCheckpoint(true)
        .select(col("vec_id"),
          pmod(col("vec_id"), lit(4)).cast("int").as("label"), col("vec"))
      val nRows = corpus.count()
      timeNoop(SimilarityQueries.jlProjectFrom(spark, corpus)) // warm
      val sec = timeMin(SimilarityQueries.jlProjectFrom(spark, corpus))
      val outRows = SimilarityQueries.jlProjectFrom(spark, corpus).count()
      val line = f"| ${k}x | $nRows | $outRows | $sec%.1f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }

    // ---- Skew: manufactured hot key, plain vs salted wall time ----
    // ~20% of events remapped onto one user — the hot-key regime the
    // salted rewrites (ScaleOps) exist for. Auto-broadcast is disabled
    // for the join rows because at 100 TB the user dimension does NOT
    // broadcast (at test scale it would, hiding the skew entirely);
    // join_plain/join_salted also disable AQE's skew-join splitting to
    // isolate the rewrite's own effect, and join_aqe_skew re-enables it
    // (with test-scale thresholds, since the defaults only trigger at
    // 256 MB partitions) to show the runtime mitigation we'd lean on
    // first on a real cluster.
    // Dense replication via one generator (not a k-way union, whose
    // plan size grows with k): the skew effect only dominates wall
    // time once the hot task's row count clears the per-task fixed
    // costs, so this section runs at 8x/32x/128x the base events.
    // The trailing repartition(32) is load-bearing for realism: the
    // explode multiplies ROWS, not partitions, so without it the whole
    // fixture collapses into the parquet scan's 1-2 map tasks — and AQE
    // skew-split divides a skewed reduce partition BY MAPPER RANGES
    // (PartialReducerPartitionSpec), so with one mapper it detects the
    // skew and can split nothing (observed: "number of skewed
    // partitions: left 0"). A real cluster job has thousands of
    // mappers; 32 reproduces that regime at fixture scale.
    def skewedEvents(k: Int): DataFrame =
      events
        .select(explode(sequence(lit(0L), lit(k - 1L))).as("r"),
          col("event_id"), col("user_id"), col("ts"))
        .select(
          (col("event_id") + col("r") * 1000000000L).as("event_id"),
          when(pmod(col("event_id"), lit(5)) === 0, lit(1L))
            .otherwise(col("user_id") + col("r") * 10000000L).as("user_id"),
          col("ts"))
        .repartition(32)

    sb.append("\n## Skew: plain vs salted (~20% of events on one hot user)\n\n")
    sb.append("Auto-broadcast off for all join rows (a 100 TB user dim does not ")
    sb.append("broadcast); `join_plain`/`join_salted` run with AQE skew-join ")
    sb.append("splitting off to isolate the rewrite, `join_aqe_skew` is the plain ")
    sb.append("join with AQE splitting on at test-scale thresholds.\n\n")
    sb.append("**When NOT to salt:** algebraic aggregations (count/sum/min/max) — ")
    sb.append("map-side partial aggregation already collapses the hot key to one ")
    sb.append("row per task before the shuffle, so the salted form's second ")
    sb.append("aggregation only adds cost (the agg rows below measure the tie/loss). ")
    sb.append("Salting pays on shuffles that CANNOT pre-combine — joins above all — ")
    sb.append("and explicit salting beats AQE only where AQE can't see the skew ")
    sb.append("(post-explode keys) or can't split (the build side of a broadcast).\n\n")
    sb.append("| scale | op | rows | seconds |\n|---|---|---|---|\n")
    val bcConf = "spark.sql.autoBroadcastJoinThreshold"
    val skewConf = "spark.sql.adaptive.skewJoin.enabled"
    val skewThresh = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    val skewFactor = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    val advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prevConf = Seq(bcConf, skewConf, skewThresh, skewFactor, advisory)
      .map(c => c -> spark.conf.get(c)).toMap
    spark.conf.set(bcConf, "-1")
    for (k <- Seq(8, 32, 128)) {
      val ev = skewedEvents(k).localCheckpoint(true)
      val users = ev.select(col("user_id")).distinct()
        .withColumn("segment", pmod(col("user_id"), lit(7)))
        .localCheckpoint(true)
      val cases: Seq[(String, () => DataFrame, Map[String, String])] = Seq(
        ("agg_plain", () => ev.groupBy("user_id").agg(count(lit(1)).as("cnt")),
          Map.empty),
        ("agg_salted", () => ScaleOps.saltedCount(ev, "user_id"),
          Map.empty),
        ("join_plain", () => ev.join(users, Seq("user_id")),
          Map(skewConf -> "false")),
        ("join_salted",
          () => ScaleOps.saltedJoin(ev,
            users.withColumnRenamed("user_id", "u_user_id"),
            "user_id", "u_user_id", buckets = 16),
          Map(skewConf -> "false")),
        ("join_aqe_skew", () => ev.join(users, Seq("user_id")),
          Map(skewConf -> "true", skewThresh -> "2m",
            skewFactor -> "2", advisory -> "1m")))
      for ((name, mk, confs) <- cases) {
        confs.foreach { case (c, v) => spark.conf.set(c, v) }
        timeNoop(mk()) // warm (codegen/JIT), same as every section above
        val sec = timeMin(mk())
        val rows = mk().count()
        confs.keys.foreach(c => spark.conf.set(c, prevConf(c)))
        val line = f"| ${k}x | $name | $rows | $sec%.2f |"
        println(s"[scale] $line")
        sb.append(line + "\n")
      }
    }
    // Plan evidence that STOCK AQE skew splitting actually fires on
    // this hot-key fixture — the "or let AQE handle it" claims around
    // the salted rewrites, observed rather than asserted: execute the
    // plain join with splitting on and snapshot the skew markers from
    // the ADAPTIVE final plan (the skewed SMJ and its AQEShuffleRead).
    {
      val ev = skewedEvents(32).localCheckpoint(true)
      val users = ev.select(col("user_id")).distinct()
        .withColumn("segment", pmod(col("user_id"), lit(7)))
        .localCheckpoint(true)
      val confs = Map(skewConf -> "true", skewThresh -> "2m",
        skewFactor -> "2", advisory -> "1m")
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      val df = ev.join(users, Seq("user_id"))
      // Execute THIS Dataset's own QueryExecution (a write/noop sink
      // builds a separate one, whose adaptive plan would print
      // unfinalized — no skew markers): after collect(), executedPlan
      // is the finalized AdaptiveSparkPlanExec and shows what AQE did.
      // 32x puts the hot reduce partition (~6 MB compressed) clear of
      // the 2m test threshold; skewedEvents' repartition(32) supplies
      // the mapper ranges the split is made of.
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      confs.keys.foreach(c => spark.conf.set(c, prevConf(c)))
      val marks = plan.linesIterator
        .filter(l => l.toLowerCase.contains("skew"))
        .map(_.trim.replaceAll("#\\d+L?", "").take(120)).take(6).toSeq
      require(marks.nonEmpty,
        "AQE skew-join split did not fire on the hot-key fixture")
      sb.append("\nStock AQE skew-split OBSERVED on the 32x hot-key fixture " +
        "(executed adaptive plan, test-scale thresholds — defaults " +
        "trigger at 256 MB partitions). The fixture detail that matters " +
        "at any scale: the split is composed of MAPPER ranges " +
        "(PartialReducerPartitionSpec), so a skewed partition fed by a " +
        "single map task is detected but unsplittable — AQE needs " +
        "upstream parallelism, which real jobs have and a collapsed " +
        "test fixture must reproduce:\n\n```\n")
      marks.foreach(m => sb.append(m + "\n"))
      sb.append("```\n")
      println(s"[scale] aqe skew markers: ${marks.size}")
    }
    spark.conf.set(bcConf, prevConf(bcConf))

    // ---- Connected components at adversarial diameter ----
    // A path graph maximizes diameter: plain min-label propagation
    // would need ~n rounds; pointer jumping (GraphOps, after round 3)
    // must cap rounds at ~3 + log2(n). Near-dup graphs (the production
    // input) converge before the jumping even engages.
    sb.append("\n## Connected components at adversarial diameter (path graphs)\n\n")
    sb.append("Rounds must grow as ~3 + log2(vertices), not as vertices — the ")
    sb.append("pointer-jumping escape hatch for chains far deeper than any ")
    sb.append("near-dup cluster (which converge in <5 rounds, before jumping engages).\n\n")
    sb.append("| vertices | rounds | seconds |\n|---|---|---|\n")
    for (n <- Seq(2000L, 20000L, 200000L)) {
      val edges = spark.range(0L, n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val t0 = System.nanoTime()
      val (labels, rounds) = operators.GraphOps.connectedComponentsWithRounds(edges)
      val resolved = labels.filter(col("component") === 0L).count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(resolved == n, s"path-$n: only $resolved/$n vertices reached component 0")
      val line = f"| $n | $rounds | $sec%.1f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }

    // BFS is level-synchronous: rounds = source eccentricity BY DESIGN
    // (no pointer-jumping analogue exists — depths must materialize
    // layer by layer). The honest profile is linear rounds on a path
    // graph with near-constant per-round cost; real small-world graphs
    // (co-purchase, near-dup) have single-digit diameters, so the
    // linear-rounds worst case prices chains, not production graphs.
    sb.append("\n## BFS at adversarial diameter (path graphs)\n\n")
    sb.append("Rounds = eccentricity by design (level-synchronous — no ")
    sb.append("pointer-jumping analogue exists for exact layers). sec/round ")
    sb.append("grows with the accumulated-labels anti-join, so a path graph is ")
    sb.append("quadratic in diameter end-to-end; real small-world graphs have ")
    sb.append("single-digit eccentricity (the co-purchase graph's q_bfs_depth ")
    sb.append("runs ~11 rounds), so the ladder stops at 800 — a deep-chain ")
    sb.append("workload wants the CC operator's pointer jumping, not BFS.\n\n")
    sb.append("| vertices | rounds | seconds | sec/round |\n|---|---|---|---|\n")
    for (n <- Seq(200L, 400L, 800L)) {
      val edges = spark.range(0L, n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      val t0 = System.nanoTime()
      val (labels, rounds) = operators.GraphOps.bfsDepths(edges, maxIter = n.toInt)
      val reached = labels.count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(reached == n, s"bfs-path-$n: only $reached/$n vertices labeled")
      require(rounds == n - 1, s"bfs-path-$n: $rounds rounds, expected ${n - 1}")
      val line = f"| $n | $rounds | $sec%.1f | ${sec / rounds}%.3f |"
      println(s"[scale] $line")
      sb.append(line + "\n")
    }

    Files.writeString(Paths.get(out), sb.toString)
    println(s"[scale] wrote $out")
    spark.stop()
  }
}
