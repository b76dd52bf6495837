package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prefix-filtered set-similarity self-join (PPJoin-style, Xiao et al.,
  * "Efficient Similarity Joins for Near Duplicate Detection", WWW 2008 —
  * public literature): find all document pairs whose word-bigram shingle
  * sets have Jaccard >= tau WITHOUT the all-pairs join and WITHOUT the
  * df-cap approximation `ngramJaccardPairs` accepts.
  *
  * The filter: order every document's shingles by a single global total
  * order (df asc, shingle asc — rarest first), keep only the first
  * `|x| - ceil(tau*|x|) + 1` as the document's PREFIX. The PPJoin prefix
  * lemma guarantees any pair with J >= tau shares at least one prefix
  * shingle, so the candidate set (pairs sharing a prefix shingle) has no
  * false negatives; an exact verification join then computes the true
  * overlap for candidates only.
  *
  * Determinism: the survival test is pure integer arithmetic — for
  * tau = 1/2, J >= tau iff 3*overlap >= |x| + |y| — so no float compare
  * ever decides membership; the reported jaccard is one rounded division
  * of exact integers.
  *
  * Scale: three bounded exchanges. (1) shingle df — vocabulary-bounded
  * aggregate; (2) the prefix self-join touches only prefix shingles
  * (rarest-first ordering makes hot shingles land in almost no prefix,
  * the opposite of the hot-shingle blowup a plain shingle equi-join
  * suffers); (3) verification joins shingle sets of CANDIDATE pairs
  * only — cost proportional to candidates, not n^2. No broadcast of
  * anything data-sized, no driver state. This is the exact-answer scale
  * path next to MinHashLsh's approximate one (reference corpus analogue:
  * `/root/reference/main/pg-*.txt` near-dup detection).
  */
object SetSimJoin {

  import TextQueries.tokens

  /** Word-bigram shingle set per doc: (doc_id, s) distinct rows. */
  private def shingles(docs: DataFrame): DataFrame = {
    val ts = tokens(col("text"))
    graft.Tables.spread(docs, col("doc_id"))
      .select(col("doc_id"), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"),
        explode(array_distinct(
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat_ws(" ", element_at(col("ts"), i), element_at(col("ts"), i + 1)))))
          .as("s"))
  }

  /** All doc pairs with word-bigram-shingle Jaccard >= 1/2, found via
    * the prefix filter and verified exactly.
    */
  def qSetsimPrefix(spark: SparkSession, sfDir: String): DataFrame =
    setsimPrefixFrom(Tables.documents(spark, sfDir))

  /** DataFrame-core form over any (doc_id, text) frame — ScaleSmoke
    * entry point. tau is fixed at 1/2 so the verify compare stays
    * integer (3*o >= n1+n2).
    */
  def setsimPrefixFrom(docs: DataFrame): DataFrame = {
    val sh = shingles(docs)

    // Global total order: (df asc, shingle asc). The order key is the
    // (df, s) pair itself — no global rank assignment, so no
    // single-partition window at any scale.
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))

    // Per doc: sort shingles rarest-first, keep the tau=1/2 prefix
    // |x| - ceil(|x|/2) + 1 = floor(|x|/2) + 1. Lazily checkpointed:
    // both the prefix explode and the verification arrays read it.
    val ordered = sh.join(dfreq, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("sorted"),
        count(lit(1)).as("n"))
      .localCheckpoint(false)
    def prefix(len: Column) = ordered
      .select(col("doc_id"), col("n"),
        posexplode(slice(col("sorted"), lit(1), len.cast("int"))))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("pos"),
        col("col.s").as("s"))
    // ASYMMETRIC prefixes (the PPJoin index/probe split): the smaller
    // set of a qualifying pair has overlap o >= 2/3·|small| (because
    // o >= (|s|+|l|)/3 and |l| >= |s|), so its first common shingle
    // sits within the first floor(|s|/3)+1 — a SHORTER index prefix.
    // The larger side still needs the full floor(|l|/2)+1 probe
    // prefix (o >= |l|/2 via the length filter). Joining index-side
    // against probe-side cuts each shingle bucket's pair count by
    // ~the prefix-length ratio versus the symmetric join.
    val probeP = prefix(col("n") / lit(2) + lit(1))
    val indexP = prefix(col("n") / lit(3) + lit(1))

    // Candidates: pairs sharing a prefix shingle (no false negatives:
    // order each true pair as (small, large) by (n, doc_id) — its
    // first common shingle lies in small's INDEX prefix and large's
    // PROBE prefix, see above), pre-pruned by two more PPJoin filters
    // before the distinct and the verification join ever see them:
    //   LENGTH — J >= 1/2 forces |small| and |large| within a factor
    //   of 2 (o <= |small| and 3o >= |s|+|l| are incompatible
    //   otherwise);
    //   POSITIONAL — a match at 1-based positions (p_s, p_l) bounds
    //   the overlap by 1 + min(n_s-p_s, n_l-p_l) (every common shingle
    //   sits at or after the match in the shared total order), so a
    //   row with 3*(1 + min(...)) < n_s+n_l cannot certify the pair.
    //   For a pair that truly meets tau, its FIRST common shingle's
    //   row passes both bounds — dropping the failing rows loses no
    //   true pair.
    // Distinct collapses multi-shingle agreement on the NARROW
    // (id, id) key alone; sizes rejoin for free inside verification.
    val cand = indexP.as("a")
      .join(probeP.as("b"),
        col("a.s") === col("b.s") &&
          (col("a.n") < col("b.n") ||
            (col("a.n") === col("b.n") && col("a.doc_id") < col("b.doc_id"))) &&
          col("b.n") <= col("a.n") * 2 &&
          (lit(1) + least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))) * 3 >=
            col("a.n") + col("b.n"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_id_1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_id_2"))
      .distinct()

    // Exact verification, candidate-bounded: join each side's FULL
    // shingle array (one row per doc, already built for the prefix
    // cut) and count the overlap in-place — it never becomes rows.
    // The earlier row-form (explode doc1's set, equi-join doc2's)
    // shuffled |candidates|·|x| rows into a regrouping exchange;
    // this shape moves |candidates| rows with two array payloads and
    // no post-join aggregation at all (measured 75 s -> array form on
    // the sf0.1 near-dup corpus, where clustered docs make candidate
    // volume the dominant term). The count itself is the codegen'd
    // two-pointer merge SortedOverlapCount over per-doc ASCENDING
    // string arrays (one array_sort per DOC, not per pair) — same
    // result as size(array_intersect), without that built-in's
    // per-PAIR hash set + intersection-array allocation, which
    // profiling put at ~60% of the query on the clustered sf0.1
    // corpus (3.5M candidates for 256 survivors).
    val docsets = ordered
      .select(col("doc_id"), col("n"),
        array_sort(expr("transform(sorted, p -> p.s)")).as("arr"))
    val verified = cand
      .join(docsets.select(col("doc_id").as("doc_id_1"),
        col("n").as("n1"), col("arr").as("arr1")), Seq("doc_id_1"))
      .join(docsets.select(col("doc_id").as("doc_id_2"),
        col("n").as("n2"), col("arr").as("arr2")), Seq("doc_id_2"))
      .select(col("doc_id_1"), col("doc_id_2"), col("n1"), col("n2"),
        graft.functions.SetFunctions.sortedOverlap(col("arr1"), col("arr2"))
          .as("n_common"))
      // tau = 1/2 as integers: o/(n1+n2-o) >= 1/2  <=>  3o >= n1+n2
      .filter(col("n_common") * 3 >= col("n1") + col("n2"))

    verified.select(
      col("doc_id_1"), col("doc_id_2"), col("n_common"),
      (round(col("n_common").cast("double") /
        (col("n1") + col("n2") - col("n_common")), 6) + lit(0.0)).as("jaccard"))
      .orderBy(asc_nulls_first("doc_id_1"), asc_nulls_first("doc_id_2"))
  }
}
