package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the unicode twins of the dedup/tf-idf/BPE chain
  * (UnicodeTextQueries). The manufactured multi-script view renames
  * characters BIJECTIVELY (vowel → Greek/Cyrillic codepoint), so the
  * structural outputs of the twins must agree exactly with their
  * ASCII originals — any divergence is a unicode-handling bug in
  * tokenization, shingling, or the merge algebra, not data noise.
  * The oracle rows (CORRECTNESS gate) separately prove Spark↔DuckDB
  * agreement; these specs prove the twins measure the SAME corpus
  * structure the originals do, and that non-Latin letters actually
  * flow through the chain.
  */
class UnicodeChainSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def hasNonAscii(s: String): Boolean = s.exists(_ > 127)

  test("scripted view manufactures non-Latin letters that survive tokenization") {
    val words = q("q_tfidf_unicode").collect().map(_.getAs[String]("word"))
    assert(words.nonEmpty)
    assert(words.forall(hasNonAscii),
      "every fixture word contains a vowel, so every unicode token must " +
        "carry a Greek/Cyrillic codepoint — ASCII-only tokens mean the " +
        "translate view did not reach the tokenizer")
  }

  test("dedup_near: bijective renaming preserves the doc partition exactly") {
    val ascii = q("q_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uni = q("q_dedup_near_unicode").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uni == ascii)
  }

  test("ngram_jaccard: pair set and similarity values invariant under renaming") {
    val ascii = q("q_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uni = q("q_ngram_jaccard_unicode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(uni == ascii)
  }

  test("tfidf: document frequencies invariant under renaming; idf consistent") {
    // word identities change, but the multiset of (df, idf) of the
    // top-50 cut is preserved as long as the df-desc cut is not split
    // at the boundary — on this fixture the full vocabulary fits the
    // cut (31 < 50), so the multisets must match exactly
    val ascii = q("q_tfidf").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    val uni = q("q_tfidf_unicode").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sorted.toSeq
    assert(uni == ascii)
  }

  test("dedup_minhash: groups conserve docs and refine to token-set groups") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val groups = q("q_dedup_minhash_unicode").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(groups.map(_._2).sum == nDocs)
    assert(groups.map(_._1).distinct.length == groups.length)
    // identical token sets always hash to identical signatures, so
    // there can never be MORE minhash groups than token-set groups
    assert(groups.length <= q("q_dedup_near_unicode").count())
  }

  test("dedup_simhash: groups conserve docs; 16-bit signatures; text-dups collapse") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val rows = q("q_dedup_simhash_unicode").collect()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach(r =>
      assert(r.getLong(0) >= 0L && r.getLong(0) < (1L << 16)))
    // identical texts always share a signature, so there can never be
    // more simhash groups than distinct texts
    assert(rows.length <=
      Tables.documents(spark, sfDir).select("text").distinct().count())
  }

  test("bpe_encode: per-doc word/char counts invariant; compression sane") {
    val ascii = q("q_bpe_encode").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = q("q_bpe_encode_unicode").collect()
    assert(rows.length == ascii.size)
    rows.foreach { r =>
      val (nWords, nChars) = ascii(r.getLong(0))
      // renaming is per-character on BMP codepoints: token and char
      // counts cannot move, only the learned merges (and so
      // n_bpe_tokens) may differ
      assert(r.getLong(2) == nWords && r.getLong(3) == nChars)
      // encoding never exceeds chars (merges only shrink) and never
      // beats one symbol per word
      assert(r.getLong(4) <= nChars && r.getLong(4) >= nWords)
    }
  }
}
