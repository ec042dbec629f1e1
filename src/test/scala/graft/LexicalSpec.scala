package graft

import org.apache.spark.sql.functions._
import graft.operators.Lexical

/** BM25 lexical retrieval: ranking semantics (rarity, saturation,
  * length normalization, tie-break), query-term dedup, and the
  * persisted-index fold law (doc-disjoint layers == one-shot,
  * verbatim).
  */
class LexicalSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana banana banana durian"),
    (3L, "cherry cherry cherry"),
    (4L, "apple fig"),
    (5L, "grape honey iris jack kiwi lemon mango nectar olive peach")
  ).toDF("doc_id", "text")

  private def search(qs: Seq[(Long, Seq[String])], k: Int = 5) = {
    val (p, dl) = Lexical.buildPostings(docs, "doc_id", "text")
    Lexical.bm25Search(p, dl, qs.toDF("query_id", "terms"),
        "query_id", "terms", k)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt,
        r.getLong(2), r.getLong(3)))
  }

  test("bm25: tf wins within a term; shorter docs outrank longer at " +
      "equal tf (length normalization); absent terms match nothing") {
    // 'apple' in docs 1 (tf 2, dl 4), 2 (tf 1, dl 5), 4 (tf 1, dl 2)
    val apple = search(Seq((10L, Seq("apple"))))
    assert(apple.map(_._3).toSeq == Seq(1L, 4L, 2L))
    // doc 4 beats doc 2 purely on dl — same tf, same term
    val Seq(s4, s2) = apple.filter(r => Set(4L, 2L)(r._3)).map(_._4).toSeq
    assert(s4 > s2)
    // 'cherry' tf 3 in the all-cherry doc 3 beats tf 1 in doc 1
    val cherry = search(Seq((11L, Seq("cherry"))))
    assert(cherry.map(_._3).toSeq == Seq(3L, 1L))
    assert(search(Seq((12L, Seq("zzz")))).isEmpty)
  }

  test("bm25: rarer terms contribute more (idf); duplicate query " +
      "terms are deduplicated; k caps each query independently") {
    // doc 2 is the only 'durian' doc; 'banana' appears in 2 docs.
    // A durian query must put doc 2 first with a HIGHER score than
    // the same doc scores for the more common banana at equal tf
    // would imply — compare the single-term scores directly
    val d = search(Seq((1L, Seq("durian")))) // df 1, tf 1, dl 5
    val f = search(Seq((2L, Seq("fig"))))    // df 1, tf 1, dl 2
    assert(d.head._3 == 2L && f.head._3 == 4L)
    // same df and tf: only dl differs, shorter wins on score
    assert(f.head._4 > d.head._4)
    val dedup = search(Seq((3L, Seq("apple", "apple"))))
    assert(dedup.map(r => (r._3, r._4)).toSeq ==
      search(Seq((3L, Seq("apple")))).map(r => (r._3, r._4)).toSeq)
    val capped = search(Seq((4L, Seq("apple", "banana", "cherry"))),
      k = 2)
    assert(capped.length == 2 && capped.map(_._2).toSeq == Seq(1, 2))
  }

  test("bm25: multi-term scores are the sum of per-term scores") {
    val ab = search(Seq((1L, Seq("apple", "cherry"))))
    val a = search(Seq((1L, Seq("apple")))).map(r => r._3 -> r._4).toMap
    val c = search(Seq((1L, Seq("cherry")))).map(r => r._3 -> r._4).toMap
    ab.foreach { case (_, _, doc, score) =>
      assert(score == a.getOrElse(doc, 0L) + c.getOrElse(doc, 0L))
    }
  }

  test("rrfFuse: hand-computed reciprocal-rank sums; overlap wins; " +
      "equal scores tie-break on doc_id; k caps per query") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id",
      "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id",
      "rank")
    val out = Lexical.rrfFuse(a, b, k = 5)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1).toInt, r.getLong(2), r.getLong(3)))
    // doc 11 appears in both lists: 10^8 div 62 + 10^8 div 61
    assert(out.toSeq == Seq(
      (1, 11L, 100000000L / 62 + 100000000L / 61),
      (2, 10L, 100000000L / 61),
      (3, 12L, 100000000L / 62)))
    // two rank-1-only docs score equally: smaller doc_id first
    val t1 = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val t2 = Seq((1L, 15L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = Lexical.rrfFuse(t1, t2, k = 5).orderBy($"rank")
      .collect().map(_.getLong(2))
    assert(tied.toSeq == Seq(15L, 20L))
    assert(Lexical.rrfFuse(a, b, k = 1).count() == 1L)
  }

  test("bm25: doc-disjoint persisted folds score IDENTICALLY to the " +
      "one-shot build (tf/df/N/T all add)") {
    val idx = java.nio.file.Files.createTempDirectory("bm25_spec")
      .toString
    Lexical.postingsAppend(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", idx, 1L)
    Lexical.postingsAppend(docs.filter($"doc_id" % 2 === 1),
      "doc_id", "text", idx, 2L)
    val qs = Seq((1L, Seq("apple", "cherry")), (2L, Seq("banana")))
      .toDF("query_id", "terms")
    val folded = Lexical.bm25SearchIndex(spark, idx, qs, "query_id",
        "terms", 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    val (p, dl) = Lexical.buildPostings(docs, "doc_id", "text")
    val oneShot = Lexical.bm25Search(p, dl, qs, "query_id", "terms", 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(folded == oneShot && oneShot.nonEmpty)
    // crash-replay idempotence: re-appending a batch under the SAME
    // layer id overwrites its own layer — search unchanged
    Lexical.postingsAppend(docs.filter($"doc_id" % 2 === 0),
      "doc_id", "text", idx, 1L)
    val replayed = Lexical.bm25SearchIndex(spark, idx, qs, "query_id",
        "terms", 5)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(replayed == oneShot)
  }
}
