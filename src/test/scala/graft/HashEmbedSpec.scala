package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** The round-16 hashEmbed kernel swap (relational explode/groupBy/join
  * → one native expression) is an internals change on the embedder
  * every retrieval lane rides: pin the new kernel to the ORIGINAL
  * relational formulation on exactly the edges a fused tokenizer
  * could get wrong — empty text (one "" token), non-space whitespace
  * at the edges (leading/trailing empty tokens from the Java-regex
  * split), null text (ZERO vector, never null or a dropped row),
  * surrogate pairs (code-point fold), and sign cancellation.
  */
class HashEmbedSpec extends SparkSpecBase {
  import spark.implicits._

  /** The pre-round-16 formulation, verbatim — the reference. */
  private def referenceEmbed(docs: org.apache.spark.sql.DataFrame,
                             dim: Int): org.apache.spark.sql.DataFrame = {
    val feats = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(charPolyHash(col("tok")), lit(dim.toLong)).as("b"),
        when(pmod(charPolyHash(concat(col("tok"), lit("|sign"))),
          lit(2L)) === 0, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy("doc_id", "b").agg(sum("sgn").as("c"))
    val maps = feats.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("m"))
    docs.select(col("doc_id")).distinct()
      .join(maps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(dim.toLong - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
          .as("emb"))
  }

  private val edgeDocs = Seq[(Long, String)](
    (1L, "alpha beta gamma alpha"),        // repeat token accumulates
    (2L, ""),                              // one "" token at bucket 0
    (3L, null),                            // zero vector, row KEPT
    (4L, "   "),                           // trim → "" → one "" token
    (5L, "\tlead and trail\n"),            // empty edge tokens (regex split)
    (6L, "uni😀code token"),     // surrogate pair code point
    (7L, "a  b\r\nc"),                     // mixed separators collapse
    (8L, " x "),                           // spaces trimmed, no empties
    (9L, (1 to 300).map(i => s"t$i").mkString(" ")) // wide doc
  )

  test("native kernel ≡ relational formulation on edge corpus, dims 2/8/32") {
    val docs = edgeDocs.toDF("doc_id", "text")
    for (dim <- Seq(2, 8, 32)) {
      val got = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", dim)
        .orderBy("doc_id").collect()
      val want = referenceEmbed(docs, dim).orderBy("doc_id").collect()
      assert(got.length == want.length, s"dim=$dim row count")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0))
        assert(g.getSeq[Double](1) == w.getSeq[Double](1),
          s"dim=$dim doc=${g.getLong(0)}")
      }
    }
  }

  test("null/tokenless text yields the zero vector, not null, not a drop") {
    val docs = Seq[(Long, String)]((3L, null)).toDF("doc_id", "text")
    val rows = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", 8)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getSeq[Double](1) == Seq.fill(8)(0.0))
  }

  test("embed plan has zero Exchange (per-row pure — the point of the swap)") {
    val docs = edgeDocs.toDF("doc_id", "text")
    val plan = graft.operators.Embed.hashEmbed(docs, "doc_id", "text", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
