package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Round-17 kernel swaps pinned to their pre-swap relational
  * formulations: [[graft.functions.ChunkWindows]] vs the HOF chunking
  * pyramid, [[graft.functions.Int8Quantize]] vs the
  * transform/array_max/floor/pack chain, and the native vec_dot
  * zero-vector drop vs the `aggregate` HOF — same values, same row
  * sets, same null semantics. Also pins the [[graft.operators.Embed
  * .hashEmbed]] id-unique CONTRACT: duplicate ids emit one row per
  * INPUT row (per-row kernel semantics), documented since round 16.
  */
class ChunkQuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val texts = Seq[(Long, String)](
    (1L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    (2L, "one two three"),
    (3L, "single"),
    (4L, ""),                       // tokenless → dropped
    (5L, null),                     // null → dropped
    (6L, "   padded   with   spaces   "),
    (7L, "\ttab nbsp mixed\nnewline separated words here"),
    (8L, ("tok " * 40).trim)
  )

  /** The pre-round-17 chunkWindows, verbatim — the reference. */
  private def referenceChunks(docs: org.apache.spark.sql.DataFrame,
                              w: Int, s: Int): org.apache.spark.sql.DataFrame = {
    val toks = filter(tokens(col("text")), t => length(t) > 0)
    docs.select(col("doc_id"), toks.as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0L)
      .withColumn("__nchunks", lit(1L) +
        expr(s"greatest(__n - $w + $s - 1, 0L) div $s"))
      .select(col("doc_id"), col("__toks"), col("__n"),
        posexplode(transform(
          sequence(lit(0L), col("__nchunks") - 1L),
          i => i * s)).as(Seq("chunk_idx", "start_tok")))
      .withColumn("__chunk",
        slice(col("__toks"), col("start_tok").cast("int") + 1, lit(w)))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok"),
        size(col("__chunk")).cast("long").as("n_toks"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  test("chunkWindows kernel ≡ HOF formulation (values and row set)") {
    val df = texts.toDF("doc_id", "text")
    for ((w, s) <- Seq((16, 12), (8, 8), (4, 1), (1, 1))) {
      val got = graft.operators.TextAnalysis.chunkWindows(df, "doc_id",
        "text", w, s).orderBy("doc_id", "chunk_idx").collect()
      val want = referenceChunks(df, w, s)
        .orderBy("doc_id", "chunk_idx").collect()
      assert(got.length == want.length, s"row count w=$w s=$s")
      got.zip(want).foreach { case (g, r) =>
        assert(g.getLong(0) == r.getLong(0), s"doc w=$w s=$s")
        assert(g.getLong(1) == r.getLong(1), s"chunk_idx w=$w s=$s")
        assert(g.getLong(2) == r.getLong(2), s"start_tok w=$w s=$s")
        assert(g.getLong(3) == r.getLong(3), s"n_toks w=$w s=$s")
        assert(g.getString(4) == r.getString(4), s"chunk_text w=$w s=$s")
      }
    }
  }

  /** The pre-round-17 quantizeInt8, verbatim — the reference. */
  private def referenceQuantize(vecs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.functions.Int8Ops
    val dv = transform(col("v"), _.cast("double"))
    val amax = array_max(transform(dv, x => abs(x)))
    val q = transform(dv, x => floor(x * lit(127.0) / col("__amax")))
    vecs.withColumn("__amax", amax)
      .filter(col("__amax") > 0.0)
      .select(col("vec_id").as("emb_id"), Int8Ops.int8Pack(q).as("qvec"))
      .withColumn("qnorm", sqrt(Int8Ops.int8Dot(col("qvec"), col("qvec"))))
  }

  test("int8 quantize kernel ≡ relational formulation (values, row set)") {
    val vecs = Seq[(Long, Seq[Double])](
      (1L, Seq(1.0, -2.0, 3.5, 0.25)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),          // zero vector → dropped
      (3L, Seq(-0.001, 0.002, 127.0, -128.0)),
      (4L, Seq(5.0)),
      (5L, Seq(1e-300, -1e-300, 0.0, 1e-299)),
      (6L, Seq.empty[Double])                  // empty → dropped
    ).toDF("vec_id", "v")
    val got = graft.operators.Ann.quantizeInt8(vecs, "vec_id", "v")
      .orderBy("emb_id").collect()
    val want = referenceQuantize(vecs).orderBy("emb_id").collect()
    assert(got.map(_.getLong(0)).toSeq == want.map(_.getLong(0)).toSeq)
    got.zip(want).foreach { case (g, r) =>
      assert(java.util.Arrays.equals(g.getAs[Array[Byte]]("qvec"),
        r.getAs[Array[Byte]]("qvec")), s"qvec ${g.getLong(0)}")
      assert(g.getAs[Double]("qnorm") == r.getAs[Double]("qnorm"),
        s"qnorm ${g.getLong(0)}")
    }
  }

  test("native zero-vector drop ≡ aggregate HOF drop (row set)") {
    val df = texts.toDF("doc_id", "text")
    val emb = graft.operators.Embed.hashEmbed(df, "doc_id", "text", 8)
    val hof = emb.filter(
      aggregate(col("emb"), lit(0.0), (a, x) => a + x * x) > 0)
    val native = emb.filter(
      graft.functions.VectorOps.vecDot(col("emb"), col("emb")) > 0)
    assert(native.select("doc_id").orderBy("doc_id").collect().toSeq ==
      hof.select("doc_id").orderBy("doc_id").collect().toSeq)
  }

  test("hashEmbed contract: duplicate ids emit one row per INPUT row") {
    // round 16 narrowed hashEmbed from one-row-per-distinct-id (the
    // old groupBy merged duplicate ids into one combined embedding)
    // to one-row-per-input-row. All production callers pass id-unique
    // inputs; this spec makes the seam's behavior explicit so a
    // future caller with duplicate ids cannot mis-assume the merge.
    val dup = Seq((1L, "alpha beta"), (1L, "gamma delta"), (2L, "x y"))
      .toDF("doc_id", "text")
    val out = graft.operators.Embed.hashEmbed(dup, "doc_id", "text", 8)
      .collect()
    assert(out.length == 3, "one row per input row, duplicates NOT merged")
    val id1 = out.filter(_.getLong(0) == 1L)
    assert(id1.length == 2)
    // the two id-1 rows embed their OWN text (different vectors)
    assert(id1(0).getSeq[Double](1) != id1(1).getSeq[Double](1))
  }
}
