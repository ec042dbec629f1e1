package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Product quantization: sub-quantizer training, encoding, ADC search. */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  // ids alternate groups so the k-lowest-id init covers both
  private def corpus = Seq(
    (0L, Seq(0f, 0f, 10f, 10f)), (1L, Seq(5f, 5f, 0f, 0f)),
    (2L, Seq(0f, 0f, 10f, 10f)), (3L, Seq(5f, 5f, 0f, 0f)),
    (4L, Seq(0f, 0f, 10f, 10f)), (5L, Seq(5f, 5f, 0f, 0f)),
    (6L, Seq(0f, 0f, 10f, 10f)), (7L, Seq(5f, 5f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("PQ: codebooks separate the groups; same-group vectors share codes") {
    val cbs = Ann.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 2, k = 2, iters = 2)
    assert(cbs.length == 2 && cbs.forall(_.length == 2))
    assert(cbs.forall(_.forall(_.length == 2))) // 4 dims / 2 subspaces
    val codes = Ann.pqEncode(corpus, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) == codes(2L) && codes(2L) == codes(4L))
    assert(codes(1L) == codes(3L) && codes(3L) == codes(5L))
    assert(codes(0L) != codes(1L))
  }

  test("PQ ADC search: same-group neighbors rank first, id tie-break") {
    val cbs = Ann.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 2, k = 2, iters = 2)
    val codes = Ann.pqEncode(corpus, "vec_id", "embedding", cbs)
    val res = Ann.pqSearch(corpus.filter(col("vec_id") === 0L), codes,
        "vec_id", "embedding", cbs, k = 4)
      .orderBy("rank").collect()
    // group A (ids 2,4,6) at zero approximate distance before any B
    assert(res.map(_.getAs[Long]("neighbor_id")).take(3).toSeq ==
      Seq(2L, 4L, 6L))
    assert(res.take(3).forall(_.getAs[Double]("adist") == 0.0))
    assert(res(3).getAs[Double]("adist") > 0.0)
  }
}
