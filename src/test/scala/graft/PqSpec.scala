package graft

import org.apache.spark.sql.functions._

import graft.llm.LlmOps

/** LLM-28 product quantization: the no-oracle checks (rows-only in the
  * driver gate) — determinism, code-range sanity, Lloyd-step improvement,
  * and distortion strictly better than the k=1 (global mean) baseline. */
class PqSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, Sf0001)

  private def distortion(k: Int, rounds: Int = 1): Double = {
    val cb = LlmOps.pqTrain(emb, k = k, rounds = rounds)
    LlmOps.pqEncode(emb, cb)
      .agg(sum("recon_err")).collect()(0).getDouble(0)
  }

  test("codes are m=4 ints in [0,16) and errors are non-negative") {
    val enc = LlmOps.pqEncode(emb, LlmOps.pqTrain(emb)).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val parts = r.getAs[String]("codes").split(",")
      assert(parts.length == 4, s"expected 4 codes: ${r}")
      parts.foreach { c =>
        assert(c.toInt >= 0 && c.toInt < 16, s"code out of range: $c") }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
  }

  test("encoding is bit-deterministic across independent runs") {
    def run() = LlmOps.pqEncode(emb, LlmOps.pqTrain(emb))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(run() == run())
  }

  test("one Lloyd round does not worsen total distortion") {
    assert(distortion(k = 16, rounds = 1) <= distortion(k = 16, rounds = 0))
  }

  test("k=16 codebook beats the k=1 global-mean baseline") {
    assert(distortion(k = 16) < distortion(k = 1))
  }
}
