package graft

import org.apache.spark.sql.functions._

/** Contract of the rolling_hash64 fingerprint: deterministic, token-order
  * sensitive, whitespace-significant. */
class FingerprintSpec extends SparkSpec {

  private def fp(texts: String*): Seq[Long] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select(call_function("rolling_hash64", col("text")))
      .collect().map(_.getLong(0)).toSeq
  }

  test("deterministic and distinct across contents") {
    val Seq(a1, a2, b) = fp("the quick brown fox", "the quick brown fox",
      "the quick brown foxes")
    assert(a1 === a2)
    assert(a1 !== b)
  }

  test("token order matters (unlike a bag-of-words hash)") {
    val Seq(ab, ba) = fp("alpha beta", "beta alpha")
    assert(ab !== ba)
  }

  test("full-corpus fingerprints collide only for equal token sequences") {
    val df = Tables.documents(spark, Sf0001)
      .select(col("text"),
        call_function("rolling_hash64", col("text")).as("h"))
    val nTexts = df.select("text").distinct().count()
    val nHashes = df.select("h").distinct().count()
    assert(nHashes === nTexts)
  }
}
